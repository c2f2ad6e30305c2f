"""Bisect the host-RSS leak seen in long train runs on the tunneled chip.

Runs the production loop (BatchLoader -> prefetch_to_device -> sharded
step) for N steps per variant and prints RSS every 20 steps.

Variants: packed_ring (production), packed_noring (fresh pack buffer per
batch), unpacked (per-array transfer), synthetic (no loader: same device
arrays re-fed — isolates the step/dispatch path from the input pipeline).

Usage: python scripts/leak_probe.py <corpus_dir> <name> [variants...]
"""
import os
import sys
import time

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return float("nan")


def main():
    corpus, name = sys.argv[1], sys.argv[2]
    variants = sys.argv[3:] or ["synthetic", "packed_ring", "packed_noring",
                                "unpacked"]
    n_steps = int(os.environ.get("LEAK_STEPS", "120"))

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import segclip_tpu.parallel.mesh as mesh_mod
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import (PackedSpec, make_mesh,
                                           prefetch_to_device, shard_batch)
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)
    from segclip_tpu.data.pipeline import (BatchLoader, PairRecordDataset,
                                           ShardedEpochSampler, _load_one)

    cfg_m = ModelConfig()
    cfg = Config(model=cfg_m, optim=OptimConfig())
    n_dev = jax.device_count()
    batch = 96 * n_dev

    model, params = init_segclip(cfg_m, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=100000,
                                              seed=0)
    mesh = make_mesh()

    for variant in variants:
        if variant == "synthetic":
            rng = np.random.default_rng(0)
            ids = np.zeros((batch, cfg_m.max_words), np.int32)
            ids[:, 0] = 49406
            ids[:, 5] = 49407
            host = {
                "input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int32),
                "image": rng.integers(0, 256, (batch, 224, 224, 3)
                                      ).astype(np.uint8),
                "image_seg": rng.integers(0, 32, (batch, 14, 14)
                                          ).astype(np.int32),
            }
            data = shard_batch(mesh, host)
            step = make_sharded_train_step(mesh, model, tx,
                                           trainable=trainable)
            state, m = step(state, data)
            float(m["loss"])
            base = rss_mb()
            t0 = time.perf_counter()
            for i in range(1, n_steps + 1):
                state, m = step(state, data)
                if i % 20 == 0:
                    print(f"{variant:14s} step {i:4d}  rss {rss_mb():8.0f} MB"
                          f"  (+{rss_mb()-base:7.0f})", flush=True)
            float(m["loss"])
            dt = time.perf_counter() - t0
            print(f"{variant:14s} {n_steps} steps {dt/n_steps*1e3:6.0f} "
                  f"ms/step  leak {(rss_mb()-base)/n_steps:6.2f} MB/step",
                  flush=True)
            continue

        packed = variant.startswith("packed")
        ds = PairRecordDataset(name, corpus, max_words=cfg_m.max_words,
                               use_seg=True, normalize=False)
        sampler = ShardedEpochSampler(len(ds), global_batch=batch)
        loader = BatchLoader(ds, sampler, seed=0, prefetch=4)
        spec = None
        if packed:
            probe = _load_one(ds, 0, np.random.default_rng(0))
            spec = PackedSpec.from_batch(
                {k: np.asarray(v)[None] for k, v in probe.items()})
        if variant == "packed_noring":
            mesh_mod._DISABLE_PACK_RING = True      # type: ignore
        step_p = make_sharded_train_step(mesh, model, tx,
                                         trainable=trainable,
                                         packed_spec=spec)
        base = None
        t0 = 0.0
        k = 0
        for i, b in enumerate(prefetch_to_device(loader.epoch(1), mesh,
                                                 pack_spec=spec)):
            state, m = step_p(state, b)
            if i < 3:
                float(m["loss"])
                base = rss_mb()
                t0 = time.perf_counter()
                continue
            k += 1
            if k % 20 == 0:
                print(f"{variant:14s} step {k:4d}  rss {rss_mb():8.0f} MB"
                      f"  (+{rss_mb()-base:7.0f})", flush=True)
            if k >= n_steps:
                break
        float(m["loss"])
        dt = time.perf_counter() - t0
        loader.close()
        mesh_mod._DISABLE_PACK_RING = False         # type: ignore
        print(f"{variant:14s} {k} steps {dt/k*1e3:6.0f} ms/step  "
              f"leak {(rss_mb()-base)/k:6.2f} MB/step", flush=True)


if __name__ == "__main__":
    main()
