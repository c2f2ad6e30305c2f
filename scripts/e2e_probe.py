"""Focused end-to-end (records → BatchLoader → step) throughput probe on
the real chip, per transfer mode. Quicker iteration than full bench.py.

Usage: python scripts/e2e_probe.py <corpus_dir> <name> [modes...]
  modes: rgb yuv420 device_aug  (default: rgb yuv420)
"""
import sys
import time

import numpy as np


def main():
    corpus, name = sys.argv[1], sys.argv[2]
    modes = sys.argv[3:] or ["rgb", "yuv420"]

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import (PackedSpec, make_mesh,
                                           prefetch_to_device)
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)
    from segclip_tpu.data.pipeline import (BatchLoader, PairRecordDataset,
                                           ShardedEpochSampler, _load_one)

    cfg_m = ModelConfig()
    cfg = Config(model=cfg_m, optim=OptimConfig())
    n_dev = jax.device_count()
    batch = 96 * n_dev

    model, params = init_segclip(cfg_m, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=1000,
                                              seed=0)
    mesh = make_mesh()

    for mode in modes:
        packed = not mode.endswith("_unpacked")
        base = mode.removesuffix("_unpacked")
        device_aug = base == "device_aug"
        transfer = "yuv420" if base == "yuv420" else "rgb"
        ds = PairRecordDataset(name, corpus, max_words=cfg_m.max_words,
                               use_seg=True, normalize=False,
                               device_aug=device_aug, transfer=transfer)
        sampler = ShardedEpochSampler(len(ds), global_batch=batch)
        loader = BatchLoader(ds, sampler, seed=0, prefetch=4)
        spec = None
        if packed:
            probe = _load_one(ds, 0, np.random.default_rng(0))
            spec = PackedSpec.from_batch(
                {k: np.asarray(v)[None] for k, v in probe.items()})
        step_p = make_sharded_train_step(mesh, model, tx,
                                         trainable=trainable,
                                         packed_spec=spec)
        n_steps = 0
        t0 = 0.0
        max_steps = 30
        # Warm 3 synced steps: compile + the steady-state-input-sharding
        # recompile land before the timed window (CLAUDE.md: warm twice;
        # +1 margin). Timing starts at the 4th batch.
        warm = 3
        for i, b in enumerate(prefetch_to_device(loader.epoch(1), mesh,
                                                 pack_spec=spec)):
            state, metrics = step_p(state, b)
            if i < warm:
                float(metrics["loss"])
                t0 = time.perf_counter()
                continue
            n_steps += 1
            if n_steps >= max_steps:
                break
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        loader.close()
        rate = batch * n_steps / dt / n_dev
        print(f"{mode:12s} {n_steps} steps  {dt/n_steps*1e3:7.1f} ms/step  "
              f"{rate:7.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
