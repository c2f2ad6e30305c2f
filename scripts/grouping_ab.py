"""Full-train-step A/B of grouping_impl (pallas vs jnp) at the three
configs VERDICT r2 asked about: ViT-L/14 B=32, 448-res B=24, B=256+remat.

Usage: python scripts/grouping_ab.py [config ...]
  configs: l14 res448 b256  (default: all)
"""
import sys
import time

import numpy as np

CONFIGS = {
    # (arch name, extra ModelConfig kwargs, per-chip batch, remat)
    "l14": ("ViT-L/14", dict(), 32, False),
    "res448": ("ViT-B/16", dict(image_resolution=448), 24, False),
    "b256": ("ViT-B/16", dict(), 256, True),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)

    mesh = make_mesh()
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)

    from segclip_tpu.config import model_config_for

    for cname in names:
        arch, kwargs, per_chip, remat = CONFIGS[cname]
        batch = per_chip * n_dev
        for impl in ("jnp", "pallas"):
            cfg_m = model_config_for(arch, grouping_impl=impl, remat=remat,
                                     **kwargs)
            cfg = Config(model=cfg_m, optim=OptimConfig())
            model, params = init_segclip(cfg_m, seed=0)
            state, tx, trainable = create_train_state(cfg, params,
                                                      t_total=1000, seed=0)
            step = make_sharded_train_step(mesh, model, tx,
                                           trainable=trainable)
            ids = np.zeros((batch, cfg_m.max_words), np.int32)
            ids[:, 0] = 49406
            lens = rng.integers(5, cfg_m.max_words - 1, size=batch)
            for i, n in enumerate(lens):
                ids[i, 1:n] = rng.integers(1, 49000, size=n - 1)
                ids[i, n] = 49407
            res = cfg_m.image_resolution
            grid = res // cfg_m.vision_patch_size
            data = shard_batch(mesh, {
                "input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int32),
                "image": rng.integers(0, 256, size=(batch, res, res, 3)
                                      ).astype(np.uint8),
                "image_seg": rng.integers(0, 32, size=(batch, grid, grid)
                                          ).astype(np.int32),
            })
            for _ in range(2):
                state, metrics = step(state, data)
                float(metrics["loss"])
            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, metrics = step(state, data)
            float(metrics["loss"])
            dt = time.perf_counter() - t0
            ms = dt / n_steps * 1e3
            print(f"{cname:8s} impl={impl:6s} B={per_chip:4d} "
                  f"remat={remat}  {ms:8.1f} ms/step  "
                  f"{batch * n_steps / dt / n_dev:7.1f} img/s/chip",
                  flush=True)
            del state, step, model, params
        print(flush=True)


if __name__ == "__main__":
    main()
