"""Pretrain-throughput benchmark on the local chip(s).

Measures full SegCLIP ViT-B/16 training-step throughput (all reference
losses: global-batch InfoNCE + superpixel-KL + vision MAE — the released
recipe, README.md:120-123) in images/sec/chip on synthetic data.

Baseline denominator: the driver's north star is "beat 4×A100 pretrain
img/s on a v5e-8" (BASELINE.json). A100 CLIP-ViT-B/16+MAE pretrain runs
~600 img/s/GPU ⇒ 4×A100 ≈ 2400 img/s ⇒ parity on 8 chips = 300
img/s/chip. vs_baseline = measured_per_chip / 300.

Prints exactly ONE JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_S_PER_CHIP = 300.0


def main():
    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)

    cfg_m = ModelConfig()          # ViT-B/16, bf16 compute
    cfg = Config(model=cfg_m, optim=OptimConfig())

    n_dev = jax.device_count()
    per_chip_batch = 96            # reference: 768 global / 8 GPUs
    batch = per_chip_batch * n_dev

    model, params = init_segclip(cfg_m, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=1000, seed=0)
    mesh = make_mesh()
    step = make_sharded_train_step(mesh, model, tx, trainable=trainable)

    rng = np.random.default_rng(0)
    ids = np.zeros((batch, cfg_m.max_words), np.int32)
    ids[:, 0] = 49406
    lens = rng.integers(5, cfg_m.max_words - 1, size=batch)
    for i, n in enumerate(lens):
        ids[i, 1:n] = rng.integers(1, 49000, size=n - 1)
        ids[i, n] = 49407
    data = shard_batch(mesh, {
        "input_ids": ids,
        "attention_mask": (ids != 0).astype(np.int32),
        "image": rng.normal(size=(batch, 224, 224, 3)).astype(np.float32) * 0.3,
        "image_seg": rng.integers(0, 32, size=(batch, 14, 14)).astype(np.int32),
    })

    # Warm up twice: the first call compiles, the second recompiles for the
    # steady-state input sharding. float() host fetches are the only honest
    # sync on the tunneled axon backend (block_until_ready returns early).
    for _ in range(2):
        state, metrics = step(state, data)
        float(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, data)
    float(metrics["loss"])   # chain through state forces all steps
    dt = time.perf_counter() - t0

    img_s = batch * n_steps / dt
    img_s_chip = img_s / n_dev
    print(json.dumps({
        "metric": "pretrain_images_per_sec_per_chip",
        "value": round(img_s_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / BASELINE_IMG_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
