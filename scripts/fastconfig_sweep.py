"""The honest 'max-throughput configuration' measurement (VERDICT r3 #6).

Rounds 2-3 measured each opt-in lever only in ISOLATION against the
reference-semantics default (docs/PERF.md): moment_dtype=bfloat16 was
step-time-neutral (a memory lever), pallas_vmem attention won 22% isolated
but lost 1.8% in-graph, and the batch sweep ran at fp32 moments. This
script measures the COMBINATION: Adam moments stored bf16 (freeing
~0.72 GB at 180M params) with the per-chip batch re-swept under the freed
HBM, optionally × attention_impl — device-only (synthetic host batch,
value-fetch synced), the same protocol as bench.py's headline number.

Usage (quiet chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/fastconfig_sweep.py \
        [--batches 96,128,192,256] [--attn xla,pallas_vmem] [--steps 15]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(batch: int, moment_dtype: str, attn: str, remat: bool,
            steps: int) -> dict:
    import dataclasses
    import jax
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)

    cfg_m = ModelConfig(attention_impl=attn, remat=remat)
    cfg = Config(model=cfg_m,
                 optim=OptimConfig(moment_dtype=moment_dtype))
    model, params = init_segclip(cfg_m, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=1000,
                                              seed=0)
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
        "image": rng.integers(0, 256, size=(batch, 224, 224, 3)
                              ).astype(np.uint8),
        "image_seg": rng.integers(0, 32, size=(batch, 14, 14)
                                  ).astype(np.int32),
    })
    # AOT memory pre-check: an execute-time HBM OOM over the tunnel KILLS
    # the axon worker (docs/PERF.md "Memory levers") and would poison every
    # later row of the sweep — so configs that don't fit are reported from
    # the compiler's memory analysis and never executed.
    ma = step.lower(state, data).compile().memory_analysis()
    gb = 2.0 ** 30
    temp, args_b, out = (ma.temp_size_in_bytes / gb,
                         ma.argument_size_in_bytes / gb,
                         ma.output_size_in_bytes / gb)
    # args are donated (state updates in place), so peak ≈ args + temp.
    if temp + args_b > 15.0:
        return {"ok": False, "error": "would-OOM (skipped, not executed)",
                "temp_gb": round(temp, 2), "args_gb": round(args_b, 2),
                "out_gb": round(out, 2)}
    try:
        for _ in range(2):          # compile + steady-sharding recompile
            state, metrics = step(state, data)
            float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, data)
        float(metrics["loss"])      # chained state forces all steps
        dt = (time.perf_counter() - t0) / steps
        return {"ok": True, "ms_per_step": round(dt * 1e3, 1),
                "img_s": round(batch / dt, 1),
                "temp_gb": round(temp, 2), "args_gb": round(args_b, 2)}
    except Exception as e:          # OOM rows are data, not failures
        return {"ok": False, "error": type(e).__name__,
                "detail": str(e)[:160]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="96,128,192,256")
    ap.add_argument("--attn", default="xla")
    ap.add_argument("--moment-dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--baseline", action="store_true",
                    help="also measure the reference-semantics default "
                         "(B=96, fp32 moments, xla attention)")
    args = ap.parse_args()

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()

    rows = []
    if args.baseline:
        r = measure(96, "float32", "xla", False, args.steps)
        rows.append({"config": "default B=96 fp32-moments xla", **r})
        print(json.dumps(rows[-1]), flush=True)
    for attn in args.attn.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            r = measure(b, args.moment_dtype, attn, args.remat, args.steps)
            rows.append({"config": f"B={b} {args.moment_dtype}-moments "
                                   f"{attn}" + (" remat" if args.remat
                                                else ""), **r})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
