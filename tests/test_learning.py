"""From-scratch learning regression: the full 3-loss system (InfoNCE +
superpixel-KL + vision MAE) must drive the CONTRASTIVE loss well below
chance on the procedural shapes corpus within a fixed step budget.

This is the CPU-mesh miniature of the on-chip learnability proof
(docs/PERF.md "Learning the shapes corpus"): same generator, same losses,
same optimizer — a tiny tower and 64² scenes so it fits the test budget.
Chance for the symmetric InfoNCE at global batch B is ln(B); a model whose
vision or text tower collapses (the observed failure mode at too-high lr)
pins sim_loss at EXACTLY ln(B), so the assertion below is a real tripwire,
not a formality.  Calibration (lr 3e-4): B=32 × 200 steps reaches
sim 3.47 → 1.32; the B=16 × 100-step budget here measured 1.73-1.98 over
the last quarter vs chance 2.77 — a ~17% margin against the 0.8×chance
bar (at 60 steps it sits ON the bar; don't shrink the budget).

The zero-shot mIoU closure (train → eval harness → mIoU >> random init)
runs on the chip (it needs thousands of steps at ViT-B scale); its recipe
and measured curve live in docs/PERF.md.
"""
import numpy as np
import pytest

from segclip_tpu.config import Config, ModelConfig, OptimConfig
from segclip_tpu.data.procgen import generate_scene
from segclip_tpu.data.superpixel import crop_seg_from_cache, felzenszwalb
from segclip_tpu.data.tokenizer import default_tokenizer, tokenize_with_mask
from segclip_tpu.data.transforms import clip_normalize

RES, PATCH, B, STEPS = 64, 8, 16, 100


@pytest.mark.slow
def test_full_system_learns_contrastive_alignment():
    import jax
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)

    tiny = ModelConfig(
        image_resolution=RES, vision_patch_size=PATCH, vision_width=128,
        vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
        context_length=32, vocab_size=49408, transformer_width=128,
        transformer_layers=2, embed_dim=64, max_words=16,
        use_vision_mae_recon=True, use_seglabel=True, mae_decoder_depth=1,
        mae_decoder_num_heads=2, compute_dtype="float32")
    cfg = Config(model=tiny, optim=OptimConfig(lr=3e-4, lower_lr=3e-4,
                                               warmup_proportion=0.1))

    tok = default_tokenizer()
    rng = np.random.default_rng(0)
    n = 128
    samples = []
    for _ in range(n):
        img, _, cap = generate_scene(rng, (RES, RES))
        sp = felzenszwalb(img, scale=64.0, sigma=0.8, min_size=40)
        seg = crop_seg_from_cache(sp, np.array([0, 0, 1, 1], np.float32),
                                  img_size=RES, patch_size=PATCH)
        ids, m = tokenize_with_mask(tok, cap, tiny.max_words)
        samples.append((clip_normalize(img), ids, m, seg.astype(np.int32)))

    model, params = init_segclip(tiny, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=STEPS,
                                              seed=0)
    mesh = make_mesh()
    step = make_sharded_train_step(mesh, model, tx, trainable=trainable)

    def make_batch(step_i):
        idx = np.random.default_rng(step_i).integers(0, n, B)
        return shard_batch(mesh, {
            "input_ids": np.stack([samples[i][1] for i in idx]),
            "attention_mask": np.stack([samples[i][2] for i in idx]),
            "image": np.stack([samples[i][0] for i in idx]),
            "image_seg": np.stack([samples[i][3] for i in idx]),
        })

    sims = []
    for i in range(STEPS):
        state, metrics = step(state, make_batch(i))
        if i % 10 == 0 or i == STEPS - 1:
            sims.append(float(metrics["sim_loss"]))

    chance = float(np.log(B))
    final = float(np.mean(sims[-3:]))
    # collapse pins sim at exactly ln(B); healthy runs reach <0.8×chance
    # within this budget with margin (calibration: ~1.9 vs 2.77)
    assert final < 0.8 * chance, (
        f"contrastive loss failed to learn: final {final:.3f} vs "
        f"chance {chance:.3f} (trajectory {sims})")
    assert np.isfinite(float(metrics["loss"]))
