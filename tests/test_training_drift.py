"""Fixed-seed training-trajectory drift tripwire.

Trains the tiny fp32 SegCLIP for 12 steps on a deterministic batch (CPU,
single device) and compares the loss trajectory to golden values recorded
when the trajectory was last intentionally changed. Any silent numerics
drift — init, Gumbel straight-through, MAE shuffles, AdaptAdamW, loss
reductions — trips this before it can reach a real pretrain.

If a change is SUPPOSED to alter numerics (new jax pin, intentional math
change), regenerate with:  python tests/test_training_drift.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segclip_tpu.config import Config, ModelConfig, OptimConfig
from segclip_tpu.models.segclip import init_segclip
from segclip_tpu.train.step import (create_train_state,
                                    make_single_device_train_step)

TINY = ModelConfig(
    image_resolution=32, vision_patch_size=8, vision_width=64,
    vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
    context_length=16, vocab_size=512, transformer_width=64,
    transformer_layers=2, embed_dim=32, max_words=12,
    use_vision_mae_recon=True, use_text_mae_recon=True, use_seglabel=True,
    mae_decoder_depth=1, mae_decoder_num_heads=2, compute_dtype="float32")

# recorded 2026-08-16 (jax 0.8.x, CPU); regenerate via __main__ below
GOLDEN_LOSSES = [
    9.1138296127,
    8.6753215790,
    8.6153755188,
    7.9110188484,
    7.7221579552,
    7.1667938232,
    6.9368648529,
    6.9361104965,
    6.7847914696,
    6.6898126602,
    6.5031542778,
    6.5417695045,
]


def run_trajectory(n_steps: int = 12):
    cfg = Config(model=TINY, optim=OptimConfig(lr=1e-3, lower_lr=1e-4))
    rng = np.random.default_rng(17)
    b = 8
    ids = np.zeros((b, TINY.max_words), np.int32)
    ids[:, 0] = 510
    ids[:, 1:5] = rng.integers(1, 500, size=(b, 4))
    ids[:, 5] = 511
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "image": jnp.asarray(
            rng.normal(size=(b, 32, 32, 3)).astype(np.float32) * 0.4),
        "image_seg": jnp.asarray(
            rng.integers(0, 4, size=(b, 4, 4)).astype(np.int32)),
    }
    model, params = init_segclip(TINY, seed=3)
    state, tx, trainable = create_train_state(cfg, params, t_total=100,
                                              seed=4)
    step = make_single_device_train_step(model, tx, trainable=trainable)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.slow
def test_training_trajectory_matches_golden():
    losses = run_trajectory()
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=5e-4,
                               err_msg="training numerics drifted — if "
                               "intentional, regenerate GOLDEN_LOSSES "
                               "(see module docstring)")


if __name__ == "__main__":
    for x in run_trajectory():
        print(f"    {x:.10f},")
