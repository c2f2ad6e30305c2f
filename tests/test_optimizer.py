"""AdaptAdamW vs a numpy oracle transcribed from the reference formulas
(optimization_adamw.py:111-174), plus schedule and grouping tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segclip_tpu.config import OptimConfig
from segclip_tpu.train.optimizer import (adapt_adamw, global_norm_clip,
                                         scheduled_lr, warmup_constant,
                                         warmup_cosine, warmup_linear)
from segclip_tpu.train.param_groups import (group_of, is_frozen, is_no_decay,
                                            lr_wd_trees, trainable_tree)

RNG = np.random.default_rng(3)


def _oracle_step(p, g, m, v, step, lr, wd, b1, b2, eps, t_total, warmup,
                 lr_start, lr_end):
    """One AdaptAdamW step (numpy): schedule inside, decay before update."""
    import math
    step += 1
    bc1 = 1 - b1 ** step
    bc2 = 1 - b2 ** step
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    denom = np.sqrt(v) / math.sqrt(bc2) + eps
    x = step / t_total
    if x < warmup:
        sched = x * (1 - lr_start) / warmup + lr_start
    else:
        nx = (x - warmup) / (1 - warmup)
        sched = lr_end + 0.5 * (1 - lr_end) * (1 + math.cos(math.pi * nx))
    lr_t = lr * sched
    p = p * (1 - lr_t * wd)
    p = p - (lr_t / bc1) * m / denom
    return p, m, v, step


def test_adapt_adamw_matches_oracle_two_groups():
    shapes = {"a": (4, 3), "b": (5,)}
    lrs = {"a": 1e-2, "b": 1e-4}
    wds = {"a": 0.05, "b": 0.0}
    t_total, warmup = 20, 0.15

    params = {k: RNG.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    tx = adapt_adamw(lr_tree={k: lrs[k] for k in shapes},
                     wd_tree={k: wds[k] for k in shapes},
                     trainable_tree={k: True for k in shapes},
                     t_total=t_total, warmup=warmup, b1=0.9, b2=0.98,
                     eps=1e-6)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    st = tx.init(jp)

    op = {k: v.copy() for k, v in params.items()}
    om = {k: np.zeros_like(v) for k, v in params.items()}
    ov = {k: np.zeros_like(v) for k, v in params.items()}
    ostep = 0

    for i in range(6):
        grads = {k: RNG.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        jg = {k: jnp.asarray(v) for k, v in grads.items()}
        updates, st = tx.update(jg, st, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)
        step_after = ostep
        for k in shapes:
            op[k], om[k], ov[k], step_after = _oracle_step(
                op[k], grads[k], om[k], ov[k], ostep, lrs[k], wds[k],
                0.9, 0.98, 1e-6, t_total, warmup, 0.0, 0.0)
        ostep = step_after

    for k in shapes:
        np.testing.assert_allclose(np.asarray(jp[k]), op[k], rtol=2e-5,
                                   atol=1e-7, err_msg=k)


def test_bf16_moments_track_fp32():
    """moment_dtype=bfloat16: moments stored rounded (half the optimizer
    HBM), math in fp32 — trajectories stay close to the fp32 path."""
    shape = (16, 8)
    params = RNG.normal(size=shape).astype(np.float32)

    def run(moment_dtype):
        tx = adapt_adamw(lr_tree=1e-2, wd_tree=0.05, trainable_tree=True,
                         t_total=20, warmup=0.15, moment_dtype=moment_dtype)
        p = jnp.asarray(params)
        st = tx.init(p)
        rng = np.random.default_rng(11)
        for _ in range(8):
            g = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            upd, st = tx.update(g, st, p)
            p = p + upd
        return np.asarray(p), st

    p32, _ = run("float32")
    pbf, st = run("bfloat16")
    assert st.mu.dtype == jnp.bfloat16 and st.nu.dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; after 8 steps at lr 1e-2 the param delta
    # is O(1e-2) per step — demand agreement well inside the update scale.
    np.testing.assert_allclose(pbf, p32, rtol=0, atol=2e-3)
    assert not np.allclose(pbf, params)       # it did actually train


def test_frozen_leaves_untouched():
    params = {"w": jnp.ones((3,)), "f": jnp.ones((3,))}
    tx = adapt_adamw(lr_tree={"w": 0.1, "f": 0.1},
                     wd_tree={"w": 0.1, "f": 0.1},
                     trainable_tree={"w": True, "f": False},
                     t_total=10, warmup=0.1)
    st = tx.init(params)
    g = {"w": jnp.ones((3,)), "f": jnp.ones((3,))}
    upd, st = tx.update(g, st, params)
    assert np.abs(np.asarray(upd["w"])).sum() > 0
    np.testing.assert_array_equal(np.asarray(upd["f"]), np.zeros(3))
    np.testing.assert_array_equal(np.asarray(st.mu["f"]), np.zeros(3))


def test_schedules():
    # warmup region is linear from lr_start
    np.testing.assert_allclose(float(warmup_cosine(0.075, 0.15)), 0.5, atol=1e-6)
    # end of cosine reaches lr_end
    np.testing.assert_allclose(float(warmup_cosine(1.0, 0.15, lr_end=0.1)),
                               0.1, atol=1e-6)
    np.testing.assert_allclose(float(warmup_constant(0.5, 0.15)), 1.0)
    np.testing.assert_allclose(float(warmup_linear(0.5, 0.15)),
                               (0.5 - 1) / (0.15 - 1), atol=1e-6)
    lr = scheduled_lr(jnp.asarray(3), 4e-3, t_total=20, warmup=0.15)
    np.testing.assert_allclose(float(lr), 4e-3 * (3 / 20) / 0.15, rtol=1e-5)


def test_global_norm_clip():
    g = {"a": jnp.full((4,), 3.0)}          # norm 6
    clipped, norm = global_norm_clip(g, 1.0)
    np.testing.assert_allclose(float(norm), 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               np.full(4, 0.5), rtol=1e-4)
    # below threshold: untouched
    g2 = {"a": jnp.full((4,), 0.1)}
    clipped2, _ = global_norm_clip(g2, 1.0)
    np.testing.assert_allclose(np.asarray(clipped2["a"]), np.full(4, 0.1),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# grouping / freezing policy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path,group", [
    ("clip/visual/transformer/layers0_3/attn/qkv_kernel", "clip_freeze"),
    ("clip/transformer/resblocks_11/mlp/c_fc/kernel", "clip_freeze"),
    ("clip/logit_scale", "clip_freeze"),
    ("clip/text_projection", "clip_freeze"),
    ("clip/token_embedding/embedding", "clip_text_freeze"),
    ("clip/positional_embedding", "clip_text_freeze"),
    ("clip/visual/transformer/layers2_0/ln_1/scale", "clip_train"),
    ("clip/visual/transformer/semantic_layer2/semantic_center", "clip_train"),
    ("clip/visual/ln_post/scale", "clip_train"),
    ("clip/visual/proj", "clip_train"),
    ("vis_mae_decoder/core/mask_token", "other"),
])
def test_group_assignment(path, group):
    assert group_of(path) == group


def test_no_decay_is_bias_only():
    assert is_no_decay("clip/visual/ln_pre/bias")
    assert is_no_decay("clip/transformer/resblocks_0/attn/qkv_bias")
    assert not is_no_decay("clip/visual/ln_pre/scale")
    assert not is_no_decay("clip/visual/proj")


def test_freeze_default_policy():
    """Default (freeze_layer_num=0, pretrained ViT): embeddings + conv1 +
    ln_pre frozen; transformer layers and new modules train."""
    cfg = OptimConfig()
    frozen = ["clip/visual/positional_embedding",
              "clip/visual/conv1",
              "clip/visual/class_embedding",
              "clip/visual/ln_pre/scale",
              "clip/positional_embedding",
              "clip/token_embedding/embedding"]
    trainable = ["clip/visual/transformer/layers0_0/attn/qkv_kernel",
                 "clip/transformer/resblocks_0/mlp/c_fc/kernel",
                 "clip/visual/transformer/semantic_layer2/semantic_center",
                 "clip/visual/transformer/layers_mae2_0/ln_1/scale",
                 "clip/visual/transformer/reconstruct_layer2/rec_proj_a/kernel",
                 "clip/ln_final/scale", "clip/logit_scale",
                 "clip/visual/ln_post/scale", "clip/visual/proj",
                 "vis_mae_decoder/decoder_pred/kernel"]
    for p in frozen:
        assert is_frozen(p, cfg), p
    for p in trainable:
        assert not is_frozen(p, cfg), p


def test_freeze_layer_gate():
    cfg = OptimConfig(freeze_layer_num=11)
    assert is_frozen("clip/visual/transformer/layers0_9/ln_1/scale", cfg)
    assert is_frozen("clip/visual/transformer/layers2_0/ln_1/scale", cfg,
                     first_stage_layer=10)          # global idx 10 < 11
    assert not is_frozen("clip/visual/transformer/layers2_1/ln_1/scale", cfg,
                         first_stage_layer=10)      # global idx 11
    assert is_frozen("clip/transformer/resblocks_10/ln_1/scale", cfg)
    assert not is_frozen("clip/transformer/resblocks_11/ln_1/scale", cfg)


def test_freeze_text_layer_pass():
    cfg = OptimConfig(freeze_layer_num=-1, freeze_text_layer_num=6)
    assert is_frozen("clip/transformer/resblocks_5/ln_1/scale", cfg)
    assert not is_frozen("clip/transformer/resblocks_6/ln_1/scale", cfg)
    assert is_frozen("clip/token_embedding/embedding", cfg)
    # pass (a) disabled: ln_pre trains
    assert not is_frozen("clip/visual/ln_pre/scale", cfg)
    # pass (c) still applies
    assert is_frozen("clip/visual/conv1", cfg)


def test_lr_wd_trees_structure():
    params = {"clip": {"logit_scale": jnp.zeros(()),
                       "visual": {"proj": jnp.zeros((2, 2)),
                                  "ln_pre": {"bias": jnp.zeros(2)}}},
              "vis_mae_decoder": {"decoder_pred":
                                  {"kernel": jnp.zeros((2, 2))}}}
    cfg = OptimConfig(lr=4e-3, lower_lr=4e-6, weight_decay=0.05)
    lr_tree, wd_tree = lr_wd_trees(params, cfg)
    assert lr_tree["clip"]["logit_scale"] == 4e-6
    assert lr_tree["clip"]["visual"]["proj"] == 4e-3
    assert lr_tree["vis_mae_decoder"]["decoder_pred"]["kernel"] == 4e-3
    assert wd_tree["clip"]["visual"]["ln_pre"]["bias"] == 0.0
    assert wd_tree["clip"]["visual"]["proj"] == 0.05


def test_lr_coef_fallback():
    """lower_lr == 0 → pretrained-CLIP LR falls back to lr * coef_lr
    (reference main_task_align.py:226,460)."""
    params = {"clip": {"logit_scale": jnp.zeros(())},
              "vis_mae_decoder": {"w": jnp.zeros((2, 2))}}
    cfg = OptimConfig(lr=4e-3, lower_lr=0.0, coef_lr=0.5)
    lr_tree, _ = lr_wd_trees(params, cfg)
    assert lr_tree["clip"]["logit_scale"] == 4e-3 * 0.5
    assert lr_tree["vis_mae_decoder"]["w"] == 4e-3
