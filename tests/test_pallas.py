"""Pallas grouping-kernel tests (interpret mode on the CPU mesh): eval
bit-parity with the jnp path, straight-through training forward/gradient
parity, and model-level wiring.

(The former flash-attention kernel tests were removed with the kernel —
XLA wins at SegCLIP's sequence lengths; see docs/PERF.md.)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segclip_tpu.ops.grouping import group_assign_aggregate
from segclip_tpu.ops.pallas.grouping import (fused_group_assign,
                                             fused_group_assign_st)

RNG = np.random.default_rng(23)


def _qkv(b=2, g=4, l=19, d=16, single_patch_group=False):
    q = RNG.normal(size=(b, g, d)).astype(np.float32)
    k = RNG.normal(size=(b, l, d)).astype(np.float32)
    v = RNG.normal(size=(b, l, d)).astype(np.float32)
    if single_patch_group:
        # engineer group 0 to win exactly one patch and group 1 none:
        # exercises the max(count,1) subgradient branches (1 / 0.5 / 0)
        q[:, 0] = 10.0 * k[:, 0] / np.linalg.norm(k[:, 0], axis=-1,
                                                  keepdims=True)
        q[:, 1] = -10.0 * q[:, 2:].mean(1)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_fused_grouping_eval_matches_reference_path():
    q, k, v = _qkv()
    out, hard, soft = fused_group_assign(q, k, v, tau=0.9, training=False)

    logits = jnp.einsum("bgd,bld->bgl", q, k)
    out_ref, hard_ref, soft_ref = group_assign_aggregate(
        logits, v, tau=0.9, training=False)

    np.testing.assert_allclose(np.asarray(hard), np.asarray(hard_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-4)


def test_fused_grouping_st_forward_matches_jnp():
    q, k, v = _qkv()
    noise = jnp.asarray(
        RNG.gumbel(size=(2, 4, 19)).astype(np.float32))
    out, hard, soft = fused_group_assign_st(q, k, v, noise, 0.9, True)

    logits = jnp.einsum("bgd,bld->bgl", q, k,
                        preferred_element_type=jnp.float32)
    out_ref, hard_ref, soft_ref = group_assign_aggregate(
        logits, v, tau=0.9, training=True, gumbel_noise=noise)

    np.testing.assert_allclose(np.asarray(hard), np.asarray(hard_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-4)
    h = np.asarray(hard)
    np.testing.assert_allclose(h.sum(1), np.ones((2, 19)), atol=1e-6)
    assert ((h == 0) | (h == 1)).all()


@pytest.mark.parametrize("single_patch_group", [False, True])
def test_fused_grouping_st_gradients_match_jnp(single_patch_group):
    """The hand-derived straight-through VJP must equal autodiff through
    the jnp path — including the hard/soft output cotangents and the
    max(count, 1) subgradient at counts of 0 and exactly 1."""
    q, k, v = _qkv(single_patch_group=single_patch_group)
    noise = jnp.asarray(RNG.gumbel(size=(2, 4, 19)).astype(np.float32))
    w_out = jnp.asarray(RNG.normal(size=(2, 4, 16)).astype(np.float32))
    w_hard = jnp.asarray(RNG.normal(size=(2, 4, 19)).astype(np.float32))
    w_soft = jnp.asarray(RNG.normal(size=(2, 4, 19)).astype(np.float32))

    def loss_fused(args):
        out, hard, soft = fused_group_assign_st(*args, noise, 0.9, True)
        return (jnp.sum(out * w_out) + jnp.sum(hard * w_hard)
                + jnp.sum(soft * w_soft))

    def loss_jnp(args):
        q_, k_, v_ = args
        logits = jnp.einsum("bgd,bld->bgl", q_, k_,
                            preferred_element_type=jnp.float32)
        out, hard, soft = group_assign_aggregate(
            logits, v_, tau=0.9, training=True, gumbel_noise=noise)
        return (jnp.sum(out * w_out) + jnp.sum(hard * w_hard)
                + jnp.sum(soft * w_soft))

    np.testing.assert_allclose(float(loss_fused((q, k, v))),
                               float(loss_jnp((q, k, v))), rtol=1e-5)
    g_fused = jax.grad(loss_fused)((q, k, v))
    g_jnp = jax.grad(loss_jnp)((q, k, v))
    for name, a, b in zip("qkv", g_fused, g_jnp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"grad {name}")


def test_model_training_forward_pallas_matches_jnp():
    """Full SegCLIP training losses with grouping_impl='pallas' (interpret)
    == 'jnp', same rngs — validates the SemanticLearner wiring incl. the
    shared noise draw."""
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip

    kw = dict(image_resolution=32, vision_patch_size=8, vision_width=64,
              vision_layers=3, first_stage_layer=2, group_num=4,
              cross_layer=1, context_length=16, vocab_size=512,
              transformer_width=64, transformer_layers=2, embed_dim=32,
              max_words=12, use_vision_mae_recon=True,
              use_text_mae_recon=False, use_seglabel=True,
              mae_decoder_depth=1, mae_decoder_num_heads=2,
              compute_dtype="float32")
    model_j, params = init_segclip(ModelConfig(grouping_impl="jnp", **kw),
                                   seed=0)
    model_p, _ = init_segclip(ModelConfig(grouping_impl="pallas", **kw),
                              seed=0)

    ids = np.zeros((2, 12), np.int32)
    ids[:, 0] = 510
    ids[:, 1:4] = RNG.integers(1, 500, size=(2, 3))
    ids[:, 4] = 511
    batch = (jnp.asarray(ids), jnp.asarray((ids != 0).astype(np.int32)),
             jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32)),
             jnp.asarray(RNG.integers(0, 3, size=(2, 4, 4)).astype(np.int32)))
    rngs = {"gumbel": jax.random.key(7), "mae": jax.random.key(8)}

    l_j = model_j.apply({"params": params}, *batch, training=True, rngs=rngs)
    l_p = model_p.apply({"params": params}, *batch, training=True, rngs=rngs)
    for key in l_j:
        np.testing.assert_allclose(float(l_p[key]), float(l_j[key]),
                                   rtol=1e-5, err_msg=key)


def test_sdpa_rejects_removed_impl():
    from segclip_tpu.ops.attention import sdpa
    q = jnp.zeros((1, 1, 4, 8))
    with pytest.raises(ValueError, match="removed"):
        sdpa(q, q, q, impl="pallas")
