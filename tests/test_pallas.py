"""Pallas kernel tests (interpret mode on the CPU mesh): numerical parity
with the XLA attention path, gradients, masking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segclip_tpu.ops.attention import causal_mask, padding_bias, sdpa
from segclip_tpu.ops.pallas.flash_attention import flash_attention

RNG = np.random.default_rng(23)


def _qkv(b=2, h=3, lq=17, lk=23, d=16):
    q = jnp.asarray(RNG.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, lk, d)).astype(np.float32))
    return q, k, v


def test_matches_xla_no_bias():
    q, k, v = _qkv()
    got = flash_attention(q, k, v)
    want = sdpa(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_xla_causal():
    q, k, v = _qkv(lq=19, lk=19)
    bias = causal_mask(19)
    got = flash_attention(q, k, v, bias)
    want = sdpa(q, k, v, bias=bias, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_xla_padding_bias():
    q, k, v = _qkv(b=3, lq=11, lk=11)
    mask = jnp.asarray((RNG.uniform(size=(3, 11)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    bias = padding_bias(mask)
    got = flash_attention(q, k, v, bias)
    want = sdpa(q, k, v, bias=bias, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_xla():
    q, k, v = _qkv(b=1, h=2, lq=9, lk=9, d=8)
    bias = causal_mask(9)

    def loss_pallas(args):
        return jnp.sum(flash_attention(*args, bias) ** 2)

    def loss_xla(args):
        return jnp.sum(sdpa(*args, bias=bias, impl="xla") ** 2)

    gp = jax.grad(loss_pallas)((q, k, v))
    gx = jax.grad(loss_xla)((q, k, v))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_bf16_inputs():
    q, k, v = _qkv(lq=16, lk=16)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), \
        v.astype(jnp.bfloat16)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = sdpa(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32), atol=3e-2)


def test_full_model_with_pallas_attention():
    """The whole SegCLIP forward runs with attention_impl='pallas' and
    matches the XLA-impl output."""
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip

    kw = dict(image_resolution=32, vision_patch_size=8, vision_width=64,
              vision_layers=3, first_stage_layer=2, group_num=4,
              cross_layer=1, context_length=16, vocab_size=512,
              transformer_width=64, transformer_layers=2, embed_dim=32,
              max_words=12, use_vision_mae_recon=False,
              use_text_mae_recon=False, compute_dtype="float32")
    cfg_x = ModelConfig(attention_impl="xla", **kw)
    cfg_p = ModelConfig(attention_impl="pallas", **kw)

    model_x, params = init_segclip(cfg_x, seed=0)
    model_p, _ = init_segclip(cfg_p, seed=0)

    img = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))
    out_x = model_x.apply({"params": params}, img,
                          method=lambda m, im: m.encode_image(im,
                                                              training=False))
    out_p = model_p.apply({"params": params}, img,
                          method=lambda m, im: m.encode_image(im,
                                                              training=False))
    np.testing.assert_allclose(np.asarray(out_p.pooled),
                               np.asarray(out_x.pooled), atol=1e-4)


def test_fused_grouping_eval_matches_reference_path():
    from segclip_tpu.ops.pallas.grouping import fused_group_assign
    from segclip_tpu.ops.grouping import group_assign_aggregate
    B, G, L, D = 2, 4, 19, 16
    q = jnp.asarray(RNG.normal(size=(B, G, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, L, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, L, D)).astype(np.float32))

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


def test_fused_grouping_training_valid_distribution():
    from segclip_tpu.ops.pallas.grouping import fused_group_assign
    B, G, L, D = 2, 4, 16, 8
    q = jnp.asarray(RNG.normal(size=(B, G, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, L, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, L, D)).astype(np.float32))
    out, hard, soft = fused_group_assign(q, k, v, tau=0.9, training=True,
                                         seed=jnp.asarray(42, jnp.int32))
    h = np.asarray(hard)
    np.testing.assert_allclose(h.sum(1), np.ones((B, L)), atol=1e-6)
    assert ((h == 0) | (h == 1)).all()
    # Gumbel noise must change assignments vs eval at least somewhere
    _, h_eval, _ = fused_group_assign(q, k, v, tau=0.9, training=False)
    assert not np.array_equal(h, np.asarray(h_eval))
    # different seed → different draw
    _, h2, _ = fused_group_assign(q, k, v, tau=0.9, training=True,
                                  seed=jnp.asarray(43, jnp.int32))
    assert not np.array_equal(h, np.asarray(h2))
