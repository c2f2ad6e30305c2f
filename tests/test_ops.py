"""Unit tests for core ops against torch/numpy oracles.

torch (CPU) is used strictly as a numerical oracle — the implementations
under test are pure JAX.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from segclip_tpu.ops.layers import layer_norm, quick_gelu
from segclip_tpu.ops.attention import (causal_mask, multi_head_attention,
                                       padding_bias)
from segclip_tpu.ops.masking import random_masking
from segclip_tpu.ops.grouping import gumbel_softmax, group_assign_aggregate
from segclip_tpu.ops.pos_embed import (interp_matrix, resize_2d, sincos_2d,
                                       sinusoid_table, interpolate_pos_embed)

RNG = np.random.default_rng(0)


def test_layer_norm_matches_torch():
    x = RNG.normal(size=(2, 5, 16)).astype(np.float32)
    scale = RNG.normal(size=(16,)).astype(np.float32)
    bias = RNG.normal(size=(16,)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    want = TF.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                         torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_quick_gelu():
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    got = np.asarray(quick_gelu(jnp.asarray(x)))
    want = x * (1.0 / (1.0 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _torch_mha(x_q, x_kv, wqkv, bqkv, wout, bout, num_heads, attn_mask=None):
    """torch nn.MultiheadAttention oracle with explicit packed weights."""
    d = x_q.shape[-1]
    mha = torch.nn.MultiheadAttention(d, num_heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(wqkv.T))
        mha.in_proj_bias.copy_(torch.from_numpy(bqkv))
        mha.out_proj.weight.copy_(torch.from_numpy(wout.T))
        mha.out_proj.bias.copy_(torch.from_numpy(bout))
    out, _ = mha(torch.from_numpy(x_q), torch.from_numpy(x_kv),
                 torch.from_numpy(x_kv), need_weights=False,
                 attn_mask=attn_mask)
    return out.detach().numpy()


@pytest.mark.parametrize("cross", [False, True])
def test_mha_matches_torch(cross):
    d, h = 64, 4
    x_q = RNG.normal(size=(2, 7, d)).astype(np.float32)
    x_kv = RNG.normal(size=(2, 11, d)).astype(np.float32) if cross else x_q
    wqkv = (RNG.normal(size=(d, 3 * d)) * 0.05).astype(np.float32)
    bqkv = RNG.normal(size=(3 * d,)).astype(np.float32) * 0.05
    wout = (RNG.normal(size=(d, d)) * 0.05).astype(np.float32)
    bout = RNG.normal(size=(d,)).astype(np.float32) * 0.05

    params = {"qkv": {"kernel": jnp.asarray(wqkv), "bias": jnp.asarray(bqkv)},
              "out": {"kernel": jnp.asarray(wout), "bias": jnp.asarray(bout)}}
    q_in = jnp.asarray(x_q)
    kv_in = q_in if not cross else jnp.asarray(x_kv)
    got = multi_head_attention(params, q_in, kv_in, num_heads=h,
                               compute_dtype=jnp.float32)
    want = _torch_mha(x_q, x_kv, wqkv, bqkv, wout, bout, h)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mha_causal_matches_torch():
    d, h, L = 32, 2, 9
    x = RNG.normal(size=(2, L, d)).astype(np.float32)
    wqkv = (RNG.normal(size=(d, 3 * d)) * 0.05).astype(np.float32)
    bqkv = np.zeros(3 * d, np.float32)
    wout = (RNG.normal(size=(d, d)) * 0.05).astype(np.float32)
    bout = np.zeros(d, np.float32)
    params = {"qkv": {"kernel": jnp.asarray(wqkv), "bias": jnp.asarray(bqkv)},
              "out": {"kernel": jnp.asarray(wout), "bias": jnp.asarray(bout)}}
    x_j = jnp.asarray(x)
    got = multi_head_attention(params, x_j, x_j, num_heads=h,
                               bias=causal_mask(L), compute_dtype=jnp.float32)
    tmask = torch.full((L, L), float("-inf")).triu(1)
    want = _torch_mha(x, x, wqkv, bqkv, wout, bout, h, attn_mask=tmask)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_padding_bias_shape_and_values():
    m = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)
    b = padding_bias(m)
    assert b.shape == (2, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(b[0, 0, 0]), [0, 0, -1e6])


def test_random_masking_semantics():
    """Against the reference formula with injected noise (numpy oracle)."""
    n, L, D = 3, 10, 4
    x = RNG.normal(size=(n, L, D)).astype(np.float32)
    noise = RNG.uniform(size=(n, L)).astype(np.float32)
    mask_ratio = 0.6
    x_m, mask, ids_restore, ids_keep = random_masking(
        jnp.asarray(x), mask_ratio, noise=jnp.asarray(noise), keep_cls=True)

    len_keep = int(L * (1 - mask_ratio))
    noise_ref = noise.copy()
    noise_ref[:, 0] = -1.0
    ids_shuffle = np.argsort(noise_ref, axis=1, kind="stable")
    ids_restore_ref = np.argsort(ids_shuffle, axis=1, kind="stable")
    ids_keep_ref = ids_shuffle[:, :len_keep]
    np.testing.assert_array_equal(np.asarray(ids_keep), ids_keep_ref)
    np.testing.assert_array_equal(np.asarray(ids_restore), ids_restore_ref)
    # CLS always kept, mask has exactly L-len_keep ones per row
    assert (np.asarray(ids_keep) == 0).any(axis=1).all()
    np.testing.assert_array_equal(np.asarray(mask).sum(1),
                                  np.full(n, L - len_keep, np.float32))
    # x_masked gathers kept rows
    np.testing.assert_allclose(
        np.asarray(x_m), np.take_along_axis(x, ids_keep_ref[:, :, None], 1))


def test_random_masking_keep_sep():
    n, L, D = 4, 12, 2
    x = jnp.asarray(RNG.normal(size=(n, L, D)).astype(np.float32))
    sep = jnp.asarray([3, 7, 11, 5])
    _, mask, _, ids_keep = random_masking(x, 0.5, key=jax.random.key(1),
                                          keep_cls=True, keep_sep=True,
                                          sep_pos=sep)
    ik = np.asarray(ids_keep)
    for i, s in enumerate([3, 7, 11, 5]):
        assert s in ik[i], f"sep position {s} dropped in row {i}"
        assert 0 in ik[i]


def test_gumbel_softmax_eval_is_softmax_argmax():
    logits = jnp.asarray(RNG.normal(size=(2, 8, 6)).astype(np.float32))
    y = gumbel_softmax(logits, tau=0.9, hard=True, axis=1, training=False)
    got = np.asarray(y)
    assert ((got == 0) | (got == 1)).all()
    np.testing.assert_array_equal(got.argmax(1),
                                  np.asarray(jax.nn.softmax(logits, 1)).argmax(1))


def test_gumbel_softmax_matches_torch_with_injected_noise():
    logits_np = RNG.normal(size=(2, 5, 7)).astype(np.float32)
    gumbels = RNG.gumbel(size=(2, 5, 7)).astype(np.float32)
    got = gumbel_softmax(jnp.asarray(logits_np), tau=0.9, hard=True, axis=1,
                         training=True, gumbel_noise=jnp.asarray(gumbels))
    # torch oracle: same formula with the same noise
    y_soft = torch.softmax(torch.from_numpy((logits_np + gumbels) / 0.9), 1)
    index = y_soft.max(1, keepdim=True)[1]
    y_hard = torch.zeros_like(y_soft).scatter_(1, index, 1.0)
    np.testing.assert_allclose(np.asarray(got), y_hard.numpy(), atol=1e-6)


def test_group_assign_aggregate_count_normalization():
    B, G, L, D = 2, 4, 16, 8
    logits = jnp.asarray(RNG.normal(size=(B, G, L)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, L, D)).astype(np.float32))
    grouped, hard, soft = group_assign_aggregate(logits, v, tau=0.9,
                                                 training=False)
    hard_np, v_np = np.asarray(hard), np.asarray(v)
    want = np.einsum("bgl,bld->bgd", hard_np, v_np)
    want = want / np.maximum(hard_np.sum(-1, keepdims=True), 1.0)
    np.testing.assert_allclose(np.asarray(grouped), want, atol=1e-5)
    # soft is a distribution over groups per patch
    np.testing.assert_allclose(np.asarray(soft).sum(1), np.ones((B, L)),
                               atol=1e-5)


def test_straight_through_gradient_flows():
    logits = jnp.asarray(RNG.normal(size=(1, 4, 6)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(1, 6, 3)).astype(np.float32))

    def f(lg):
        g, _, _ = group_assign_aggregate(lg, v, tau=0.9, training=False)
        return jnp.sum(g ** 2)

    grad = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_sincos_2d_matches_reference_formula():
    """Numpy oracle transcribed from module_mae.py:63-108."""
    def oracle(embed_dim, grid_size, cls_token):
        def emb_1d(ed, pos):
            omega = np.arange(ed // 2, dtype=np.float64) / (ed / 2.0)
            omega = 1.0 / 10000 ** omega
            out = np.einsum("m,d->md", pos.reshape(-1), omega)
            return np.concatenate([np.sin(out), np.cos(out)], axis=1)
        grid_h = np.arange(grid_size, dtype=np.float32)
        grid_w = np.arange(grid_size, dtype=np.float32)
        grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
        emb = np.concatenate([emb_1d(embed_dim // 2, grid[0]),
                              emb_1d(embed_dim // 2, grid[1])], axis=1)
        if cls_token:
            emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
        return emb
    got = sincos_2d(16, 4, cls_token=True)
    np.testing.assert_allclose(got, oracle(16, 4, True), atol=1e-6)


def test_sinusoid_table_zero_row_and_values():
    t = sinusoid_table(8, 6)
    np.testing.assert_array_equal(t[0], np.zeros(6))
    # position 1, channel 0: sin(1 / 10000^0) = sin(1)
    np.testing.assert_allclose(t[1, 0], np.sin(1.0), atol=1e-6)
    np.testing.assert_allclose(t[1, 1], np.cos(1.0 / 10000 ** (2 / 6)), atol=1e-6)


@pytest.mark.parametrize("method,tmode", [("cubic", "bicubic"),
                                          ("linear", "bilinear")])
def test_resize_matches_torch(method, tmode):
    x = RNG.normal(size=(1, 7, 7, 3)).astype(np.float32)
    got = resize_2d(jnp.asarray(x), 13, 10, method=method)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = TF.interpolate(xt, size=(13, 10), mode=tmode,
                          align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_interp_matrix_rows_sum_to_one():
    for method in ("cubic", "linear"):
        m = interp_matrix(14, 31, method)
        np.testing.assert_allclose(m.sum(1), np.ones(31), atol=1e-6)


def test_interpolate_pos_embed_identity():
    pe = jnp.asarray(RNG.normal(size=(197, 8)).astype(np.float32))
    out = interpolate_pos_embed(pe, 14, 14)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))
    out2 = interpolate_pos_embed(pe, 20, 16)
    assert out2.shape == (20 * 16 + 1, 8)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(pe[0]))
