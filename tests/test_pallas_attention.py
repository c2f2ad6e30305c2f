"""VMEM attention kernel (ops/pallas/attention.py) vs the XLA sdpa path.

Runs in interpret mode on the CPU mesh; the on-chip A/B timing lives in
docs/PERF.md. Parity bar: forward within bf16 rounding of the XLA path
(identical fp32-softmax math, P·V in the value dtype); gradients within
bf16 tolerance of autodiff through the XLA path (the kernel saves P as
bf16 — exact at f32 inputs whose P fits bf16 rounding).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segclip_tpu.ops.attention import (_split_heads, _merge_heads,
                                       causal_mask, padding_bias, sdpa)
from segclip_tpu.ops.pallas.attention import attention_vmem


def _xla_ref(q, k, v, num_heads, bias):
    return _merge_heads(sdpa(_split_heads(q, num_heads),
                             _split_heads(k, num_heads),
                             _split_heads(v, num_heads), bias=bias))


def _rand_qkv(rng, b, l, h, d, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(b, l, h * d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, l, h * d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, l, h * d)), dtype)
    return q, k, v


@pytest.mark.parametrize("l", [13, 49])          # non-multiple lengths
def test_forward_matches_xla_no_bias(l):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q, k, v = _rand_qkv(rng, b, l, h, d)
    ref = _xla_ref(q, k, v, h, None)
    out = attention_vmem(q, k, v, None, None, d ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_xla_causal():
    rng = np.random.default_rng(1)
    b, l, h, d = 2, 21, 4, 64
    q, k, v = _rand_qkv(rng, b, l, h, d)
    bias = causal_mask(l)
    ref = _xla_ref(q, k, v, h, bias)
    out = attention_vmem(q, k, v, bias, None, d ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_xla_padding_mask():
    rng = np.random.default_rng(2)
    b, l, h, d = 3, 17, 2, 64
    q, k, v = _rand_qkv(rng, b, l, h, d)
    amask = (rng.random((b, l)) > 0.3).astype(np.int32)
    amask[:, 0] = 1
    bias4 = padding_bias(jnp.asarray(amask))
    ref = _xla_ref(q, k, v, h, bias4)
    out = attention_vmem(q, k, v, None, bias4[:, 0, 0, :],
                         d ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla_autodiff():
    rng = np.random.default_rng(3)
    b, l, h, d = 2, 19, 2, 64
    q, k, v = _rand_qkv(rng, b, l, h, d)

    def loss_ref(q, k, v):
        o = _xla_ref(q, k, v, h, None)
        return jnp.sum(o * jnp.cos(o))

    def loss_ker(q, k, v):
        o = attention_vmem(q, k, v, None, None, d ** -0.5, True)
        return jnp.sum(o * jnp.cos(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ker, g_ref):
        # P is saved bf16 → gradients carry ~3 decimal digits
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-2, atol=2e-2)


def test_multi_head_attention_impl_switch():
    """The model-level entry point accepts impl='pallas_vmem' and matches
    the XLA path (self-attention, causal)."""
    from segclip_tpu.ops.attention import multi_head_attention
    rng = np.random.default_rng(4)
    b, l, dm, h = 2, 11, 256, 4
    params = {
        "qkv": {"kernel": jnp.asarray(rng.normal(size=(dm, 3 * dm)) * 0.05,
                                      jnp.float32),
                "bias": jnp.zeros((3 * dm,), jnp.float32)},
        "out": {"kernel": jnp.asarray(rng.normal(size=(dm, dm)) * 0.05,
                                      jnp.float32),
                "bias": jnp.zeros((dm,), jnp.float32)},
    }
    x = jnp.asarray(rng.normal(size=(b, l, dm)), jnp.float32)
    bias = causal_mask(l)
    ref = multi_head_attention(params, x, x, h, bias=bias, impl="xla",
                               compute_dtype=jnp.float32)
    out = multi_head_attention(params, x, x, h, bias=bias,
                               impl="pallas_vmem",
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
