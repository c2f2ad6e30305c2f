"""Model-tree tests on a tiny config: shapes, both SegViT paths, loss
structure, and block-level parity against a torch oracle assembled from the
same weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from segclip_tpu.config import ModelConfig
from segclip_tpu.models.layers import ResidualAttentionBlock
from segclip_tpu.models.seg_vit import SegViT
from segclip_tpu.models.segclip import (SegCLIP, info_nce_pair, init_segclip,
                                        superpixel_kl_loss)

TINY = ModelConfig(
    image_resolution=32, vision_patch_size=8, vision_width=64,
    vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
    context_length=16, vocab_size=512, transformer_width=64,
    transformer_layers=2, embed_dim=32, max_words=12,
    use_vision_mae_recon=True, use_text_mae_recon=True, use_seglabel=True,
    mae_decoder_depth=1, mae_decoder_num_heads=2, compute_dtype="float32")

RNG = np.random.default_rng(1)


def _tiny_batch(b=2):
    ids = np.zeros((b, TINY.max_words), np.int32)
    ids[:, 0] = 510
    lengths = RNG.integers(3, TINY.max_words, size=b)
    for i, n in enumerate(lengths):
        ids[i, 1:n - 1] = RNG.integers(1, 500, size=n - 2)
        ids[i, n - 1] = 511
    mask = (ids != 0).astype(np.int32)
    # EOT (511) must be the max id → ensure body tokens < 511
    img = RNG.normal(size=(b, 32, 32, 3)).astype(np.float32)
    seg = RNG.integers(0, 3, size=(b, 4, 4)).astype(np.int32)
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(img),
            jnp.asarray(seg))


import pytest


@pytest.fixture(scope="module")
def tiny_model():
    return init_segclip(TINY, seed=0)


def test_segvit_inference_path_shapes():
    model = SegViT(width=64, layers=4, first_stage_layer=3, group_num=4,
                   cross_layer=1, compute_dtype=jnp.float32)
    x = jnp.asarray(RNG.normal(size=(2, 17, 64)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x, training=False)
    out, mid = model.apply(params, x, training=False)
    assert out.shape == (2, 5, 64)            # CLS + 4 group tokens
    assert mid["hidden"].shape == (2, 16, 64)
    assert mid["hard_attn"].shape == (2, 4, 16)
    assert mid["soft_attn"].shape == (2, 4, 16)
    # hard assignment is one-hot over groups for each patch
    h = np.asarray(mid["hard_attn"])
    np.testing.assert_allclose(h.sum(1), np.ones((2, 16)), atol=1e-6)


def test_segvit_mae_path_shapes():
    model = SegViT(width=64, layers=4, first_stage_layer=3, group_num=4,
                   cross_layer=1, compute_dtype=jnp.float32)
    x = jnp.asarray(RNG.normal(size=(2, 9, 64)).astype(np.float32))  # masked
    params = model.init({"params": jax.random.key(0)}, x, training=False)
    out, mid = model.apply(params, x, mae_path=True, training=True,
                           gumbel_key=jax.random.key(1))
    assert out.shape == (2, 9, 64)            # mean-CLS + 8 reconstructed
    assert mid["hidden"].shape == (2, 8, 64)
    assert mid["hard_attn"] is None
    # CLS is the mean of the reconstructed tokens
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(mid["hidden"]).mean(1), atol=1e-5)


def test_residual_block_matches_torch():
    """Assemble the torch equivalent (MHA + LN + QuickGELU MLP) from our
    params and compare."""
    d, h = 32, 2
    blk = ResidualAttentionBlock(d, h, compute_dtype=jnp.float32)
    x_np = RNG.normal(size=(2, 5, d)).astype(np.float32)
    params = blk.init(jax.random.key(2), jnp.asarray(x_np))["params"]
    got = blk.apply({"params": params}, jnp.asarray(x_np))

    p = jax.tree.map(np.asarray, params)
    xt = torch.from_numpy(x_np)

    def t_ln(x, p_ln):
        return torch.nn.functional.layer_norm(
            x, (d,), torch.from_numpy(p_ln["scale"]),
            torch.from_numpy(p_ln["bias"]))

    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(p["attn"]["qkv_kernel"].T))
        mha.in_proj_bias.copy_(torch.from_numpy(p["attn"]["qkv_bias"]))
        mha.out_proj.weight.copy_(torch.from_numpy(p["attn"]["out_kernel"].T))
        mha.out_proj.bias.copy_(torch.from_numpy(p["attn"]["out_bias"]))

    y = t_ln(xt, p["ln_1"])
    xt = xt + mha(y, y, y, need_weights=False)[0]
    z = t_ln(xt, p["ln_2"])
    z = z @ torch.from_numpy(p["mlp"]["c_fc"]["kernel"]) + \
        torch.from_numpy(p["mlp"]["c_fc"]["bias"])
    z = z * torch.sigmoid(1.702 * z)
    z = z @ torch.from_numpy(p["mlp"]["c_proj"]["kernel"]) + \
        torch.from_numpy(p["mlp"]["c_proj"]["bias"])
    want = (xt + z).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_segclip_losses_finite_and_composed(tiny_model):
    model, params = tiny_model
    ids, mask, img, seg = _tiny_batch()
    losses = model.apply({"params": params}, ids, mask, img, seg,
                         training=True,
                         rngs={"gumbel": jax.random.key(3),
                               "mae": jax.random.key(4)})
    for k in ("sim_loss", "seglabel_loss", "text_mae_loss", "vis_mae_loss",
              "loss"):
        assert k in losses, k
        assert np.isfinite(float(losses[k])), k
    total = sum(float(v) for k, v in losses.items() if k != "loss")
    np.testing.assert_allclose(float(losses["loss"]), total, rtol=1e-6)


def test_segclip_grads_flow_everywhere(tiny_model):
    model, params = tiny_model
    ids, mask, img, seg = _tiny_batch()

    def loss_fn(p):
        out = model.apply({"params": p}, ids, mask, img, seg, training=True,
                          rngs={"gumbel": jax.random.key(3),
                                "mae": jax.random.key(4)})
        return out["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: np.abs(np.asarray(g)).sum(),
                                        grads))
    assert all(np.isfinite(v) for v in flat)
    n_zero = sum(v == 0 for v in flat)
    # Only the unused-path params (layers2 in MAE fwd / layers_mae2 in clean
    # fwd) may be zero — both paths run here, so expect nearly all non-zero.
    assert n_zero < len(flat) * 0.1, f"{n_zero}/{len(flat)} zero grads"


def test_info_nce_identity_alignment():
    """With perfectly aligned features, loss ≈ CE of a sharp diagonal."""
    f = np.eye(4, 8, dtype=np.float32) + 1e-3
    ls = jnp.asarray(np.log(20.0), jnp.float32)
    loss = info_nce_pair(jnp.asarray(f), jnp.asarray(f), ls)
    logits = 20.0 * (f / np.linalg.norm(f, axis=-1, keepdims=True)) @ \
        (f / np.linalg.norm(f, axis=-1, keepdims=True)).T
    want = -np.mean(np.diag(logits - np.log(np.exp(logits).sum(-1,
                                                              keepdims=True))))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_info_nce_class_mask_matches_oracle():
    """model.infonce_mask='class' semantics (docs/PERF.md 'Run N'): batch
    entries whose caption truthfully describes the image (named class in
    the image's scene bitmask) are removed from the softmax denominator,
    except the labeled positive; rows/columns with text_class=0
    (unstructured captions) are untouched."""
    B, E = 6, 8
    rng = np.random.default_rng(11)
    t = rng.normal(size=(B, E)).astype(np.float32)
    v = rng.normal(size=(B, E)).astype(np.float32)
    ls = np.float32(np.log(10.0))
    # captions: rows 0,3 name class 1; row 2 names class 2; rest full
    tc = np.array([1, 0, 2, 1, 0, 0], np.int32)
    # scenes: images 0,1,3 contain class 1; images 2,5 contain class 2
    sc = np.array([0b001, 0b001, 0b010, 0b011, 0b100, 0b010], np.int32)

    got = float(info_nce_pair(jnp.asarray(t), jnp.asarray(v), ls,
                              text_class=jnp.asarray(tc),
                              scene_classes=jnp.asarray(sc)))

    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    lt2v = 10.0 * tn @ vn.T
    lv2t = 10.0 * vn @ tn.T
    fn = np.zeros((B, B), bool)
    for i in range(B):
        for j in range(B):
            if i != j and tc[i] > 0 and (sc[j] >> (tc[i] - 1)) & 1:
                fn[i, j] = True
    # expected false negatives exist in this construction
    assert fn.any()
    lt2v[fn] = -1e9
    lv2t[fn.T] = -1e9          # v2t: column j masked by caption j's class

    def ce(lg):
        lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -np.mean(np.diag(lp))

    want = (ce(lt2v) + ce(lv2t)) / 2.0
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # with no truthful off-diagonal matches, the mask is a no-op
    sc_clean = np.array([0b001, 0b100, 0b010, 0b100, 0b100, 0b100], np.int32)
    tc_clean = np.array([1, 0, 2, 0, 0, 0], np.int32)
    masked = float(info_nce_pair(jnp.asarray(t), jnp.asarray(v), ls,
                                 text_class=jnp.asarray(tc_clean),
                                 scene_classes=jnp.asarray(sc_clean)))
    plain = float(info_nce_pair(jnp.asarray(t), jnp.asarray(v), ls))
    np.testing.assert_allclose(masked, plain, rtol=1e-6)


def test_segclip_infonce_mask_requires_metadata():
    """infonce_mask='class' without pipeline metadata must fail loudly at
    trace time, not silently train the unmasked objective."""
    import dataclasses

    tiny = dataclasses.replace(TINY, infonce_mask="class")
    model, params = init_segclip(tiny, seed=0)
    ids, mask, img, seg = _tiny_batch(2)
    with pytest.raises(ValueError, match="infonce_mask"):
        model.apply({"params": params}, ids, mask, img, seg,
                    training=True,
                    rngs={"gumbel": jax.random.key(0),
                          "mae": jax.random.key(1)})


def test_info_nce_logit_scale_clamped():
    f = RNG.normal(size=(4, 8)).astype(np.float32)
    big = info_nce_pair(jnp.asarray(f), jnp.asarray(f),
                        jnp.asarray(10.0, jnp.float32))     # e^10 ≫ 100
    capped = info_nce_pair(jnp.asarray(f), jnp.asarray(f),
                           jnp.asarray(np.log(100.0), jnp.float32))
    np.testing.assert_allclose(float(big), float(capped), rtol=1e-6)


def test_superpixel_kl_zero_when_consistent():
    """If the assignment is identical for all patches in a superpixel, the
    cluster mean equals each member → symmetric KL is 0."""
    b, g = 1, 4
    seg = jnp.asarray(np.array([[0, 0, 1, 1]]).reshape(1, 2, 2))
    # logits per patch determined entirely by superpixel id
    base = RNG.normal(size=(2, g)).astype(np.float32)
    attn_logits = np.stack([base[0], base[0], base[1], base[1]], axis=0)
    hard = jnp.asarray(attn_logits.T[None])      # (1, G, L)
    loss = superpixel_kl_loss(hard, seg)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_superpixel_kl_positive_when_inconsistent():
    seg = jnp.asarray(np.zeros((1, 2, 2), np.int32))   # all one superpixel
    hard = jnp.asarray(RNG.normal(size=(1, 4, 4)).astype(np.float32))
    assert float(superpixel_kl_loss(hard, seg)) > 0


def test_eval_mode_deterministic(tiny_model):
    model, params = tiny_model
    ids, mask, img, seg = _tiny_batch()
    out1 = model.apply({"params": params}, img,
                       method=lambda m, im: m.encode_image(im, training=False))
    out2 = model.apply({"params": params}, img,
                       method=lambda m, im: m.encode_image(im, training=False))
    np.testing.assert_array_equal(np.asarray(out1.pooled),
                                  np.asarray(out2.pooled))
    assert out1.pooled.shape == (2, TINY.embed_dim)
    assert out1.hidden.shape == (2, 1 + TINY.group_num, TINY.embed_dim)


def test_text_eot_pooling(tiny_model):
    model, params = tiny_model
    ids, mask, img, seg = _tiny_batch()
    out = model.apply({"params": params}, ids,
                      method=lambda m, t: m.encode_text(t, training=False))
    hid = np.asarray(out.hidden)
    eots = np.asarray(ids).argmax(-1)
    for i in range(ids.shape[0]):
        np.testing.assert_array_equal(np.asarray(out.pooled)[i],
                                      hid[i, eots[i]])


def test_eval_mode_losses_need_no_mae_rng(tiny_model):
    """training=False must compute the deterministic losses without the
    'mae'/'gumbel' rng streams (regression: unconditional make_rng)."""
    model, params = tiny_model
    ids, mask, img, seg = _tiny_batch()
    losses = model.apply({"params": params}, ids, mask, img, seg,
                         training=False)
    assert "sim_loss" in losses and "seglabel_loss" in losses
    assert "vis_mae_loss" not in losses and "text_mae_loss" not in losses
    assert np.isfinite(float(losses["loss"]))


def test_config_tuple_override():
    from segclip_tpu.config import Config, apply_overrides
    cfg = apply_overrides(Config(), ["data.crop_scale=(0.6, 1.0)"])
    assert cfg.data.crop_scale == (0.6, 1.0)
    cfg = apply_overrides(Config(), ["data.crop_scale=0.7,0.9"])
    assert cfg.data.crop_scale == (0.7, 0.9)


def test_encode_image_double_resolution_eval(tiny_model):
    """Eval at 2× the training resolution: the learned pos embedding is
    bicubic-interpolated to the larger grid (module_clip_vtransformer.py:
    35-53) and the grouping stage handles the 4× longer patch sequence (the
    reference's 4·patch_len² escape hatch, module_seg_vit.py:423, admits
    448² inputs through the inference path)."""
    model, params = tiny_model
    big = jnp.asarray(RNG.normal(size=(2, 64, 64, 3)).astype(np.float32))
    out = jax.jit(lambda p, im: model.apply(
        {"params": p}, im,
        method=lambda m, i: m.encode_image(i, training=False)))(params, big)
    n_patch = (64 // TINY.vision_patch_size) ** 2
    assert out.pooled.shape == (2, TINY.embed_dim)
    assert out.hidden.shape == (2, 1 + TINY.group_num, TINY.embed_dim)
    assert out.mid["soft_attn"].shape == (2, TINY.group_num, n_patch)
    assert out.mid["hard_attn"].shape == (2, TINY.group_num, n_patch)
    for leaf in (out.pooled, out.hidden, out.mid["soft_attn"]):
        assert np.isfinite(np.asarray(leaf)).all()
    # every patch hard-assigned to exactly one group
    np.testing.assert_allclose(
        np.asarray(out.mid["hard_attn"]).sum(axis=1), 1.0, atol=0)
