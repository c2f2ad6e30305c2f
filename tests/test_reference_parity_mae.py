"""Reference parity for the MAE branch: masked vision forward (reconstruct
path through layers_mae2) and both MAE decoder losses.

Determinism: eval-mode MAE forwards have no Gumbel noise; the only
randomness is the masking noise, which we pin by patching torch.rand (ref)
and our random_masking (injected noise) to the same array.

Skipped when /root/reference is not present.
"""
import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")

KW = dict(embed_dim=32, image_resolution=32, vision_layers=12,
          vision_width=64, vision_patch_size=8, context_length=16,
          vocab_size=512, transformer_width=64, transformer_heads=1,
          transformer_layers=2, first_stage_layer=3)


@pytest.fixture(scope="module")
def ref_env():
    for name, attrs in [
            ("diffdist", {}),
            ("diffdist.functional", {"all_gather": lambda *a, **k: None})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, REFERENCE)
    # the reference uses np.float (module_mae.py:97), removed in modern numpy
    if not hasattr(np, "float"):
        np.float = float
    import torch
    from modules import module_seg_vit as ref_sv
    from modules.module_clip import CLIP as RefCLIP
    from modules.module_mae import MAEDecoder as RefMAEDecoder

    def cross_forward(self, q, k):
        q = q.permute(1, 0, 2)
        k = k.permute(1, 0, 2)
        q = q + self.attn(self.ln_x(q), self.ln_k(k), self.ln_k(k),
                          need_weights=False)[0]
        q = q + self.mlp(self.ln_2(q))
        return q.permute(1, 0, 2)

    ref_sv.CrossAttentionBlock.forward = cross_forward
    return RefCLIP, RefMAEDecoder


@pytest.fixture(scope="module")
def pair(ref_env):
    import torch
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                      merge_params)
    RefCLIP, RefMAEDecoder = ref_env

    torch.manual_seed(1)
    ref = RefCLIP(**KW).float().eval()
    # reference-style MAE decoders (modeling.py:144-165 construction)
    from functools import partial
    import torch.nn as tnn
    vis_dec = RefMAEDecoder(64, 32, 32, 8, decoder_depth=3,
                            decoder_num_heads=2, mlp_ratio=4.,
                            norm_layer=partial(tnn.LayerNorm, eps=1e-6)
                            ).float().eval()
    seq_dec = RefMAEDecoder(32, 16, 32, 8, decoder_depth=3,
                            decoder_num_heads=2, mlp_ratio=4.,
                            choice_seq=True, pred_len=512, seq_len=16
                            ).float().eval()

    cfg = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=12, first_stage_layer=3, group_num=8, cross_layer=2,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=16,
        use_vision_mae_recon=True, use_text_mae_recon=True,
        mae_decoder_depth=3, mae_decoder_num_heads=2,
        compute_dtype="float32", grouping_impl="jnp")
    model, params = init_segclip(cfg, seed=0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd.update({f"vis_mae_decoder.{k}": v.detach().numpy()
               for k, v in vis_dec.state_dict().items()})
    sd.update({f"seq_mae_decoder.{k}": v.detach().numpy()
               for k, v in seq_dec.state_dict().items()})
    params = merge_params(params, convert_state_dict(sd, cfg))
    return ref, vis_dec, seq_dec, model, params, cfg


def test_masked_vision_forward_parity(pair):
    """encode_image(mask_ratio=0.75) eval: reconstruct path + layers_mae2."""
    import torch
    import jax.numpy as jnp
    import segclip_tpu.models.clip as our_clip
    from segclip_tpu.ops import masking as our_masking
    ref, _, _, model, params, cfg = pair

    rng = np.random.default_rng(7)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    noise = rng.uniform(size=(2, 17)).astype(np.float32)

    with mock.patch("torch.rand",
                    side_effect=lambda *s, **k: torch.from_numpy(noise)):
        with torch.no_grad():
            x_ref, hid_ref, mask_ref, restore_ref, mid_ref = ref.encode_image(
                torch.from_numpy(img.transpose(0, 3, 1, 2)),
                return_hidden=True, mask_ratio=0.75)

    orig = our_masking.random_masking
    patched = (lambda x, r, key=None, **kw:
               orig(x, r, noise=jnp.asarray(noise),
                    **{k: v for k, v in kw.items() if k != "noise"}))
    with mock.patch.object(our_clip, "random_masking", patched):
        out = model.apply(
            {"params": params}, jnp.asarray(img),
            method=lambda m, im: m.encode_image(im, mask_ratio=0.75,
                                                training=False))

    np.testing.assert_array_equal(np.asarray(out.mae_mask),
                                  mask_ref.numpy())
    np.testing.assert_array_equal(np.asarray(out.ids_restore),
                                  restore_ref.numpy())
    # reconstructed patch features after layers_mae2 (pre ln_post)
    np.testing.assert_allclose(np.asarray(out.mid["hidden"]),
                               mid_ref["hidden"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.hidden), hid_ref.numpy(),
                               atol=2e-4)


def test_vis_mae_decoder_loss_parity(pair):
    import torch
    import jax.numpy as jnp
    ref, vis_dec, _, model, params, cfg = pair

    rng = np.random.default_rng(8)
    b, keep, total = 2, 5, 17             # 16 patches + cls
    image = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    hidden = rng.normal(size=(b, keep, 64)).astype(np.float32)
    perm = np.stack([rng.permutation(total) for _ in range(b)])
    ids_restore = np.argsort(perm, axis=1)
    mask = np.ones((b, total), np.float32)
    np.put_along_axis(mask, perm[:, :keep], 0.0, axis=1)

    with torch.no_grad():
        loss_ref = vis_dec.forward_vis(
            torch.from_numpy(image.transpose(0, 3, 1, 2)),
            torch.from_numpy(hidden), torch.from_numpy(mask),
            torch.from_numpy(ids_restore), loss_allpatch=False)

    loss = model.apply(
        {"params": params}, jnp.asarray(image), jnp.asarray(hidden),
        jnp.asarray(mask), jnp.asarray(ids_restore),
        method=lambda m, *a: m.vis_mae_decoder(*a))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_seq_mae_decoder_loss_parity(pair):
    import torch
    import jax.numpy as jnp
    ref, _, seq_dec, model, params, cfg = pair

    rng = np.random.default_rng(9)
    b, keep, total = 2, 13, 16
    ids = rng.integers(1, 500, size=(b, total)).astype(np.int64)
    hidden = rng.normal(size=(b, keep, 32)).astype(np.float32)
    perm = np.stack([rng.permutation(total) for _ in range(b)])
    ids_restore = np.argsort(perm, axis=1)
    mae_mask = np.ones((b, total), np.float32)
    np.put_along_axis(mae_mask, perm[:, :keep], 0.0, axis=1)
    attention_mask = np.ones((b, total), np.float32)
    attention_mask[:, -3:] = 0.0
    recon = (mae_mask + attention_mask) > 1

    with torch.no_grad():
        loss_ref = seq_dec.forward_seq(
            torch.from_numpy(ids), torch.from_numpy(hidden),
            torch.from_numpy(recon), torch.from_numpy(ids_restore),
            torch.from_numpy(attention_mask))

    loss = model.apply(
        {"params": params}, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(hidden), jnp.asarray(recon),
        jnp.asarray(ids_restore.astype(np.int32)),
        jnp.asarray(attention_mask),
        method=lambda m, *a: m.seq_mae_decoder(*a))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
