"""Full-model numerical parity against the actual reference implementation.

Runs the reference torch CLIP/SegViT (from /root/reference, CPU, random
init), exports its state_dict, converts it with our torch converter, and
compares our JAX model's outputs tensor-by-tensor. This validates every
layout transpose, the layer surgery, LN/GELU numerics, the grouping eval
path, and EOT pooling end-to-end.

Two environment shims (test-only, documented):
  - diffdist is absent → stubbed (only used inside dist_collect, which a
    single-process eval never calls);
  - the reference CrossAttentionBlock passes batch-first kv into a
    seq-first nn.MultiheadAttention. Old torch's `view(-1, ...)` reshape
    made this accidentally correct at batch size 1 (the zero-shot eval
    regime the released checkpoint is used in); modern torch hard-errors
    (the reference's own __main__ smoke test crashes). We patch the block
    to transpose kv — exactly the batch-1 semantics — before comparing.

Skipped when /root/reference is not present.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def reference_modules():
    for name, attrs in [
            ("diffdist", {}),
            ("diffdist.functional", {"all_gather": lambda *a, **k: None})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, REFERENCE)
    import torch
    from modules import module_seg_vit as ref_sv
    from modules.module_clip import CLIP as RefCLIP

    def cross_forward(self, q, k):
        q = q.permute(1, 0, 2)
        k = k.permute(1, 0, 2)   # batch-first kv → LND (batch-1 semantics)
        q = q + self.attn(self.ln_x(q), self.ln_k(k), self.ln_k(k),
                          need_weights=False)[0]
        q = q + self.mlp(self.ln_2(q))
        return q.permute(1, 0, 2)

    ref_sv.CrossAttentionBlock.forward = cross_forward
    return RefCLIP


# NOTE: the reference SegViT hardcodes 12 total visual blocks
# (module_seg_vit.py:356 — `depths = [first_stage_layer, 12-first_stage]`)
# and ignores VisualTransformer's `layers` argument entirely, so the parity
# config must use vision_layers=12.
TINY_KW = dict(embed_dim=32, image_resolution=32, vision_layers=12,
               vision_width=64, vision_patch_size=8, context_length=16,
               vocab_size=512, transformer_width=64, transformer_heads=1,
               transformer_layers=2, first_stage_layer=3)


@pytest.fixture(scope="module")
def parity_pair(reference_modules):
    """(reference CLIP, our model, our params) with identical weights."""
    import torch
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                      merge_params)

    torch.manual_seed(0)
    ref = reference_modules(**TINY_KW)
    ref = ref.float().eval()

    cfg = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=12, first_stage_layer=3, group_num=8, cross_layer=2,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=16,
        use_vision_mae_recon=False, use_text_mae_recon=False,
        compute_dtype="float32", grouping_impl="jnp")
    model, params = init_segclip(cfg, seed=0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_state_dict(sd, cfg)
    messages = []
    params = merge_params(params, converted, log_fn=messages.append)
    # everything except layers_mae2 + reconstruct (absent from a raw CLIP
    # model) must be covered
    for msg in messages:
        assert "no destination" not in msg, msg
    return ref, model, params, cfg


def test_encode_image_parity(parity_pair):
    import torch
    import jax.numpy as jnp
    ref, model, params, cfg = parity_pair

    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        t_img = torch.from_numpy(img.transpose(0, 3, 1, 2))
        x_ref, hidden_ref, mid_ref = ref.encode_image(t_img,
                                                      return_hidden=True)

    out = model.apply({"params": params}, jnp.asarray(img),
                      method=lambda m, im: m.encode_image(im,
                                                          training=False))

    np.testing.assert_allclose(np.asarray(out.hidden),
                               hidden_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.pooled), x_ref.numpy(),
                               atol=2e-4)
    ref_soft = mid_ref["attns"][0]["soft_attn"].numpy()
    ref_hard = mid_ref["attns"][0]["hard_attn"].numpy()
    np.testing.assert_allclose(np.asarray(out.mid["soft_attn"]), ref_soft,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.mid["hard_attn"]), ref_hard)


def test_encode_text_parity(parity_pair):
    import torch
    import jax.numpy as jnp
    ref, model, params, cfg = parity_pair

    rng = np.random.default_rng(4)
    ids = np.zeros((3, 16), np.int64)
    ids[:, 0] = 510
    for i in range(3):
        n = 4 + i
        ids[i, 1:n] = rng.integers(1, 500, size=n - 1)
        ids[i, n] = 511

    with torch.no_grad():
        x_ref = ref.encode_text(torch.from_numpy(ids))

    out = model.apply({"params": params}, jnp.asarray(ids.astype(np.int32)),
                      method=lambda m, t: m.encode_text(t, training=False))
    np.testing.assert_allclose(np.asarray(out.pooled), x_ref.numpy(),
                               atol=2e-4)


def test_similarity_logits_parity(parity_pair):
    """The CLIP-style eval similarity (normalize + logit_scale)."""
    import torch
    import jax.numpy as jnp
    ref, model, params, cfg = parity_pair

    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = 510
    ids[:, 1:4] = rng.integers(1, 500, size=(2, 3))
    ids[:, 4] = 511

    with torch.no_grad():
        li_ref, lt_ref = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                             torch.from_numpy(ids))

    li, lt = model.apply({"params": params}, jnp.asarray(img),
                         jnp.asarray(ids.astype(np.int32)),
                         method=lambda m, im, t: m.clip(im, t))
    np.testing.assert_allclose(np.asarray(li), li_ref.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lt), lt_ref.numpy(), atol=2e-3)
