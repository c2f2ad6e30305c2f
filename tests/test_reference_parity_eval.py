"""Zero-shot decode parity: the reference ViTSegInference.encode_decode
(soft-attn upsample → one-hot → group/text affinity → top-5 gate → bg
threshold, vit_seg.py:202-256) vs our _decode_crops, with the same weights
and text bank.

mmseg/mmcv are absent in this image; ViTSegInference only uses
EncoderDecoder as a base class and mmcv.Config as a dict wrapper, so both
are stubbed minimally (matplotlib IS present and left untouched).
Skipped when /root/reference is missing.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


def load_reference_vitseg():
    """Load the reference's ViTSegInference standalone with mmcv/mmseg
    stubbed to the symbols vit_seg.py touches. Shared with
    make_golden_fixtures.py so the fixture pack is generated under the
    exact shims the parity tests assume."""
    if not hasattr(np, "float"):
        np.float = float
    import torch

    def stub(name, **attrs):
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    for name, attrs in [("diffdist", {}),
                        ("diffdist.functional",
                         {"all_gather": lambda *a, **k: None})]:
        stub(name, **attrs)

    class FakeConfig(dict):
        def __getattr__(self, k):
            return self[k]

    stub("mmcv", Config=FakeConfig, imread=None, imwrite=None,
         mkdir_or_exist=lambda *a: None, bgr2rgb=None, rgb2bgr=None)

    class FakeEncoderDecoder(torch.nn.Module):
        align_corners = False

    mmseg = stub("mmseg")
    mmseg.__path__ = []
    stub("mmseg.models", EncoderDecoder=FakeEncoderDecoder)

    sys.path.insert(0, REFERENCE)
    # Load vit_seg.py standalone under a synthetic package — the real
    # seg_segmentation/__init__ chains into mmcv.runner/omegaconf imports.
    import importlib.util
    import logging

    pkg = types.ModuleType("refseg")
    pkg.__path__ = []
    sys.modules["refseg"] = pkg
    evalpkg = types.ModuleType("refseg.evaluation")
    evalpkg.__path__ = []
    sys.modules["refseg.evaluation"] = evalpkg
    logmod = types.ModuleType("refseg.logger")
    logmod.get_logger = lambda *a, **k: logging.getLogger("parity")
    sys.modules["refseg.logger"] = logmod

    spec = importlib.util.spec_from_file_location(
        "refseg.evaluation.vit_seg",
        os.path.join(REFERENCE, "seg_segmentation/evaluation/vit_seg.py"))
    ref_vs = importlib.util.module_from_spec(spec)
    sys.modules["refseg.evaluation.vit_seg"] = ref_vs
    spec.loader.exec_module(ref_vs)

    from modules import module_seg_vit as ref_sv

    def cross_forward(self, q, k):
        q = q.permute(1, 0, 2)
        k = k.permute(1, 0, 2)
        q = q + self.attn(self.ln_x(q), self.ln_k(k), self.ln_k(k),
                          need_weights=False)[0]
        q = q + self.mlp(self.ln_2(q))
        return q.permute(1, 0, 2)

    ref_sv.CrossAttentionBlock.forward = cross_forward
    return ref_vs


@pytest.fixture(scope="module")
def ref_vitseg():
    return load_reference_vitseg()


def test_encode_decode_parity(ref_vitseg):
    import torch
    import jax.numpy as jnp
    from modules.module_clip import CLIP as RefCLIP
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                      merge_params)
    from segclip_tpu.evalseg.inference import ZeroShotSegmenter

    torch.manual_seed(2)
    RES, PATCH = 32, 8
    ref_clip = RefCLIP(embed_dim=32, image_resolution=RES, vision_layers=12,
                       vision_width=64, vision_patch_size=PATCH,
                       context_length=16, vocab_size=512,
                       transformer_width=64, transformer_heads=1,
                       transformer_layers=2, first_stage_layer=3
                       ).float().eval()

    holder = torch.nn.Module()
    holder.clip = ref_clip

    rng = np.random.default_rng(13)
    n_classes = 6
    bank = rng.normal(size=(n_classes, 32)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    seg_ref = ref_vitseg.ViTSegInference(
        holder, torch.from_numpy(bank), with_bg=True,
        test_cfg=dict(mode="whole", bg_thresh=0.8))
    seg_ref.eval()

    img = rng.normal(size=(RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        logits_ref = seg_ref.encode_decode(
            torch.from_numpy(img.transpose(2, 0, 1)[None]), None)[0].numpy()

    cfg = ModelConfig(
        image_resolution=RES, vision_patch_size=PATCH, vision_width=64,
        vision_layers=12, first_stage_layer=3, group_num=8, cross_layer=2,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=16,
        use_vision_mae_recon=False, use_text_mae_recon=False,
        compute_dtype="float32", grouping_impl="jnp")
    model, params = init_segclip(cfg, seed=0)
    sd = {f"clip.{k}": v.detach().numpy()
          for k, v in ref_clip.state_dict().items()}
    params = merge_params(params, convert_state_dict(sd, cfg))

    ours = ZeroShotSegmenter(model, params, jnp.asarray(bank), with_bg=True,
                             bg_thresh=0.8, patch_size=PATCH, crop_size=RES,
                             stride=RES)
    logits_j = ours.slide(img)

    np.testing.assert_allclose(logits_j, logits_ref, atol=2e-4)
    np.testing.assert_array_equal(logits_j.argmax(0), logits_ref.argmax(0))
