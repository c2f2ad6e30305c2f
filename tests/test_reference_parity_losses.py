"""Training-forward parity: the complete 4-loss SegCLIP objective computed
by the reference (torch, single-process gloo) vs this framework, with every
stochastic source pinned:

  - masking noise: torch.rand / our random_masking patched to shared arrays
    (with the CLS/EOT pins pre-baked so the reference's row-0-only keep_sep
    scatter bug and our per-row intent produce identical masks);
  - Gumbel noise: both samplers patched to zeros (softmax(logits/tau) with
    straight-through hard — identical on both sides);
  - dist: world size 1, functional diffdist stub.

This closes the loop on modeling.py:174-256: InfoNCE with rank labels,
superpixel symmetric-KL, text MAE CE, vision MAE MSE, and their sum.
"""
import logging
import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")

B, CTX, RES, PATCH = 2, 16, 32, 8
GRID = RES // PATCH
N_PATCH = GRID * GRID


@pytest.fixture(scope="module")
def ref_segclip():
    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29519")
    if not hasattr(np, "float"):
        np.float = float
    import torch
    import torch.distributed as dist

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        return sys.modules[name]

    stub("boto3")
    bc = stub("botocore")
    bc.__path__ = []
    stub("botocore.exceptions", ClientError=Exception)
    stub("requests", get=None)
    stub("tqdm", tqdm=lambda x, **k: x)
    func = stub("diffdist.functional")

    def all_gather(gather_list, tensor, *a, **k):
        return [tensor if i == dist.get_rank() else g
                for i, g in enumerate(gather_list)]
    func.all_gather = all_gather
    d = stub("diffdist")
    d.functional = func
    sys.path.insert(0, REFERENCE)

    if not dist.is_initialized():
        dist.init_process_group("gloo", rank=0, world_size=1)

    import util as ref_util
    ref_util.logger_initialized["seg"] = logging.getLogger("parity")

    from modules import module_seg_vit as ref_sv

    def cross_forward(self, q, k):
        q = q.permute(1, 0, 2)
        k = k.permute(1, 0, 2)
        q = q + self.attn(self.ln_x(q), self.ln_k(k), self.ln_k(k),
                          need_weights=False)[0]
        q = q + self.mlp(self.ln_2(q))
        return q.permute(1, 0, 2)

    ref_sv.CrossAttentionBlock.forward = cross_forward

    from modules.module_clip import CLIP as RefCLIP
    from modules.modeling import SegCLIP as RefSegCLIP

    torch.manual_seed(1)
    base = RefCLIP(embed_dim=32, image_resolution=RES, vision_layers=12,
                   vision_width=64, vision_patch_size=PATCH,
                   context_length=CTX, vocab_size=512, transformer_width=64,
                   transformer_heads=1, transformer_layers=2,
                   first_stage_layer=3).float()
    task = types.SimpleNamespace(
        first_stage_layer=3, pretrained_clip_name="ViT-B/16", rank=0,
        local_rank=0, world_size=1, max_words=CTX, use_vision_mae_recon=True,
        use_text_mae_recon=True, use_seglabel=True, mae_vis_mask_ratio=0.75,
        mae_seq_mask_ratio=0.25)
    ref = RefSegCLIP(base.state_dict(), task).float()
    ref.clip.load_state_dict(base.state_dict())
    ref.train()
    return ref


def test_full_training_loss_parity(ref_segclip):
    import torch
    import jax
    import jax.numpy as jnp
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                      merge_params)
    import segclip_tpu.models.clip as our_clip
    from segclip_tpu.ops import masking as our_masking

    ref = ref_segclip
    cfg = ModelConfig(
        image_resolution=RES, vision_patch_size=PATCH, vision_width=64,
        vision_layers=12, first_stage_layer=3, group_num=8, cross_layer=2,
        context_length=CTX, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=CTX,
        use_vision_mae_recon=True, use_text_mae_recon=True,
        mae_vis_mask_ratio=0.75, mae_seq_mask_ratio=0.25,
        mae_decoder_depth=3, mae_decoder_num_heads=8,
        compute_dtype="float32", grouping_impl="jnp")
    model, params = init_segclip(cfg, seed=0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = merge_params(params, convert_state_dict(sd, cfg))

    rng = np.random.default_rng(11)
    img = rng.normal(size=(B, RES, RES, 3)).astype(np.float32)
    ids = np.zeros((B, CTX), np.int64)
    ids[:, 0] = 510
    ids[:, 1:5] = rng.integers(1, 500, size=(B, 4))
    ids[:, 5] = 511
    attn_mask = np.zeros((B, CTX), np.int64)
    attn_mask[:, :6] = 1
    seg = rng.integers(0, 4, size=(B, GRID, GRID)).astype(np.int64)

    # Shared masking noise with CLS/EOT pins PRE-BAKED so the reference's
    # row-0-only keep_sep scatter and our per-row pin coincide.
    noise_txt = rng.uniform(0.1, 1.0, size=(B, CTX)).astype(np.float32)
    noise_txt[:, 0] = -1.0
    noise_txt[:, 5] = -1.0          # every row's EOT position
    noise_vis = rng.uniform(0.1, 1.0, size=(B, N_PATCH + 1)).astype(np.float32)
    noise_vis[:, 0] = -1.0

    noise_by_shape = {(B, CTX): noise_txt, (B, N_PATCH + 1): noise_vis}

    def torch_rand(*shape, **kw):
        return torch.from_numpy(noise_by_shape[tuple(shape)].copy())

    with mock.patch("torch.rand", side_effect=torch_rand), \
         mock.patch.object(torch.distributions.gumbel.Gumbel, "sample",
                           lambda self, shape: torch.zeros(shape)), \
         torch.no_grad():
        loss_ref = ref(torch.from_numpy(ids),
                       torch.zeros(B, CTX, dtype=torch.long),
                       torch.from_numpy(attn_mask),
                       torch.from_numpy(img.transpose(0, 3, 1, 2)
                                        .reshape(B, 1, 3, RES, RES)),
                       image_seg=torch.from_numpy(seg.reshape(B, 1, GRID,
                                                              GRID)))

    orig_masking = our_masking.random_masking

    def patched_masking(x, ratio, key=None, **kw):
        noise = noise_by_shape[(x.shape[0], x.shape[1])]
        kw.pop("noise", None)
        return orig_masking(x, ratio, noise=jnp.asarray(noise), **kw)

    def zero_gumbel(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    with mock.patch.object(our_clip, "random_masking", patched_masking), \
         mock.patch("jax.random.gumbel", zero_gumbel):
        losses = model.apply(
            {"params": params}, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(attn_mask.astype(np.int32)), jnp.asarray(img),
            jnp.asarray(seg.astype(np.int32)), training=True,
            rngs={"gumbel": jax.random.key(0), "mae": jax.random.key(1)})

    np.testing.assert_allclose(float(losses["loss"]), float(loss_ref),
                               rtol=2e-4)
