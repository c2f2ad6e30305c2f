"""Generate the golden-activation fixture pack from the torch reference.

Run (in an environment with /root/reference + torch):

    python tests/make_golden_fixtures.py

Writes tests/fixtures/golden_reference.npz containing a fixed-seed
reference state_dict plus recorded outputs (eval encoders, CLIP logits,
full 4-loss training objective with pinned noise). The committed pack lets
tests/test_golden_replay.py validate numerical parity WITHOUT torch or the
reference repo — and gives any future checkpoint-bearing environment a
ready replay recipe: substitute the released segclip.bin state_dict here
and regenerate (reference output contract: modeling.py:27-75).

Setup shims mirror tests/test_reference_parity_losses.py (diffdist stub,
gloo world-size-1, batch-1-semantics CrossAttentionBlock, pinned
torch.rand/Gumbel).
"""
import logging
import os
import sys
import types
from unittest import mock

import numpy as np

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "golden_reference.npz")

B, CTX, RES, PATCH = 2, 16, 32, 8
GRID = RES // PATCH
N_PATCH = GRID * GRID


def build_reference():
    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29521")
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
    ref_util.logger_initialized["seg"] = logging.getLogger("golden")

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
    return ref


def load_ref_vitseg():
    """The parity tests' exact ViTSegInference shim — shared so fixtures
    are generated under the same stubs the tests assume."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_reference_parity_eval import load_reference_vitseg
    return load_reference_vitseg()


def golden_inputs():
    rng = np.random.default_rng(11)
    img = rng.normal(size=(B, RES, RES, 3)).astype(np.float32)
    ids = np.zeros((B, CTX), np.int64)
    ids[:, 0] = 510
    ids[:, 1:5] = rng.integers(1, 500, size=(B, 4))
    ids[:, 5] = 511
    attn_mask = np.zeros((B, CTX), np.int64)
    attn_mask[:, :6] = 1
    seg = rng.integers(0, 4, size=(B, GRID, GRID)).astype(np.int64)
    noise_txt = rng.uniform(0.1, 1.0, size=(B, CTX)).astype(np.float32)
    noise_txt[:, 0] = -1.0
    noise_txt[:, 5] = -1.0
    noise_vis = rng.uniform(0.1, 1.0,
                            size=(B, N_PATCH + 1)).astype(np.float32)
    noise_vis[:, 0] = -1.0
    return dict(img=img, ids=ids, attn_mask=attn_mask, seg=seg,
                noise_txt=noise_txt, noise_vis=noise_vis)


def main():
    import torch
    ref = build_reference()
    inp = golden_inputs()

    pack = {f"in/{k}": v for k, v in inp.items()}
    for k, v in ref.state_dict().items():
        pack[f"sd/{k}"] = v.detach().numpy()

    # eval-mode encoders + CLIP logits
    ref.eval()
    with torch.no_grad():
        t_img = torch.from_numpy(inp["img"].transpose(0, 3, 1, 2))
        pooled, hidden, mid = ref.clip.encode_image(t_img,
                                                    return_hidden=True)
        text = ref.clip.encode_text(torch.from_numpy(inp["ids"]))
        pn = pooled / pooled.norm(dim=-1, keepdim=True)
        tn = text / text.norm(dim=-1, keepdim=True)
        scale = ref.clip.logit_scale.exp().clamp(max=100.0)
        logits = scale * tn @ pn.t()
    pack["out/vis_pooled"] = pooled.numpy()
    pack["out/vis_hidden"] = hidden.numpy()
    # grouping-stage soft assignments (module_seg_vit.py:446-448);
    # attns[0] is what our encode_image exposes as mid["soft_attn"]
    pack["out/soft_attn"] = mid["attns"][0]["soft_attn"].numpy()
    pack["out/soft_attn_last"] = mid["attns"][-1]["soft_attn"].numpy()
    pack["out/text_pooled"] = text.numpy()
    pack["out/clip_logits"] = logits.numpy()

    # full 4-loss training objective with pinned noise
    noise_by_shape = {(B, CTX): inp["noise_txt"],
                      (B, N_PATCH + 1): inp["noise_vis"]}

    def torch_rand(*shape, **kw):
        return torch.from_numpy(noise_by_shape[tuple(shape)].copy())

    ref.train()
    with mock.patch("torch.rand", side_effect=torch_rand), \
         mock.patch.object(torch.distributions.gumbel.Gumbel, "sample",
                           lambda self, shape: torch.zeros(shape)), \
         torch.no_grad():
        loss = ref(torch.from_numpy(inp["ids"]),
                   torch.zeros(B, CTX, dtype=torch.long),
                   torch.from_numpy(inp["attn_mask"]),
                   torch.from_numpy(inp["img"].transpose(0, 3, 1, 2)
                                    .reshape(B, 1, 3, RES, RES)),
                   image_seg=torch.from_numpy(
                       inp["seg"].reshape(B, 1, GRID, GRID)))
    pack["out/total_loss"] = np.float64(loss)

    # zero-shot decode (ViTSegInference whole-mode: soft-attn upsample,
    # group/text affinity, top-5 gate, bg threshold — vit_seg.py:202-256)
    ref_vs = load_ref_vitseg()
    rng = np.random.default_rng(21)
    n_classes = 6
    bank = rng.normal(size=(n_classes, 32)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    holder = torch.nn.Module()
    holder.clip = ref.clip
    ref.eval()
    seg_ref = ref_vs.ViTSegInference(
        holder, torch.from_numpy(bank), with_bg=True,
        test_cfg=dict(mode="whole", bg_thresh=0.8))
    seg_ref.eval()
    with torch.no_grad():
        decode = seg_ref.encode_decode(
            torch.from_numpy(inp["img"][:1].transpose(0, 3, 1, 2)),
            None)[0].numpy()
    pack["in/text_bank"] = bank
    pack["out/decode_logits"] = decode

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **pack)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB, "
          f"{len(pack)} arrays)")


if __name__ == "__main__":
    main()
