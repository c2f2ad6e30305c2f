"""Convert torch checkpoints (OpenAI CLIP `ViT-B-16.pt`, reference
`segclip.bin`) into this framework's flax param pytree.

This is the parity linchpin (SURVEY.md §7). It reproduces two behaviors of
the reference loader:
  - the resblocks → layers0/layers2 key surgery splitting the 12-layer
    visual transformer at `first_stage_layer` (modeling.py:50-68);
  - hyperparameter inference from checkpoint tensor shapes
    (modeling.py:89-109).

torch (CPU build, baked into the image) is used only for deserialization;
everything downstream is numpy/JAX. Weights absent from the checkpoint
(semantic learner, MAE decoders, layers_mae2 for a raw CLIP checkpoint) keep
their random initialization, mirroring init_preweight's strict=False load
(util_module.py:91-147).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from segclip_tpu.config import ModelConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.bin file → {key: float32 numpy array}."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        out[k] = v.detach().to(torch.float32).numpy()
    return out


def infer_model_config(sd: Mapping[str, np.ndarray],
                       first_stage_layer: int = 10,
                       **overrides) -> ModelConfig:
    """Infer architecture hyperparameters from checkpoint tensor shapes.

    Precedence for the two-stage split point: an already-split SegCLIP
    checkpoint encodes it as the `layers0.*` block count, which WINS over
    the `first_stage_layer` argument (the checkpoint is the ground truth —
    a disagreeing caller value is logged and ignored); `**overrides` (e.g.
    an explicit `first_stage_layer=` keyword) win over both. Pre-surgery
    OpenAI dicts (`resblocks.*`) have no encoded split and use the argument.
    """
    sd = strip_prefix(sd)
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    # Count only tower blocks: a SegCLIP-format dict also contains
    # semantic_layer2.cross_att.* and layers_mae2.* attention weights which
    # must NOT count toward the 12-layer depth.
    tower = re.compile(r"^visual\.transformer\.(resblocks|layers0|layers2)"
                       r"\.\d+\.attn\.in_proj_weight$")
    vision_layers = sum(1 for k in sd if tower.match(k))
    # An already-split SegCLIP checkpoint carries its two-stage split point
    # explicitly as the layers0.* block count (modeling.py:50-68 surgery) —
    # infer it so a non-default split (e.g. a 22/2 ViT-L) loads without
    # manual config. Pre-surgery OpenAI dicts (resblocks.*) keep the arg.
    split = re.compile(r"^visual\.transformer\.layers0"
                       r"\.\d+\.attn\.in_proj_weight$")
    n_layers0 = sum(1 for k in sd if split.match(k))
    if n_layers0:
        if first_stage_layer != 10 and first_stage_layer != n_layers0:
            from segclip_tpu.utils.logging import get_logger
            get_logger().warning(
                "first_stage_layer=%d disagrees with the checkpoint's "
                "layers0 block count (%d); using the checkpoint's split "
                "(pass first_stage_layer via **overrides to force)",
                first_stage_layer, n_layers0)
        first_stage_layer = n_layers0
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    kw = dict(
        image_resolution=vision_patch_size * grid,
        vision_patch_size=vision_patch_size,
        vision_width=vision_width,
        vision_layers=vision_layers,
        first_stage_layer=first_stage_layer,
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
    )
    # SegCLIP-format checkpoints also carry the semantic learner: infer its
    # group count and cross-attention depth so a segclip.bin trained with a
    # non-default grouping bottleneck loads without manual config (the
    # reference hardcodes these in task_config instead).
    sl = "visual.transformer.semantic_layer2"
    if f"{sl}.semantic_center" in sd:
        kw["group_num"] = sd[f"{sl}.semantic_center"].shape[0]
        cross = {k.split(".")[4] for k in sd
                 if k.startswith(f"{sl}.cross_att.")}
        if cross:
            kw["cross_layer"] = len(cross)
    kw.update(overrides)
    return ModelConfig(**kw)


def strip_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop a leading 'clip.' (segclip.bin stores the assembled model) and
    metadata scalars."""
    drop = {"input_resolution", "context_length", "vocab_size"}
    out = {}
    for k, v in sd.items():
        if k in drop:
            continue
        out[k[5:] if k.startswith("clip.") else k] = v
    return out


def apply_layer_surgery(sd: Mapping[str, np.ndarray],
                        first_stage_layer: int) -> Dict[str, np.ndarray]:
    """visual.transformer.resblocks.N → layers0.N (N < split) or
    layers2.(N-split). Keys already in layers0/layers2 form pass through."""
    out = {}
    pat = re.compile(r"^visual\.transformer\.resblocks\.(\d+)\.(.*)$")
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            n, rest = int(m.group(1)), m.group(2)
            if n >= first_stage_layer:
                k = f"visual.transformer.layers2.{n - first_stage_layer}.{rest}"
            else:
                k = f"visual.transformer.layers0.{n}.{rest}"
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# torch-module → flax-param translation rules
# ---------------------------------------------------------------------------

def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _block_entries(dst: str, src: str, sd, out) -> None:
    """ResidualAttentionBlock: ln_1/ln_2 + packed MHA + QuickGELU MLP."""
    _ln(f"{dst}/ln_1", f"{src}.ln_1", sd, out)
    _ln(f"{dst}/ln_2", f"{src}.ln_2", sd, out)
    _mha(f"{dst}/attn", f"{src}.attn", sd, out)
    _dense(f"{dst}/mlp/c_fc", f"{src}.mlp.c_fc", sd, out)
    _dense(f"{dst}/mlp/c_proj", f"{src}.mlp.c_proj", sd, out)


def _ln(dst: str, src: str, sd, out) -> None:
    if f"{src}.weight" in sd:
        _set(out, f"{dst}/scale", sd[f"{src}.weight"])
        _set(out, f"{dst}/bias", sd[f"{src}.bias"])


def _dense(dst: str, src: str, sd, out) -> None:
    if f"{src}.weight" in sd:
        _set(out, f"{dst}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(out, f"{dst}/bias", sd[f"{src}.bias"])


def _mha(dst: str, src: str, sd, out) -> None:
    """torch MultiheadAttention packed in-proj → qkv_kernel/out_kernel."""
    if f"{src}.in_proj_weight" in sd:
        _set(out, f"{dst}/qkv_kernel", sd[f"{src}.in_proj_weight"].T)
        _set(out, f"{dst}/qkv_bias", sd[f"{src}.in_proj_bias"])
        _set(out, f"{dst}/out_kernel", sd[f"{src}.out_proj.weight"].T)
        _set(out, f"{dst}/out_bias", sd[f"{src}.out_proj.bias"])


def _timm_attn(dst: str, src: str, sd, out) -> None:
    """timm Attention (separate qkv/proj Linears) → same packed layout."""
    if f"{src}.qkv.weight" in sd:
        _set(out, f"{dst}/qkv_kernel", sd[f"{src}.qkv.weight"].T)
        _set(out, f"{dst}/qkv_bias", sd[f"{src}.qkv.bias"])
        _set(out, f"{dst}/out_kernel", sd[f"{src}.proj.weight"].T)
        _set(out, f"{dst}/out_bias", sd[f"{src}.proj.bias"])


def _grouped_conv(dst: str, src: str, sd, out, groups: int) -> None:
    """Grouped 1x1 Conv1d weight (D, D/g, 1) → (g, D/g_in, D/g_out)."""
    if f"{src}.weight" in sd:
        w = sd[f"{src}.weight"][..., 0]               # (D, D/g)
        d, dg = w.shape
        kernel = w.reshape(groups, dg, dg).transpose(0, 2, 1)  # (g, in, out)
        _set(out, f"{dst}/kernel", kernel)


def convert_state_dict(sd: Mapping[str, np.ndarray],
                       cfg: ModelConfig) -> dict:
    """torch state dict (any of: raw OpenAI CLIP, surgically-renamed, or
    segclip.bin) → partial flax param tree matching models.segclip.SegCLIP.

    Returns only the keys present in the checkpoint; merge over random init
    with `merge_params`.
    """
    sd = apply_layer_surgery(strip_prefix(sd), cfg.first_stage_layer)
    out: dict = {}

    # ---- CLIP text side ----
    if "token_embedding.weight" in sd:
        _set(out, "clip/token_embedding/embedding", sd["token_embedding.weight"])
    for name in ("positional_embedding", "text_projection", "logit_scale"):
        if name in sd:
            _set(out, f"clip/{name}", sd[name])
    _ln("clip/ln_final", "ln_final", sd, out)
    for i in range(cfg.transformer_layers):
        _block_entries(f"clip/transformer/resblocks_{i}",
                       f"transformer.resblocks.{i}", sd, out)

    # ---- Visual tower ----
    if "visual.conv1.weight" in sd:
        w = sd["visual.conv1.weight"]                 # (width, 3, P, P)
        _set(out, "clip/visual/conv1", w.reshape(w.shape[0], -1).T)
    for name in ("class_embedding", "positional_embedding", "proj"):
        if f"visual.{name}" in sd:
            _set(out, f"clip/visual/{name}", sd[f"visual.{name}"])
    _ln("clip/visual/ln_pre", "visual.ln_pre", sd, out)
    _ln("clip/visual/ln_post", "visual.ln_post", sd, out)

    vt = "clip/visual/transformer"
    for i in range(cfg.first_stage_layer):
        _block_entries(f"{vt}/layers0_{i}",
                       f"visual.transformer.layers0.{i}", sd, out)
    for i in range(cfg.vision_layers - cfg.first_stage_layer):
        _block_entries(f"{vt}/layers2_{i}",
                       f"visual.transformer.layers2.{i}", sd, out)
        _block_entries(f"{vt}/layers_mae2_{i}",
                       f"visual.transformer.layers_mae2.{i}", sd, out)

    # ---- Semantic learner ----
    sl_src = "visual.transformer.semantic_layer2"
    sl = f"{vt}/semantic_layer2"
    if f"{sl_src}.semantic_center" in sd:
        _set(out, f"{sl}/semantic_center", sd[f"{sl_src}.semantic_center"])
    _ln(f"{sl}/norm", f"{sl_src}.norm", sd, out)
    _ln(f"{sl}/cross_ln", f"{sl_src}.cross_ln", sd, out)
    _ln(f"{sl}/k_ln", f"{sl_src}.k_ln", sd, out)
    for i in range(cfg.cross_layer):
        base_src = f"{sl_src}.cross_att.{i}"
        base = f"{sl}/cross_att_{i}"
        _ln(f"{base}/ln_x", f"{base_src}.ln_x", sd, out)
        _ln(f"{base}/ln_k", f"{base_src}.ln_k", sd, out)
        _ln(f"{base}/ln_2", f"{base_src}.ln_2", sd, out)
        _mha(f"{base}/attn", f"{base_src}.attn", sd, out)
        _dense(f"{base}/mlp/c_fc", f"{base_src}.mlp.c_fc", sd, out)
        _dense(f"{base}/mlp/c_proj", f"{base_src}.mlp.c_proj", sd, out)
    _grouped_conv(f"{sl}/k_conv", f"{sl_src}.k_conv", sd, out,
                  cfg.vision_heads)
    _grouped_conv(f"{sl}/v_conv", f"{sl_src}.v_conv", sd, out,
                  cfg.vision_heads)
    _ln(f"{sl}/proj_ln", f"{sl_src}.proj_o.ln", sd, out)
    _dense(f"{sl}/proj_mlp/c_fc", f"{sl_src}.proj_o.mlp.fc1", sd, out)
    _dense(f"{sl}/proj_mlp/c_proj", f"{sl_src}.proj_o.mlp.fc2", sd, out)

    # ---- Reconstruct layer ----
    _dense(f"{vt}/reconstruct_layer2/rec_proj_a",
           "visual.transformer.reconstruct_layer2.rec_proj_a.a_fc", sd, out)

    # ---- MAE decoders (present only in segclip.bin) ----
    _convert_mae_decoder(sd, out, "vis_mae_decoder", timm_blocks=True)
    _convert_mae_decoder(sd, out, "seq_mae_decoder", timm_blocks=False)

    return out


def _convert_mae_decoder(sd, out, prefix: str, timm_blocks: bool) -> None:
    if f"{prefix}.decoder_embed.weight" not in sd:
        return
    _dense(f"{prefix}/core/decoder_embed", f"{prefix}.decoder_embed", sd, out)
    _set(out, f"{prefix}/core/mask_token", sd[f"{prefix}.mask_token"])
    _ln(f"{prefix}/core/decoder_norm", f"{prefix}.decoder_norm", sd, out)
    _dense(f"{prefix}/decoder_pred", f"{prefix}.decoder_pred", sd, out)
    i = 0
    while f"{prefix}.decoder_blocks.{i}.norm1.weight" in sd:
        src = f"{prefix}.decoder_blocks.{i}"
        dst = f"{prefix}/core/blocks_{i}"
        _ln(f"{dst}/norm1", f"{src}.norm1", sd, out)
        _ln(f"{dst}/norm2", f"{src}.norm2", sd, out)
        if timm_blocks:
            _timm_attn(f"{dst}/attn", f"{src}.attn", sd, out)
        else:
            _mha(f"{dst}/attn", f"{src}.attn", sd, out)
        _dense(f"{dst}/mlp/c_fc", f"{src}.mlp.fc1", sd, out)
        _dense(f"{dst}/mlp/c_proj", f"{src}.mlp.fc2", sd, out)
        i += 1


def merge_params(init_params: dict, converted: dict,
                 log_fn=None) -> dict:
    """Overlay converted weights onto a randomly-initialized param tree,
    reporting missing/unexpected keys (init_preweight semantics,
    util_module.py:91-147)."""
    import jax.numpy as jnp

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                yield from flatten(v, p)
            else:
                yield p, v

    init_flat = dict(flatten(init_params))
    conv_flat = dict(flatten(converted))

    missing = sorted(set(init_flat) - set(conv_flat))
    unexpected = sorted(set(conv_flat) - set(init_flat))
    if log_fn:
        if missing:
            log_fn(f"weights not found in checkpoint (kept random): "
                   f"{len(missing)} tensors, e.g. {missing[:5]}")
        if unexpected:
            log_fn(f"checkpoint tensors with no destination: "
                   f"{len(unexpected)}, e.g. {unexpected[:5]}")

    merged = {}
    for k, v in init_flat.items():
        if k in conv_flat:
            src = jnp.asarray(conv_flat[k], dtype=v.dtype)
            if src.shape != v.shape:
                raise ValueError(f"shape mismatch for {k}: "
                                 f"ckpt {src.shape} vs model {v.shape}")
            merged[k] = src
        else:
            merged[k] = v

    def unflatten(flat):
        tree: dict = {}
        for k, v in flat.items():
            _set(tree, k, v)
        return tree

    return unflatten(merged)
