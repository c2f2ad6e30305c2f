"""Parameter grouping and freezing policies.

Reproduces the reference's 8-group optimizer partition
(main_task_align.py:175-249) and its three freeze passes (386-441), mapped
onto this framework's flax param paths.

Groups (× decay / no_decay on a 'bias' name match — note the reference's
no_decay list nominally includes 'LayerNorm.*' but those strings never occur
in real torch parameter names, so only 'bias' matches; we reproduce that):
  clip_freeze       lower_lr   pretrained CLIP towers (layers0, text
                               resblocks, embeddings, ln_pre/ln_final,
                               logit_scale, text_projection)
  clip_text_freeze  lower_text_lr  text token/pos embeddings
  clip_train        lr         new/retrained CLIP parts (layers2, layers_mae2,
                               semantic learner, reconstruct, ln_post, proj)
  other             lr         MAE decoders
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax

from segclip_tpu.config import OptimConfig

_CLIP_FREEZE_PREFIXES = (
    "clip/visual/class_embedding",
    "clip/visual/positional_embedding",
    "clip/visual/conv1",
    "clip/visual/ln_pre",
    "clip/logit_scale",
    "clip/ln_final",
    "clip/text_projection",
    "clip/visual/transformer/layers0_",
    "clip/transformer/resblocks_",
)
_CLIP_TEXT_FREEZE_PREFIXES = (
    "clip/positional_embedding",
    "clip/token_embedding",
)


def flat_paths(params: Any) -> List[Tuple[str, Any]]:
    """[(slash/joined/path, leaf)] for a nested param dict."""
    out = []

    def rec(node, prefix):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(node[k], f"{prefix}/{k}" if prefix else k)
        else:
            out.append((prefix, node))

    rec(params, "")
    return out


def group_of(path: str) -> str:
    if path.startswith("clip/"):
        for p in _CLIP_FREEZE_PREFIXES:
            if path.startswith(p):
                return "clip_freeze"
        for p in _CLIP_TEXT_FREEZE_PREFIXES:
            if path.startswith(p):
                return "clip_text_freeze"
        return "clip_train"
    return "other"


def is_no_decay(path: str) -> bool:
    leaf = path.rsplit("/", 1)[-1]
    return "bias" in leaf


def _map_paths(params: Any, fn) -> Any:
    def rec(node, prefix):
        if isinstance(node, dict):
            return {k: rec(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        return fn(prefix)

    return rec(params, "")


def lr_wd_trees(params: Any, cfg: OptimConfig) -> Tuple[Any, Any]:
    """Per-leaf peak LR and weight-decay pytrees."""
    lower_lr = cfg.lower_lr if cfg.lower_lr > 0 else cfg.lr * cfg.coef_lr
    lower_text_lr = cfg.lower_text_lr if cfg.lower_text_lr > 0 else lower_lr
    group_lr = {"clip_freeze": lower_lr, "clip_text_freeze": lower_text_lr,
                "clip_train": cfg.lr, "other": cfg.lr}

    lr_tree = _map_paths(params, lambda p: group_lr[group_of(p)])
    wd_tree = _map_paths(
        params, lambda p: 0.0 if is_no_decay(p) else cfg.weight_decay)
    return lr_tree, wd_tree


# ---------------------------------------------------------------------------
# Freeze passes (requires_grad=False equivalents, main_task_align.py:386-441)
# ---------------------------------------------------------------------------

_ALWAYS_TRAIN = (
    "clip/ln_final", "clip/text_projection", "clip/logit_scale",
    "clip/visual/ln_post", "clip/visual/proj",
    "clip/visual/transformer/semantic_layer2",
    "clip/visual/transformer/layers_mae2_",
    "clip/visual/transformer/reconstruct_layer2",
)


def _layer_index(path: str, marker: str) -> int:
    rest = path.split(marker, 1)[1]
    return int(rest.split("/", 1)[0])


def is_frozen(path: str, cfg: OptimConfig, first_stage_layer: int = 10,
              pretrained_vit: bool = True) -> bool:
    """True if the parameter is excluded from training entirely."""
    if not path.startswith("clip/"):
        return False

    # Pass (c): unconditional freeze of the stock-ViT patchify + pos embed
    # (main_task_align.py:436-441).
    if pretrained_vit and (path.startswith("clip/visual/positional_embedding")
                           or path.startswith("clip/visual/conv1")):
        return True

    # Pass (a): freeze_layer_num gate (386-421). freeze_layer_num == -1
    # disables the pass. Control flow mirrors the reference exactly: named
    # exemptions train; transformer layers train iff their index is at/above
    # the gate; EVERYTHING else under clip (embeddings, conv1, ln_pre, class
    # embedding) is frozen — even at the default freeze_layer_num=0.
    if cfg.freeze_layer_num > -1:
        if any(path.startswith(p) for p in _ALWAYS_TRAIN):
            pass
        elif "transformer/layers0_" in path:
            if _layer_index(path, "layers0_") < cfg.freeze_layer_num:
                return True
        elif "transformer/layers2_" in path:
            if (_layer_index(path, "layers2_")
                    < cfg.freeze_layer_num - first_stage_layer):
                return True
        elif path.startswith("clip/transformer/resblocks_"):
            if _layer_index(path, "resblocks_") < cfg.freeze_layer_num:
                return True
        else:
            return True

    # Pass (b): freeze_text_layer_num (423-434).
    if cfg.freeze_text_layer_num > 0:
        if path.startswith(("clip/positional_embedding",
                            "clip/token_embedding")):
            return True
        if path.startswith("clip/transformer/resblocks_"):
            if _layer_index(path, "resblocks_") < cfg.freeze_text_layer_num:
                return True

    return False


def trainable_tree(params: Any, cfg: OptimConfig,
                   first_stage_layer: int = 10,
                   pretrained_vit: bool = True) -> Any:
    return _map_paths(
        params,
        lambda p: not is_frozen(p, cfg, first_stage_layer, pretrained_vit))


def describe_groups(params: Any, cfg: OptimConfig,
                    first_stage_layer: int = 10) -> Dict[str, int]:
    """Param counts per (group, decay, trainable) — for logging."""
    import numpy as np
    counts: Dict[str, int] = {}
    for path, leaf in flat_paths(params):
        key = (f"{group_of(path)}"
               f"{'/no_decay' if is_no_decay(path) else '/decay'}"
               f"{'/frozen' if is_frozen(path, cfg, first_stage_layer) else ''}")
        counts[key] = counts.get(key, 0) + int(np.prod(leaf.shape))
    return counts
