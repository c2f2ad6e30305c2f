"""Single dataclass config tree for the whole framework.

Replaces the reference's three-layer config system (argparse flags in
main_task_align.py:25-113, OmegaConf in seg_segmentation/config.py, and mmcv
dataset Configs) with one typed tree + CLI dotlist overrides.

The model self-configuration-from-checkpoint-shapes behavior of the reference
(modeling.py:89-109) lives in checkpoint/torch_convert.py:infer_model_config.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (defaults = CLIP ViT-B/16 SegCLIP)."""
    # Vision tower
    image_resolution: int = 224
    vision_patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    # Two-stage split: `first_stage_layer` blocks over patch tokens, the rest
    # over group tokens (reference modeling.py:52-54,122).
    first_stage_layer: int = 10
    # Semantic grouping bottleneck (reference module_seg_vit.py:348-391)
    group_num: int = 8
    cross_layer: int = 2
    # Text tower
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12
    # Shared embedding space
    embed_dim: int = 512
    # MAE decoders (reference modeling.py:142-165)
    use_vision_mae_recon: bool = True
    use_text_mae_recon: bool = False
    mae_vis_mask_ratio: float = 0.75
    mae_seq_mask_ratio: float = 0.15
    mae_decoder_depth: int = 3
    mae_decoder_num_heads: int = 8
    # Superpixel pseudo-label loss (reference modeling.py:212-224)
    use_seglabel: bool = True
    # Text sequence length used during training (reference max_words)
    max_words: int = 32
    # Gumbel temperature for the hard grouping assignment
    gumbel_tau: float = 0.9
    # FROM-SCRATCH training aid (default 0.0 = the reference objective,
    # which assumes a pretrained-CLIP init): weight of a group-usage
    # balance loss KL(mean assignment ‖ uniform). Without it, from-scratch
    # pretraining collapses every patch into ONE group (a stable optimum
    # of the superpixel-KL + max-pooled InfoNCE with near-identical
    # centers and the resulting peaked softmax killing recovery
    # gradients); gradient flows through the straight-through assignment,
    # so pair it with a raised gumbel_tau (e.g. 3-5) for usable magnitude.
    group_balance_weight: float = 0.0
    # FROM-SCRATCH / structured-corpus aid (default "none" = the reference
    # objective, modeling.py:204-210): "class" masks TRUTHFUL same-class
    # entries out of the InfoNCE denominator. Measured need (docs/PERF.md
    # "Run N"): on the mention-caption corpus a caption naming one class
    # truthfully describes ~29% of batch images; one-label CE then floods
    # the objective with false negatives (mean 27.5/row at B=96,
    # docs/artifacts/mention_stats.json) and grounding is destroyed.
    # Requires per-sample class metadata from the data pipeline
    # (text_class: class named by the caption, 0=unstructured;
    # scene_classes: bitmask of classes present in the image — written by
    # `prepare_data shapes` into <name>_meta.sgr).
    infonce_mask: str = "none"
    # Numerics
    compute_dtype: str = "bfloat16"   # matmul/activation dtype under jit
    param_dtype: str = "float32"      # parameter storage dtype
    # Attention implementation:
    #   "xla"         fused XLA softmax(qk)v (default);
    #   "pallas_vmem" layout-preserving VMEM kernel (ops/pallas/attention):
    #                 no head transposes, score matrix never leaves VMEM in
    #                 the forward; measured A/B in docs/PERF.md.
    # (A STREAMING flash kernel was measured 0.47-0.72x XLA at SegCLIP's
    # sequence lengths in rounds 1-2 and removed — docs/PERF.md.)
    attention_impl: str = "xla"
    # Grouping: "auto" uses the fused Pallas kernel on TPU for the
    # deterministic EVAL path only (training defaults to the jnp path — the
    # kernel's straight-through VJP measured a wash at B=96, docs/PERF.md);
    # "pallas" forces the fused kernel for training too (interpret mode
    # off-TPU); "jnp" forces the reference einsum path everywhere.
    grouping_impl: str = "auto"
    # Rematerialize transformer blocks in the backward pass (trades ~30%
    # FLOPs for activation memory — enables much larger per-chip batches).
    remat: bool = False

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def transformer_heads(self) -> int:
        return self.transformer_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def patch_len(self) -> int:
        return self.grid_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


# The reference's pretrained_clip_name surface (modeling.py:38-41,
# module_clip_util.py:16-25), ViT members only — SegCLIP's two-stage
# resblocks surgery is ViT-specific. first_stage_layer keeps the final two
# blocks for the group stage, matching the 10-of-12 default split.
CLIP_ARCH_PRESETS = {
    "ViT-B/16": {},
    "ViT-B/32": dict(vision_patch_size=32),
    "ViT-L/14": dict(vision_width=1024, vision_layers=24,
                     vision_patch_size=14, first_stage_layer=22,
                     transformer_width=768, embed_dim=768),
}


def model_config_for(arch: str, **overrides) -> "ModelConfig":
    """ModelConfig preset for a CLIP architecture name, with overrides."""
    if arch not in CLIP_ARCH_PRESETS:
        raise KeyError(f"unknown CLIP arch {arch!r}; "
                       f"choose from {sorted(CLIP_ARCH_PRESETS)}")
    return ModelConfig(**{**CLIP_ARCH_PRESETS[arch], **overrides})


@dataclass(frozen=True)
class OptimConfig:
    """AdaptAdamW + schedule + param-group settings.

    Mirrors reference main_task_align.py:175-249 (8 param groups) and
    modules/optimization_adamw.py (fused warmup_cosine schedule, pre-step
    decoupled weight decay).
    """
    lr: float = 4e-3            # new modules (semantic/MAE/recon, new layers)
    lower_lr: float = 4e-6      # pretrained CLIP weights
    # When lower_lr == 0 the pretrained-CLIP LR falls back to lr * coef_lr
    # (reference main_task_align.py:226,460 — "coefficient for bert branch").
    coef_lr: float = 1.0
    lower_text_lr: float = 0.0  # 0 → falls back to lower_lr
    warmup_proportion: float = 0.15
    schedule: str = "warmup_cosine"
    lr_start: float = 0.0       # fraction of peak at step 0
    lr_end: float = 0.0         # fraction of peak at end
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-6
    weight_decay: float = 0.05
    max_grad_norm: float = 1.0
    # Adam moment STORAGE dtype ("bfloat16" halves optimizer HBM footprint
    # and traffic; update math stays fp32). fp32 = reference semantics.
    moment_dtype: str = "float32"
    # Freeze controls (reference main_task_align.py:386-441)
    freeze_layer_num: int = 0
    freeze_text_layer_num: int = 0


@dataclass(frozen=True)
class DataConfig:
    datatype: str = "coco"          # comma-joined: "cc,coco,"
    batch_size: int = 768           # GLOBAL batch
    prefetch: int = 4               # loader prefetch depth (batches)
    # Decode worker processes (torch DataLoader num_workers equivalent);
    # 0 = one background thread, -1 = cpu_count - 1.
    num_workers: int = 0
    # Batches transferred to device ahead of consumption (overlaps host→
    # device copies with decode and device compute).
    device_prefetch: int = 2
    max_words: int = 32
    data_dir: str = ""
    crop_scale: Tuple[float, float] = (0.5, 1.0)
    # (a `fast_decode` cv2-decode knob lived here through round 4 — measured
    # round 5 at 2.1× SLOWER through the shipped path and a no-op on the
    # default yuv420 transport, and removed; see pipeline._decode_jpeg)
    # Image transport to the device: "yuv420" (default) decodes, crops and
    # resamples YCbCr-native — the colorspace the JPEG stored, with 4:2:0
    # chroma already subsampled at encode time — ships Y + 2x2-subsampled
    # CbCr (~half the bytes of RGB) and reconstructs RGB on device
    # (ops/device_aug.yuv420_to_rgb). It is also the fastest HOST path:
    # libjpeg skips its YCbCr→RGB conversion and chroma resamples at
    # (size/2)². Differs from the "rgb" transport only in chroma detail
    # (luma within rounding; quantified in tests/test_yuv_transport.py).
    # "rgb" ships the uint8 RGB crop byte-exact to the reference's
    # host-side transform chain — the parity transport.
    transfer: str = "yuv420"
    # Pack each batch into ONE (B, row_bytes) uint8 buffer for the host→
    # device transfer (bit-exact bitcast round-trip; the tunneled link pays
    # ~50 ms PER ARRAY on top of the wire rate — docs/PERF.md). Applies to
    # the dp train loop; the GSPMD tp path ships fields separately.
    packed_transfer: bool = True
    # Run the bicubic crop-resize on device inside the jitted step
    # (ops/device_aug.py): the host ships the decoded image padded into a
    # fixed (S, 2S) canvas + crop window and keeps only JPEG decode +
    # coordinate sampling + the superpixel patch-reduction. Cuts host CPU
    # ~0.8 ms/sample; costs ~1.5× host→device bytes — the right default
    # depends on the host's core count vs link bandwidth (docs/PERF.md).
    device_aug: bool = False


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 10
    seed: int = 42
    grad_accum_steps: int = 1
    log_every: int = 50
    # Save a checkpoint every N epochs (the final epoch always saves).
    # 1 = the reference's per-epoch cadence (main_task_align.py:258-274);
    # raise it when the serialized state is large relative to disk
    # bandwidth (a ViT-B/16 train state is ~2.3 GB).
    checkpoint_every: int = 1
    # Run at most N epochs in THIS process then return (0 = all remaining).
    # The LR schedule still spans the full `epochs`, so a long run can be
    # split into resume segments (train --do-resume) with identical
    # numerics — the operational answer to hosts where a single process
    # can't survive the whole run (e.g. the tunneled-client host-memory
    # leak quantified in docs/PERF.md).
    epochs_per_run: int = 0
    output_dir: str = "output"
    resume: Optional[str] = None
    # mesh axis sizes; -1 on `data` means "all devices (÷ tp)".
    data_parallelism: int = -1
    # >1 switches the loop to the GSPMD dp×tp step (parallel/gspmd.py):
    # Megatron-sharded attention/MLP kernels over a `model` axis, XLA-
    # inserted collectives. Not needed at ViT-B scale; for larger widths.
    tensor_parallelism: int = 1
    eval_each_epoch: bool = True
    # Retain the highest-mIoU per-epoch checkpoint as <output_dir>/ckpt_best
    # (+ best.json with {epoch, miou}). The reference keeps every epoch and
    # leaves the pick to the user (main_task_align.py:258-274); our own
    # grounding runs showed the final checkpoint can sit several mIoU below
    # the peak (docs/PERF.md "Learning the shapes corpus"), so the framework
    # tracks the peak itself. Needs eval_each_epoch + an eval_fn; the best
    # value persists across epochs_per_run resume segments via best.json,
    # and the save is a multi-host collective gated on the broadcast mIoU
    # (identical decision on every host).
    keep_best: bool = False


@dataclass(frozen=True)
class EvalConfig:
    """In-training zero-shot eval. Per-dataset protocol constants
    (bg_thresh, slide geometry) live in evalseg.datasets.DATASET_SPECS;
    the standalone eval CLI exposes overrides via flags."""
    dataset: str = "voc"
    template_set: str = "simple"
    # >1 batches same-bucket images per device during the per-epoch eval.
    # Measured at 4 on one v5e, trained ckpt, 300-image study: +51% img/s,
    # but 6.3% of pixels argmax-flip under the bf16 vmapped-dot tiling
    # (mIoU +0.30, a wash) — results would depend on the batching factor,
    # so the reproducible sequential path stays default (docs/PERF.md
    # "Zero-shot seg inference"). Invariant under compute_dtype=float32
    # below (flips < 1e-6, measured).
    images_per_device: int = 1
    # Compute dtype for the in-training zero-shot eval encode. None = the
    # training model's compute_dtype (bf16 by default). "float32" is the
    # reference's eval precision (amp_opt_level O0,
    # seg_segmentation/default.yml:2 + main_seg_zeroshot.py:179); it also
    # scopes 'highest' matmul precision over the eval graphs, making
    # predictions invariant to images_per_device batching (flips < 1e-6 —
    # f32 storage alone is NOT enough, the TPU lowers f32 dots to bf16
    # multiplies; docs/PERF.md "Deterministic eval mode").
    compute_dtype: Optional[str] = None


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)


def apply_overrides(cfg: Any, dotlist: list[str]) -> Any:
    """Apply `a.b.c=value` overrides to a (nested, frozen) dataclass tree."""
    for item in dotlist:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} must be key=value")
        path = key.split(".")
        cfg = _set_path(cfg, path, raw)
    return cfg


def _coerce(raw: str, typ: Any) -> Any:
    # With `from __future__ import annotations`, dataclass field types are
    # strings — normalize before comparing.
    name = typ if isinstance(typ, str) else getattr(typ, "__name__",
                                                    str(typ))
    if name == "bool":
        return raw.lower() in ("1", "true", "yes", "on")
    # int/float fields fail FAST on malformed overrides — silently storing
    # the raw string would surface as a confusing TypeError deep in
    # training instead of at the CLI boundary
    if name == "int":
        return int(raw)
    if name == "float":
        return float(raw)
    if name.startswith("Tuple") or name.startswith("tuple"):
        parts = [p for p in raw.strip("()[] ").replace(" ", "").split(",")
                 if p]
        def num(p):
            return int(p) if p.lstrip("-").isdigit() else float(p)
        return tuple(num(p) for p in parts)
    if raw.lower() == "none":
        return None
    return raw


def _set_path(node: Any, path: list[str], raw: str) -> Any:
    name = path[0]
    if not dataclasses.is_dataclass(node):
        raise TypeError(f"cannot descend into non-dataclass at {name}")
    fields = {f.name: f for f in dataclasses.fields(node)}
    if name not in fields:
        raise KeyError(f"unknown config field {name!r} on {type(node).__name__}")
    if len(path) == 1:
        value = _coerce(raw, fields[name].type)
        return dataclasses.replace(node, **{name: value})
    child = _set_path(getattr(node, name), path[1:], raw)
    return dataclasses.replace(node, **{name: child})
