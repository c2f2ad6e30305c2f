"""CLI argument plumbing tests (no device work)."""
from segclip_tpu.cli.train import build_config
import argparse


def _args(**over):
    defaults = dict(
        datatype="synthetic", data_dir="", batch_size=768, epochs=10,
        lr=4e-3, lower_lr=4e-6, warmup_proportion=0.15, weight_decay=0.05,
        max_words=32, clip_arch="ViT-B/16", first_stage_layer=10,
        freeze_layer_num=0,
        freeze_text_layer_num=0, use_seglabel=True,
        use_vision_mae_recon=True, use_text_mae_recon=False,
        init_model=None, resume_model=None, do_resume=False, n_display=50,
        num_workers=0,
        grad_accum_steps=1, profile=None, seed=42, output_dir="out",
        eval_each_epoch=False, eval_data_root=None, opts=[])
    defaults.update(over)
    return argparse.Namespace(**defaults)


def test_build_config_reference_recipe():
    cfg = build_config(_args())
    assert cfg.model.use_seglabel and cfg.model.use_vision_mae_recon
    assert not cfg.model.use_text_mae_recon
    assert cfg.optim.lr == 4e-3 and cfg.optim.lower_lr == 4e-6
    assert cfg.optim.warmup_proportion == 0.15
    assert cfg.data.batch_size == 768 and cfg.data.max_words == 32
    assert cfg.train.epochs == 10


def test_build_config_opts_override():
    cfg = build_config(_args(opts=["model.vision_width=128",
                                   "model.remat=true",
                                   "optim.b2=0.999",
                                   "data.crop_scale=(0.6,1.0)"]))
    assert cfg.model.vision_width == 128
    assert cfg.model.remat is True
    assert cfg.optim.b2 == 0.999
    assert cfg.data.crop_scale == (0.6, 1.0)


def test_clip_arch_presets():
    """CLIP backbone presets (reference pretrained_clip_name surface)."""
    from segclip_tpu.config import CLIP_ARCH_PRESETS, model_config_for
    b32 = model_config_for("ViT-B/32")
    assert b32.vision_patch_size == 32 and b32.grid_size == 7
    assert b32.vision_width == 768 and b32.first_stage_layer == 10
    l14 = model_config_for("ViT-L/14", max_words=32)
    assert l14.vision_width == 1024 and l14.vision_layers == 24
    assert l14.vision_heads == 16 and l14.transformer_heads == 12
    assert l14.first_stage_layer == 22 and l14.embed_dim == 768
    assert l14.grid_size == 16                    # 224 / 14
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model_config_for("RN50")                  # ViT-only surgery
    assert set(CLIP_ARCH_PRESETS) == {"ViT-B/16", "ViT-B/32", "ViT-L/14"}


def test_train_cli_clip_arch_flag():
    from segclip_tpu.cli.train import build_config
    import argparse
    from segclip_tpu.cli import train as train_cli
    ap_args = argparse.Namespace(
        clip_arch="ViT-B/32", use_seglabel=False,
        use_vision_mae_recon=False, use_text_mae_recon=False, max_words=12,
        first_stage_layer=None, lr=1e-3, lower_lr=0.0,
        warmup_proportion=0.1, weight_decay=0.05, freeze_layer_num=0,
        freeze_text_layer_num=0, datatype="synthetic", batch_size=8,
        data_dir="", num_workers=0, epochs=1, seed=0, grad_accum_steps=1,
        n_display=1, output_dir="/tmp/x", resume_model=None,
        eval_each_epoch=False, opts=["model.vision_width=128"])
    cfg = build_config(ap_args)
    assert cfg.model.vision_patch_size == 32      # preset
    assert cfg.model.vision_width == 128          # --opts still override
