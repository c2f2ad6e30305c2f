"""CLI argument plumbing tests (no device work)."""
from segclip_tpu.cli.train import build_config
import argparse


def _args(**over):
    defaults = dict(
        datatype="synthetic", data_dir="", batch_size=768, epochs=10,
        lr=4e-3, lower_lr=4e-6, warmup_proportion=0.15, weight_decay=0.05,
        max_words=32, first_stage_layer=10, freeze_layer_num=0,
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
