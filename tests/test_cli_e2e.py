"""End-to-end CLI tests on the simulated 8-device CPU mesh: train for a
real (tiny) epoch through main(), zero-shot eval on a temp-dir 3-image VOC
layout, and the demo's dataset mode (reference entry points
main_task_align.py / main_seg_zeroshot.py / main_seg_vis.py)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

TINY_OPTS = [
    "model.vision_width=64", "model.vision_layers=4",
    "model.first_stage_layer=3", "model.group_num=4", "model.cross_layer=1",
    "model.transformer_width=64", "model.transformer_layers=2",
    "model.embed_dim=32", "model.mae_decoder_depth=1",
    "model.mae_decoder_num_heads=2", "model.compute_dtype=float32",
]
TINY_EVAL_OPTS = [o.split("model.", 1)[1] for o in TINY_OPTS]

RNG = np.random.default_rng(23)


def test_train_cli_end_to_end(tmp_path):
    from segclip_tpu.cli.train import main
    out = tmp_path / "run"
    main(["--datatype", "synthetic", "--batch-size", "256", "--epochs", "1",
          "--max-words", "12", "--n-display", "1",
          "--output-dir", str(out), "--opts"] + TINY_OPTS +
         ["train.eval_each_epoch=false"])
    assert (out / "log.txt").exists()
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").open()]
    assert len(metrics) == 2                      # 512 synthetic / 256 = 2
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert (out / "ckpt_epoch_0").exists()


def test_train_cli_preset_shapes_learnability(tmp_path):
    """`--preset shapes-learnability` (the documented grounding recipe,
    docs/PERF.md "Learning the shapes corpus") expands to the measured
    run-8 hyperparameters — flat lr 4e-4, 10% warmup, gumbel_tau 3.0,
    group_balance 1.0, keep_best, per-epoch eval on <data-dir>/eval —
    while EXPLICIT flags and --opts still win, and trains end-to-end on
    a fresh tiny corpus."""
    import ast

    from segclip_tpu.cli import prepare_data
    from segclip_tpu.cli.train import main

    data = tmp_path / "shapes"
    prepare_data.main(["shapes", "--out-dir", str(data), "--train-n", "16",
                       "--eval-n", "2"])
    out = tmp_path / "run"
    main(["--preset", "shapes-learnability", "--data-dir", str(data),
          "--output-dir", str(out),
          # explicit flags must override the preset's 96/4
          "--batch-size", "8", "--epochs", "1",
          "--opts"] + TINY_OPTS + ["eval.images_per_device=2"])

    cfg_line = next(l for l in (out / "log.txt").read_text().splitlines()
                    if "config: " in l)
    cfg = ast.literal_eval(cfg_line.split("config: ", 1)[1])
    # preset values landed
    assert cfg["optim"]["lr"] == cfg["optim"]["lower_lr"] == 4e-4
    assert cfg["optim"]["warmup_proportion"] == 0.1
    assert cfg["model"]["gumbel_tau"] == 3.0
    assert cfg["model"]["group_balance_weight"] == 1.0
    assert cfg["model"]["use_seglabel"] and cfg["model"]["use_vision_mae_recon"]
    assert cfg["train"]["keep_best"] and cfg["train"]["eval_each_epoch"]
    assert cfg["eval"]["dataset"] == "shapes"
    # explicit flags and user --opts won over the preset
    assert cfg["data"]["batch_size"] == 8 and cfg["train"]["epochs"] == 1
    assert cfg["eval"]["images_per_device"] == 2
    # trained + evaluated + kept best through the expanded recipe
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").open()]
    assert all(np.isfinite(m["loss"]) for m in metrics if "loss" in m)
    assert (out / "ckpt_best").exists() and (out / "best.json").exists()


def _make_voc(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    names = []
    for i in range(3):
        name = f"img{i}"
        h, w = 230 + 9 * i, 300
        arr = RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        label = RNG.integers(0, 21, (h, w)).astype(np.uint8)
        label[:4] = 255                            # some ignore pixels
        Image.fromarray(label).save(root / "SegmentationClass" / f"{name}.png")
        names.append(name)
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names) + "\n")
    return root


def test_eval_zeroshot_cli_end_to_end(tmp_path, capsys):
    from segclip_tpu.cli.eval_zeroshot import main
    root = _make_voc(tmp_path)
    results = main(["--dataset", "voc", "--data-root", str(root),
                    "--output-dir", str(tmp_path / "out"),
                    "--opts"] + TINY_EVAL_OPTS)
    assert 0.0 <= results["mIoU"] <= 100.0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["dataset"] == "voc"


def test_eval_zeroshot_cli_deterministic_mode(tmp_path, capsys):
    """--compute-dtype float32 (the reference's amp-O0 eval precision +
    'highest' matmul scope) through main(): the flag must reach the model
    config (visible in the config.json snapshot) and the batched path must
    produce valid metrics (docs/PERF.md 'Deterministic eval mode')."""
    from segclip_tpu.cli.eval_zeroshot import main
    root = _make_voc(tmp_path)
    out = tmp_path / "out"
    results = main(["--dataset", "voc", "--data-root", str(root),
                    "--compute-dtype", "float32",
                    "--images-per-device", "2",
                    "--output-dir", str(out),
                    "--opts"] + TINY_EVAL_OPTS)
    assert 0.0 <= results["mIoU"] <= 100.0
    snap = json.loads((out / "config.json").read_text())
    assert snap["model"]["compute_dtype"] == "float32"
    assert snap["images_per_device"] == 2
    capsys.readouterr()


def test_demo_cli_dataset_mode(tmp_path):
    from segclip_tpu.cli.demo import main
    root = _make_voc(tmp_path)
    out = tmp_path / "vis"
    main(["--dataset", "voc", "--data-root", str(root), "--first-n", "2",
          "--vis", "input_pred", "final_group",
          "--output-dir", str(out), "--opts"] + TINY_EVAL_OPTS)
    for mode in ("input_pred", "final_group"):
        files = sorted(os.listdir(out / mode))
        assert files == ["img0.jpg", "img1.jpg"], files


def test_demo_cli_requires_exactly_one_input(tmp_path):
    from segclip_tpu.cli.demo import main
    with pytest.raises(SystemExit):
        main(["--output-dir", str(tmp_path)])
