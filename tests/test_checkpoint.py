"""Orbax train-state roundtrip + auto-resume + GC, and the COCO-Object
trainId table."""
import numpy as np
import jax
import jax.numpy as jnp

from segclip_tpu.config import Config, ModelConfig, OptimConfig
from segclip_tpu.checkpoint.orbax_io import (auto_resume_path,
                                             restore_checkpoint,
                                             save_checkpoint, save_params,
                                             restore_params)
from segclip_tpu.models.segclip import init_segclip
from segclip_tpu.train.step import create_train_state

TINY = ModelConfig(
    image_resolution=16, vision_patch_size=8, vision_width=64,
    vision_layers=2, first_stage_layer=1, group_num=2, cross_layer=1,
    context_length=8, vocab_size=64, transformer_width=64,
    transformer_layers=1, embed_dim=32, max_words=8,
    use_vision_mae_recon=False, use_text_mae_recon=False,
    compute_dtype="float32")


def _state():
    cfg = Config(model=TINY, optim=OptimConfig())
    model, params = init_segclip(TINY, seed=0)
    state, tx, _ = create_train_state(cfg, params, t_total=10, seed=0)
    return state


def test_roundtrip(tmp_path):
    state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path), epoch=3, state=state)
    blank = _state()
    restored, epoch = restore_checkpoint(str(tmp_path / "ckpt_epoch_3"),
                                         blank)
    assert epoch == 3
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_resume_and_gc(tmp_path):
    state = _state()
    for epoch in range(4):
        save_checkpoint(str(tmp_path), epoch, state, max_kept=2)
    assert auto_resume_path(str(tmp_path)).endswith("ckpt_epoch_3")
    import os
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("ckpt"))
    assert kept == ["ckpt_epoch_2", "ckpt_epoch_3"]


def test_params_only_roundtrip(tmp_path):
    state = _state()
    save_params(str(tmp_path), "weights", state.params)
    restored = restore_params(str(tmp_path / "weights"), state.params)
    a = jax.tree.leaves(state.params)[-1]
    b = jax.tree.leaves(restored)[-1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_coco_object_trainid_table():
    from segclip_tpu.cli.prepare_data import coco_object_trainid_table
    t = coco_object_trainid_table()
    assert t[0] == 1            # person
    assert t[11] == 0           # first missing thing id
    assert t[12] == 12          # shifts past the gap
    assert t[89] == 80          # last thing class
    assert t[90] == 0 and t[100] == 0 and t[255] == 0
    assert (t <= 80).all()


def test_keep_best_tracks_peak_across_resume_segments(tmp_path):
    """train.keep_best retains the highest-mIoU checkpoint as ckpt_best and
    persists the running maximum across epochs_per_run resume segments
    (best.json) — the framework-level answer to the measured grounding
    peak-then-regress curves (docs/PERF.md): with a scripted eval sequence
    10 -> 30 -> 20 over three single-epoch segments, ckpt_best must hold
    epoch 1."""
    import json
    import os
    from dataclasses import replace

    from segclip_tpu.config import DataConfig, TrainConfig
    from segclip_tpu.train.loop import train

    tiny = replace(TINY, image_resolution=32, use_seglabel=True)
    scripted = {0: 10.0, 1: 30.0, 2: 20.0}
    seen = []

    def eval_fn(model, params):
        idx = len(seen)
        seen.append(None)
        return scripted[idx]

    cfg = Config(
        model=tiny, optim=OptimConfig(lr=1e-3, lower_lr=1e-3),
        data=DataConfig(datatype="synthetic", batch_size=16, max_words=8),
        train=TrainConfig(epochs=3, epochs_per_run=1, keep_best=True,
                          eval_each_epoch=True, log_every=100,
                          output_dir=str(tmp_path / "run")))
    for seg in range(3):
        train(cfg, resume=seg > 0, eval_fn=eval_fn)

    out = tmp_path / "run"
    assert (out / "ckpt_best").exists()
    best = json.loads((out / "best.json").read_text())
    assert best == {"miou": 30.0, "epoch": 1}
    # the saved payload's own epoch field agrees (restorable evidence the
    # directory holds the epoch-1 state, not merely a label)
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ptc:
        restored = ptc.restore(
            os.path.abspath(out / "ckpt_best"),
            args=ocp.args.PyTreeRestore(
                item={"epoch": np.asarray(0, np.int32)},
                partial_restore=True))
    assert int(restored["epoch"]) == 1
    # epoch checkpoints are untouched by the best tracking (resume still
    # picks the latest epoch, not the best)
    assert auto_resume_path(str(out)).endswith("ckpt_epoch_2")
