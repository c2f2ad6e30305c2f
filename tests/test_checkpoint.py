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
