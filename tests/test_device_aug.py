"""On-device augmentation (ops/device_aug.py + pipeline device_aug mode).

Parity bar: the device bicubic crop-resize must match PIL crop().resize
(the host path / reference rawimage_util.py transform) within 1 uint8
level per pixel — the residual is PIL's 8.22 fixed-point coefficient
quantization, which a float MXU path cannot reproduce bit-for-bit.
"""
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp


def _rand_case(rng, s=224):
    h0, w0 = int(rng.integers(100, s + 1)), int(rng.integers(s, 2 * s + 1))
    img = rng.integers(0, 256, (h0, w0, 3)).astype(np.uint8)
    w = int(rng.integers(40, w0 + 1))
    h = int(rng.integers(40, h0 + 1))
    j = int(rng.integers(0, w0 - w + 1))
    i = int(rng.integers(0, h0 - h + 1))
    return img, (j, i, w, h)


def _pil_crop_resize(img, window, s):
    j, i, w, h = window
    out = Image.fromarray(img).crop((j, i, j + w, i + h)).resize(
        (s, s), Image.BICUBIC)
    return np.asarray(out).astype(np.float32)


def test_crop_resize_matches_pil_within_one_level():
    from segclip_tpu.ops.device_aug import crop_resize_one
    rng = np.random.default_rng(3)
    s = 224
    for _ in range(4):
        img, window = _rand_case(rng, s)
        canvas = np.zeros((s, 2 * s, 3), np.uint8)
        canvas[:img.shape[0], :img.shape[1]] = img
        dev = np.asarray(crop_resize_one(
            jnp.asarray(canvas), jnp.asarray(window, jnp.int32), s))
        pil = _pil_crop_resize(img, window, s)
        assert np.abs(dev - pil).max() <= 1.0


def test_crop_resize_upscale_and_full_window():
    """Upscale path (window smaller than output) and the identity-size
    window both follow PIL."""
    from segclip_tpu.ops.device_aug import crop_resize_one
    rng = np.random.default_rng(4)
    s = 64
    img = rng.integers(0, 256, (s, s, 3)).astype(np.uint8)
    for window in [(10, 12, 30, 25), (0, 0, s, s)]:
        canvas = np.zeros((s, 2 * s, 3), np.uint8)
        canvas[:s, :s] = img
        dev = np.asarray(crop_resize_one(
            jnp.asarray(canvas), jnp.asarray(window, jnp.int32), s))
        pil = _pil_crop_resize(img, window, s)
        assert np.abs(dev - pil).max() <= 1.0


def test_crop_resize_batch_transposed_exact():
    """A tall image shipped transposed (swapped window) must produce the
    SAME output as the untransposed path — separable resampling commutes
    with transposition exactly."""
    from segclip_tpu.ops.device_aug import crop_resize_batch
    rng = np.random.default_rng(5)
    s = 96
    h0, w0 = 180, 90                       # tall
    img = rng.integers(0, 256, (h0, w0, 3)).astype(np.uint8)
    j, i, w, h = 5, 20, 70, 120
    pil = _pil_crop_resize(img, (j, i, w, h), s)

    canvas = np.zeros((1, s, 2 * s, 3), np.uint8)
    canvas[0, :w0, :h0] = img.transpose(1, 0, 2)
    window = np.asarray([[i, j, h, w]], np.int32)   # swapped
    dev = np.asarray(crop_resize_batch(
        jnp.asarray(canvas), jnp.asarray(window),
        jnp.asarray([1], jnp.int32), s))[0]
    assert np.abs(dev - pil).max() <= 1.0


def test_superpixel_patch_reduce_matches_host():
    from segclip_tpu.data.superpixel import crop_seg_from_cache
    from segclip_tpu.ops.device_aug import superpixel_patch_reduce_batch
    rng = np.random.default_rng(6)
    s, patch = 64, 8
    seg = rng.integers(0, 40, (80, 120)).astype(np.int32)
    j, i, w, h = 10, 4, 100, 70
    # host path takes the reference's normalized coords
    coord = np.array([j / (120 - 1), i / (80 - 1),
                      (j + w - 1) / (120 - 1), (i + h - 1) / (80 - 1)],
                     np.float32)
    # derive the integer window exactly as crop_seg_from_cache does
    import math
    xi0, xi1 = int(coord[0] * 120), math.ceil(coord[2] * 120)
    yi0, yi1 = int(coord[1] * 80), math.ceil(coord[3] * 80)
    host = crop_seg_from_cache(seg, coord, img_size=s, patch_size=patch)

    canvas = np.zeros((1, 96, 128), np.int32)
    canvas[0, :80, :120] = seg
    window = np.asarray([[xi0, yi0, xi1 - xi0, yi1 - yi0]], np.int32)
    dev = np.asarray(superpixel_patch_reduce_batch(
        jnp.asarray(canvas), jnp.asarray(window),
        jnp.asarray([0], jnp.int32), s, patch))[0]
    np.testing.assert_array_equal(dev, host)


def test_pipeline_device_aug_schema_and_window_parity(tmp_path):
    """device_aug=True ships (canvas, window, transposed); the window is
    drawn from the SAME rng sequence as the host-resize path, so resizing
    the shipped window on device reproduces the host-path crop within 1
    uint8 level; image_seg is identical between modes."""
    from segclip_tpu.data.procgen import write_train_corpus
    from segclip_tpu.data.pipeline import PairRecordDataset
    from segclip_tpu.ops.device_aug import crop_resize_batch
    # sides ≤ the model resolution (64): the device-aug canvas fits the
    # stored images without the pre-shrink fallback, so both modes draw
    # identical crop windows (packed-at-224 production data likewise fits
    # the 224 canvas)
    write_train_corpus(str(tmp_path), 3, name="tiny", min_side=48,
                       max_side=64, superpixels=True)

    host_ds = PairRecordDataset("tiny", str(tmp_path), image_size=64,
                                patch_size=8, use_seg=True, normalize=False)
    dev_ds = PairRecordDataset("tiny", str(tmp_path), image_size=64,
                               patch_size=8, use_seg=True, normalize=False,
                               device_aug=True)
    for idx in range(3):
        h = host_ds.sample(idx, np.random.default_rng((1, idx)))
        d = dev_ds.sample(idx, np.random.default_rng((1, idx)))
        assert d["image"].shape == (64, 128, 3)
        assert d["image"].dtype == np.uint8
        assert d["image_window"].shape == (4,)
        np.testing.assert_array_equal(h["image_seg"], d["image_seg"])
        np.testing.assert_array_equal(h["input_ids"], d["input_ids"])
        out = np.asarray(crop_resize_batch(
            jnp.asarray(d["image"][None]),
            jnp.asarray(d["image_window"][None]),
            jnp.asarray([d["image_transposed"]], jnp.int32), 64))[0]
        assert np.abs(out - h["image"].astype(np.float32)).max() <= 1.0


def test_train_step_accepts_device_aug_batch():
    """Tiny end-to-end: a device_aug-schema batch through the sharded
    train step produces a finite loss (the crop-resize + normalize run
    inside the jitted step under shard_map)."""
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)
    tiny = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=2, first_stage_layer=1, group_num=4, cross_layer=1,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=12,
        use_vision_mae_recon=False, use_seglabel=True,
        compute_dtype="float32")
    cfg = Config(model=tiny, optim=OptimConfig(lr=1e-3, lower_lr=1e-4))
    model, params = init_segclip(tiny, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=10,
                                              seed=0)
    mesh = make_mesh()
    step = make_sharded_train_step(mesh, model, tx, trainable=trainable)

    rng = np.random.default_rng(0)
    b = 8
    ids = np.zeros((b, 12), np.int32)
    ids[:, 0] = 510
    ids[:, 1] = 511
    batch = shard_batch(mesh, {
        "input_ids": ids,
        "attention_mask": (ids != 0).astype(np.int32),
        "image": rng.integers(0, 256, (b, 32, 64, 3)).astype(np.uint8),
        "image_window": np.tile(np.array([[3, 2, 40, 28]], np.int32),
                                (b, 1)),
        "image_transposed": np.zeros(b, np.uint8),
        "image_seg": rng.integers(0, 3, (b, 4, 4)).astype(np.int32),
    })
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
