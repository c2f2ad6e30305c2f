"""YUV420 image transport (transforms.rgb_to_yuv420 ↔
ops.device_aug.yuv420_to_rgb) and the packed single-buffer batch transfer
(parallel.mesh.PackedSpec)."""
import numpy as np

import jax.numpy as jnp


def _photo_texture(rng, h, w):
    """1/f spectral noise — photographic-statistics test content."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    amp = 1.0 / np.maximum(np.hypot(fy, fx), 1.0 / max(h, w))
    chans = []
    for _ in range(3):
        spec = amp * np.exp(1j * rng.uniform(0, 2 * np.pi, amp.shape))
        tex = np.fft.irfft2(spec, s=(h, w))
        tex = (tex - tex.min()) / max(np.ptp(tex), 1e-9)
        chans.append(tex)
    return (np.stack(chans, -1) * 255).astype(np.uint8)


def test_yuv420_roundtrip_quality():
    """Measured on JPEG-decoded photographic content (the actual pipeline
    input — its chroma was stored 4:2:0 by the encoder): mean |Δ| ≈ 2.4,
    p99 ≈ 9 of 255. The residual is the triangle-upsample→box-resubsample
    mismatch, i.e. mild chroma blur; luma is exact to rounding."""
    import io
    from PIL import Image
    from segclip_tpu.data.transforms import rgb_to_yuv420
    from segclip_tpu.ops.device_aug import yuv420_to_rgb
    rng = np.random.default_rng(0)
    raw = _photo_texture(rng, 224, 224)
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, "JPEG", quality=90)
    img = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    y, cbcr = rgb_to_yuv420(img)
    assert y.shape == (224, 224) and cbcr.shape == (112, 112, 2)
    rec = np.asarray(yuv420_to_rgb(jnp.asarray(y[None]),
                                   jnp.asarray(cbcr[None])))[0]
    delta = np.abs(rec - img.astype(np.float32))
    assert delta.mean() < 4.0, delta.mean()
    assert np.quantile(delta, 0.99) < 15.0

    # grayscale content is (near-)exact: no chroma to lose
    gray = np.repeat(rng.integers(0, 256, (64, 64, 1)), 3,
                     axis=-1).astype(np.uint8)
    y2, c2 = rgb_to_yuv420(gray)
    rec2 = np.asarray(yuv420_to_rgb(jnp.asarray(y2[None]),
                                    jnp.asarray(c2[None])))[0]
    assert np.abs(rec2 - gray.astype(np.float32)).max() <= 2.0


def test_yuv420_ycbcr_native_path_parity():
    """The production yuv420 path (decode→crop→resample all YCbCr-native,
    transforms.random_resized_crop_yuv420) vs the reference-ordered oracle
    (RGB bicubic resize → rgb_to_yuv420): the color matrix is affine and
    bicubic resampling linear, so they agree up to uint8 rounding on luma;
    chroma differs only by resample-at-112 vs resize-224-then-box-2x2,
    inside the existing 4:2:0 loss envelope."""
    import io
    from PIL import Image
    from segclip_tpu.data.pipeline import _decode_jpeg
    from segclip_tpu.data.transforms import (random_resized_crop_coord,
                                             random_resized_crop_yuv420,
                                             rgb_to_yuv420)
    from segclip_tpu.ops.device_aug import yuv420_to_rgb
    rng = np.random.default_rng(3)
    raw = _photo_texture(rng, 240, 300)
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, "JPEG", quality=90)
    jpeg = buf.getvalue()

    # identical rng streams → identical crop windows
    y_f, cbcr_f, coord_f = random_resized_crop_yuv420(
        _decode_jpeg(jpeg, mode="YCbCr"), 224,
        np.random.default_rng(7))
    arr, coord_o = random_resized_crop_coord(
        _decode_jpeg(jpeg), 224, np.random.default_rng(7))
    np.testing.assert_array_equal(coord_f, coord_o)
    y_o, cbcr_o = rgb_to_yuv420(arr)

    dy = np.abs(y_f.astype(np.float32) - y_o.astype(np.float32))
    assert dy.mean() < 1.5, dy.mean()          # luma: rounding-order only
    assert np.quantile(dy, 0.99) <= 4.0

    rec_f = np.asarray(yuv420_to_rgb(jnp.asarray(y_f[None]),
                                     jnp.asarray(cbcr_f[None])))[0]
    rec_o = np.asarray(yuv420_to_rgb(jnp.asarray(y_o[None]),
                                     jnp.asarray(cbcr_o[None])))[0]
    drgb = np.abs(rec_f - rec_o)
    assert drgb.mean() < 3.0, drgb.mean()      # chroma filter mismatch only
    assert np.quantile(drgb, 0.99) < 12.0

    # grayscale JPEG falls back through the convert path, same schema
    gbuf = io.BytesIO()
    Image.fromarray(raw[..., 0]).save(gbuf, "JPEG", quality=90)
    yg, cg, _ = random_resized_crop_yuv420(
        _decode_jpeg(gbuf.getvalue(), mode="YCbCr"), 224,
        np.random.default_rng(7))
    assert yg.shape == (224, 224) and cg.shape == (112, 112, 2)
    assert np.abs(cg.astype(np.int32) - 128).max() <= 1   # no chroma


def test_pipeline_yuv_schema_and_step(tmp_path):
    from segclip_tpu.data.procgen import write_train_corpus
    from segclip_tpu.data.pipeline import PairRecordDataset
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)
    write_train_corpus(str(tmp_path), 2, name="tiny", min_side=64,
                       max_side=96, superpixels=True)
    ds = PairRecordDataset("tiny", str(tmp_path), max_words=12,
                           image_size=32, patch_size=8, use_seg=True,
                           normalize=False, transfer="yuv420")
    s = ds.sample(0, np.random.default_rng(0))
    assert s["image_y"].shape == (32, 32)
    assert s["image_cbcr"].shape == (16, 16, 2)

    tiny = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=2, first_stage_layer=1, group_num=4, cross_layer=1,
        context_length=16, vocab_size=49408, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=12,
        use_vision_mae_recon=False, use_seglabel=True,
        compute_dtype="float32")
    cfg = Config(model=tiny, optim=OptimConfig(lr=1e-3, lower_lr=1e-4))
    model, params = init_segclip(tiny, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=5, seed=0)
    mesh = make_mesh()
    step = make_sharded_train_step(mesh, model, tx, trainable=trainable)
    b = 8
    batch = {k: np.stack([ds.sample(i % 2, np.random.default_rng(i))[k]
                          for i in range(b)])
             for k in s}
    _, metrics = step(state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))


def test_packed_spec_roundtrip_and_step():
    """pack → unpack is bit-exact, and the packed-step path produces the
    SAME metrics as the dict path on identical data."""
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import PackedSpec, make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)
    rng = np.random.default_rng(0)
    b = 8
    ids = np.zeros((b, 12), np.int32)
    ids[:, 0] = 510
    ids[:, 1] = 511
    batch = {
        "input_ids": ids,
        "attention_mask": (ids != 0).astype(np.int32),
        "image": rng.integers(0, 256, (b, 32, 32, 3)).astype(np.uint8),
        "image_seg": rng.integers(0, 3, (b, 4, 4)).astype(np.int32),
    }
    spec = PackedSpec.from_batch(batch)
    buf = spec.pack(batch)
    assert buf.shape == (b, spec.row_bytes)
    unpacked = {k: np.asarray(v) for k, v in spec.unpack(
        jnp.asarray(buf)).items()}
    for k in batch:
        np.testing.assert_array_equal(unpacked[k], batch[k])

    tiny = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=2, first_stage_layer=1, group_num=4, cross_layer=1,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=12,
        use_vision_mae_recon=False, use_seglabel=True,
        compute_dtype="float32")
    cfg = Config(model=tiny, optim=OptimConfig(lr=1e-3, lower_lr=1e-4))
    model, params = init_segclip(tiny, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=5, seed=0)
    mesh = make_mesh()
    step_d = make_sharded_train_step(mesh, model, tx, trainable=trainable)
    _, m_dict = step_d(state, shard_batch(mesh, batch))

    # fresh params: step_d donated state's buffers (shared with `params`)
    model, params2 = init_segclip(tiny, seed=0)
    state2, _, _ = create_train_state(cfg, params2, t_total=5, seed=0)
    step_p = make_sharded_train_step(mesh, model, tx, trainable=trainable,
                                     packed_spec=spec)
    _, m_packed = step_p(state2, shard_batch(mesh, buf))
    assert float(m_dict["loss"]) == float(m_packed["loss"])
