"""Zero-shot segmentation stack tests: mIoU oracle, slide-window geometry,
text bank, and end-to-end segmenter on a tiny random model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segclip_tpu.config import ModelConfig
from segclip_tpu.models.segclip import init_segclip
from segclip_tpu.evalseg.miou import MIoUMeter
from segclip_tpu.evalseg.inference import ZeroShotSegmenter
from segclip_tpu.evalseg.text_bank import build_text_bank
from segclip_tpu.evalseg.datasets import (DATASET_SPECS, keep_ratio_resize,
                                          normalize_pixels, voc_colormap)

RNG = np.random.default_rng(11)

TINY = ModelConfig(
    image_resolution=32, vision_patch_size=8, vision_width=64,
    vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
    context_length=16, vocab_size=49408, transformer_width=64,
    transformer_layers=2, embed_dim=32, max_words=12,
    use_vision_mae_recon=False, use_text_mae_recon=False,
    compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny():
    model, params = init_segclip(TINY, seed=0)
    bank = jnp.asarray(RNG.normal(size=(6, TINY.embed_dim)).astype(np.float32))
    bank = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    seg = ZeroShotSegmenter(model, params, bank, with_bg=True, bg_thresh=0.8,
                            patch_size=8, crop_size=32, stride=32)
    return model, params, bank, seg


def test_miou_perfect_prediction():
    m = MIoUMeter(3)
    label = RNG.integers(0, 3, size=(10, 10))
    m.update(label, label)
    r = m.results()
    np.testing.assert_allclose(r["mIoU"], 100.0)
    np.testing.assert_allclose(r["aAcc"], 100.0)


def test_miou_known_values():
    m = MIoUMeter(2)
    label = np.array([[0, 0, 1, 1]])
    pred = np.array([[0, 1, 1, 1]])
    m.update(pred, label)
    # class0: inter 1, union 2 → 0.5 ; class1: inter 2, union 3 → 2/3
    r = m.results()
    np.testing.assert_allclose(r["IoU"], [50.0, 100 * 2 / 3], rtol=1e-6)
    np.testing.assert_allclose(r["mIoU"], 100 * (0.5 + 2 / 3) / 2, rtol=1e-6)


def test_miou_ignore_index():
    m = MIoUMeter(2, ignore_index=255)
    label = np.array([[0, 255, 1, 255]])
    pred = np.array([[1, 1, 1, 0]])
    m.update(pred, label)
    r = m.results()
    # only positions 0 and 2 scored: class0 inter 0/union 1; class1 1/2
    np.testing.assert_allclose(r["IoU"], [0.0, 50.0], rtol=1e-6)


def test_miou_absent_class_is_nan_excluded():
    m = MIoUMeter(3)
    label = np.array([[0, 0, 1, 1]])
    m.update(label, label)
    r = m.results()
    np.testing.assert_allclose(r["mIoU"], 100.0)   # class 2 excluded


def test_slide_windows_edge_alignment(tiny):
    _, _, _, seg = tiny
    wins = seg._windows(32, 80)
    assert wins == [(0, 0, 32, 32), (0, 32, 32, 64), (0, 48, 32, 80)]
    wins = seg._windows(32, 32)
    assert wins == [(0, 0, 32, 32)]


def test_segmenter_slide_end_to_end(tiny):
    _, _, _, seg = tiny
    img = RNG.normal(size=(32, 80, 3)).astype(np.float32)
    logits = seg.slide(img)
    assert logits.shape == (7, 32, 80)          # 6 classes + bg
    assert np.isfinite(logits).all()
    pred = seg.predict(img, orig_shape=(64, 160))
    assert pred.shape == (64, 160)
    assert pred.min() >= 0 and pred.max() < 7
    # deterministic
    pred2 = seg.predict(img, orig_shape=(64, 160))
    np.testing.assert_array_equal(pred, pred2)


def test_segmenter_whole_mode_floors_grid(tiny):
    _, _, _, seg = tiny
    img = RNG.normal(size=(35, 43, 3)).astype(np.float32)  # not /8
    logits = seg.whole(img)
    assert logits.shape == (7, 35, 43)
    assert np.isfinite(logits).all()


def test_segmenter_without_bg(tiny):
    model, params, bank, _ = tiny
    seg = ZeroShotSegmenter(model, params, bank, with_bg=False,
                            bg_thresh=0.9, patch_size=8, crop_size=32,
                            stride=32)
    img = RNG.normal(size=(32, 32, 3)).astype(np.float32)
    logits = seg.slide(img)
    assert logits.shape == (6, 32, 32)


def test_text_bank(tiny):
    model, params, _, _ = tiny
    bank = build_text_bank(model, params, ["cat", "dog", "grass"],
                           template_set="simple",
                           context_length=TINY.context_length)
    assert bank.shape == (3, TINY.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(bank), axis=-1),
                               np.ones(3), rtol=1e-5)
    # different classes → different embeddings
    assert not np.allclose(np.asarray(bank[0]), np.asarray(bank[1]))


def test_keep_ratio_resize():
    from PIL import Image
    img = Image.new("RGB", (500, 375))
    out = keep_ratio_resize(img, short=224, long_cap=2048)
    assert min(out.size) == 224 and out.size == (299, 224)
    # long cap engages for extreme aspect
    img2 = Image.new("RGB", (10000, 400))
    out2 = keep_ratio_resize(img2, 224, 2048)
    assert max(out2.size) <= 2048


def test_normalize_pixels_clip_stats():
    arr = np.full((2, 2, 3), 128, np.uint8)
    out = normalize_pixels(arr)
    want = (128 - np.array([122.7709383, 116.7460125, 104.09373615])) / \
        np.array([68.5005327, 66.6321579, 70.32316305])
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)


def test_dataset_specs():
    assert DATASET_SPECS["voc"].bg_thresh == 0.80
    assert DATASET_SPECS["context"].bg_thresh == 0.25
    assert DATASET_SPECS["coco"].bg_thresh == 0.65
    assert len(DATASET_SPECS["voc"].classes) == 21
    assert len(DATASET_SPECS["context"].classes) == 60
    assert len(DATASET_SPECS["coco"].classes) == 81
    for spec in DATASET_SPECS.values():
        assert spec.with_bg


def test_voc_colormap():
    cm = voc_colormap(21)
    np.testing.assert_array_equal(cm[0], [0, 0, 0])
    np.testing.assert_array_equal(cm[1], [128, 0, 0])      # aeroplane
    np.testing.assert_array_equal(cm[15], [192, 128, 128])  # person


def test_slide_pads_small_images(tiny):
    """Extreme aspect ratios can leave the short side below the crop size;
    slide() must pad and crop back instead of crashing (regression)."""
    _, _, _, seg = tiny
    img = RNG.normal(size=(20, 70, 3)).astype(np.float32)   # 20 < crop 32
    logits = seg.slide(img)
    assert logits.shape == (7, 20, 70)
    assert np.isfinite(logits).all()


def test_fused_predict_matches_host_path(tiny):
    """The shape-generic fused predict (device-built bilinear matrices,
    dynamic windows) must equal slide() + host interp + argmax."""
    from segclip_tpu.ops.pos_embed import interp_matrix
    _, _, _, seg = tiny
    for shape, orig in [((32, 80), (61, 163)), ((32, 32), (64, 64)),
                        ((20, 70), (40, 140)), ((48, 45), (97, 90))]:
        img = RNG.normal(size=shape + (3,)).astype(np.float32)
        got = seg.predict(img, orig_shape=orig)
        # host oracle
        logits = seg.slide(img)
        mh = interp_matrix(logits.shape[1], orig[0], "linear")
        mw = interp_matrix(logits.shape[2], orig[1], "linear")
        up = np.einsum("oh,chw->cow", mh, logits)
        up = np.einsum("pw,cow->cop", mw, up)
        want = up.argmax(0).astype(np.int32)
        assert got.shape == want.shape == orig
        np.testing.assert_array_equal(got, want, err_msg=str(shape))


def test_fused_predict_reuses_compiled_buckets(tiny):
    _, _, _, seg = tiny
    seg._jitted.clear()
    # several distinct image widths mapping to the same (bucket) key
    for w in (33, 40, 50, 60):
        img = RNG.normal(size=(32, w, 3)).astype(np.float32)
        seg.predict(img, orig_shape=(64, 2 * w))
    slide_keys = [k for k in seg._jitted if k[0] == "slide_predict"]
    assert len(slide_keys) == 1, slide_keys


def test_sharded_eval_matches_sequential(tiny):
    """evaluate_dataset_sharded over the 8-device mesh must produce the
    SAME mIoU as the sequential path (one image per device, identical
    per-image programs)."""
    from dataclasses import dataclass
    from segclip_tpu.evalseg.datasets import SegEvalSample
    from segclip_tpu.evalseg.inference import (evaluate_dataset,
                                               evaluate_dataset_sharded)
    from segclip_tpu.parallel.mesh import make_mesh
    _, _, _, seg = tiny

    @dataclass
    class Spec:
        ignore_index: int = 255
        classes: tuple = tuple(f"c{i}" for i in range(7))

    class FakeDataset:
        spec = Spec()

        def __init__(self):
            rng = np.random.default_rng(3)
            self.samples = []
            # 11 images over 2 shape buckets → full groups + partial tails
            for i in range(11):
                shape = (32, 40) if i % 2 else (32, 70)
                orig = (shape[0] * 2 - 3, shape[1] * 2 + 5)
                img = rng.normal(size=shape + (3,)).astype(np.float32)
                label = rng.integers(0, 7, size=orig).astype(np.int32)
                label[0, :3] = 255          # some ignored pixels
                self.samples.append(SegEvalSample(
                    image=img, label=label, orig_shape=orig, name=f"s{i}"))

        def __len__(self):
            return len(self.samples)

        def __iter__(self):
            return iter(self.samples)

    ds = FakeDataset()
    want = evaluate_dataset(seg, ds)
    got = evaluate_dataset_sharded(seg, ds, mesh=make_mesh())
    np.testing.assert_allclose(got["mIoU"], want["mIoU"], rtol=1e-6)
    np.testing.assert_allclose(got["aAcc"], want["aAcc"], rtol=1e-6)
    np.testing.assert_allclose(got["IoU"], want["IoU"], rtol=1e-6)

    # images_per_device batching (single-chip throughput mode) — identical
    # at f32 (on TPU bf16, borderline argmax pixels may flip; docs/PERF.md)
    got2 = evaluate_dataset_sharded(seg, ds, mesh=make_mesh(1),
                                    images_per_device=4)
    np.testing.assert_allclose(got2["IoU"], want["IoU"], rtol=1e-6)


def test_keep_ratio_resize_matches_cv2_oracle():
    """Eval resize must use cv2 INTER_LINEAR (mmcv imrescale semantics —
    the reference's eval kernel); PIL BILINEAR differs at the pixel level."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image
    arr = RNG.integers(0, 256, (100, 150, 3)).astype(np.uint8)
    img = Image.fromarray(arr)
    got = np.asarray(keep_ratio_resize(img, short=64, long_cap=512))
    scale = min(64 / 100, 512 / 150)
    new_w, new_h = int(150 * scale + 0.5), int(100 * scale + 0.5)
    want = cv2.resize(arr, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(got, want)
    # and PIL genuinely differs — the parity risk this guards against
    pil = np.asarray(img.resize((new_w, new_h), Image.BILINEAR))
    assert np.abs(pil.astype(int) - want.astype(int)).max() > 0


def test_eval_dtype_clone_shares_params():
    """The eval-precision knob (EvalConfig.compute_dtype / eval CLI
    --compute-dtype) rebuilds the flax module at a different compute dtype
    around UNCHANGED params — the reference evals at fp32 regardless of
    training precision (amp O0 default, main_seg_zeroshot.py:179). A clone
    of a bf16-configured model at float32 must predict identically to a
    model constructed float32 from scratch with the same params."""
    import dataclasses
    from segclip_tpu.models.segclip import SegCLIP

    cfg_bf16 = dataclasses.replace(TINY, compute_dtype="bfloat16")
    model_b, params = init_segclip(cfg_bf16, seed=0)
    clone_cfg = dataclasses.replace(cfg_bf16, compute_dtype="float32")
    clone = SegCLIP(clone_cfg)
    direct = SegCLIP(dataclasses.replace(TINY, compute_dtype="float32"))

    img = jnp.asarray(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    enc = lambda m, im: m.encode_image(im, training=False)
    out_clone = clone.apply({"params": params}, img, method=enc)
    out_direct = direct.apply({"params": params}, img, method=enc)
    np.testing.assert_array_equal(np.asarray(out_clone.pooled),
                                  np.asarray(out_direct.pooled))
    np.testing.assert_array_equal(np.asarray(out_clone.mid["soft_attn"]),
                                  np.asarray(out_direct.mid["soft_attn"]))
    # and the clone really is a different precision than its bf16 source
    out_b = model_b.apply({"params": params}, img, method=enc)
    assert np.asarray(out_b.pooled).dtype == jnp.bfloat16
    assert np.asarray(out_clone.pooled).dtype == np.float32
    assert not np.array_equal(np.asarray(out_b.mid["soft_attn"]),
                              np.asarray(out_clone.mid["soft_attn"]))
