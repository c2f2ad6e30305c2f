"""Data-layer tests: native felzenszwalb + SGR records, superpixel crop
oracle, coord transforms, sampler/loader semantics."""
import json
import io

import numpy as np
import pytest
from PIL import Image

from segclip_tpu.data.records import SgrReader, SgrWriter
from segclip_tpu.data.superpixel import (crop_seg_from_cache, decode_seg_map,
                                         encode_seg_map, felzenszwalb)
from segclip_tpu.data.transforms import (clip_normalize, eval_transform,
                                         random_resized_crop_coord)
from segclip_tpu.data.pipeline import (BatchLoader, ConcatDataset,
                                       ShardedEpochSampler, SyntheticDataset,
                                       build_dataset)
from segclip_tpu.config import DataConfig

RNG = np.random.default_rng(17)


# ---------------------------------------------------------------------------
# native felzenszwalb
# ---------------------------------------------------------------------------

def test_felzenszwalb_two_region_image():
    img = np.zeros((40, 40, 3), np.uint8)
    img[:, 20:] = 255
    labels = felzenszwalb(img, scale=100.0, sigma=0.5, min_size=20)
    assert labels.shape == (40, 40)
    # two clean regions, constant within each half
    left = np.unique(labels[:, :18])
    right = np.unique(labels[:, 22:])
    assert len(left) == 1 and len(right) == 1 and left[0] != right[0]


def test_felzenszwalb_min_size_merges():
    img = (RNG.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    labels = felzenszwalb(img, scale=1.0, sigma=0.0, min_size=1024)
    # min_size = whole image → everything merged into one segment
    assert labels.max() == 0


def test_felzenszwalb_labels_scan_order():
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, 5:] = 255
    labels = felzenszwalb(img, scale=50.0, sigma=0.1, min_size=5)
    assert labels[0, 0] == 0          # first scan pixel gets label 0


# ---------------------------------------------------------------------------
# SGR records
# ---------------------------------------------------------------------------

def test_sgr_roundtrip(tmp_path):
    path = str(tmp_path / "test.sgr")
    payloads = {f"key{i}": bytes(RNG.integers(0, 256, RNG.integers(1, 5000),
                                              dtype=np.uint8))
                for i in range(20)}
    with SgrWriter(path) as w:
        for k, v in payloads.items():
            w.add(k, v)
    r = SgrReader(path)
    assert len(r) == 20
    for i, (k, v) in enumerate(payloads.items()):
        key, payload = r.record(i)
        assert key.decode() == k
        assert payload == v
    assert r.get("key7") == payloads["key7"]
    assert [k.decode() for k in r.keys()] == list(payloads)
    r.close()


def test_sgr_native_reader_is_used(tmp_path):
    from segclip_tpu.native.build import load
    lib = load()          # builds the .so; raises if toolchain broken
    path = str(tmp_path / "native.sgr")
    with SgrWriter(path) as w:
        w.add("a", b"hello")
    r = SgrReader(path)
    assert r._lib is not None, "native reader not engaged"
    assert r.get("a") == b"hello"
    r.close()


# ---------------------------------------------------------------------------
# superpixel cache crop (oracle transcribed from rawimage_util.py:100-144)
# ---------------------------------------------------------------------------

def _oracle_crop(seg_full, coord, img_size=32, patch_size=8):
    import math
    h_pic, w_pic = seg_full.shape
    x0, y0, x1, y1 = coord
    flip_h = x0 > x1
    flip_v = y0 > y1
    if flip_h:
        x0, x1 = x1, x0
    if flip_v:
        y0, y1 = y1, y0
    xi0, xi1 = int(x0 * w_pic), math.ceil(x1 * w_pic)
    yi0, yi1 = int(y0 * h_pic), math.ceil(y1 * h_pic)
    win = seg_full if (yi1 - yi0 < 2 or xi1 - xi0 < 2) \
        else seg_full[yi0:yi1, xi0:xi1]
    if flip_h:
        win = win[:, ::-1]
    if flip_v:
        win = win[::-1]
    hh, ww = win.shape
    ys = (np.arange(img_size) * hh / img_size).astype(int)
    xs = (np.arange(img_size) * ww / img_size).astype(int)
    resized = win[ys][:, xs].astype(np.int64)
    g, p = img_size // patch_size, patch_size
    out = resized.reshape(g, p, g, p).transpose(0, 2, 1, 3).reshape(
        g, g, -1).mean(-1)
    return out.astype(np.int64)


@pytest.mark.parametrize("coord", [
    [0.1, 0.2, 0.8, 0.9],
    [0.8, 0.2, 0.1, 0.9],       # h-flip encoding
    [0.1, 0.9, 0.8, 0.2],       # v-flip encoding
    [0.0, 0.0, 0.0, 0.0],       # degenerate → whole map
])
def test_crop_seg_from_cache_matches_oracle(coord):
    seg = RNG.integers(0, 9, size=(57, 83))
    got = crop_seg_from_cache(seg, np.asarray(coord, np.float32),
                              img_size=32, patch_size=8)
    want = _oracle_crop(seg, coord)
    np.testing.assert_array_equal(got, want)


def test_seg_map_codec():
    seg = RNG.integers(0, 50, size=(30, 41)).astype(np.int32)
    np.testing.assert_array_equal(decode_seg_map(encode_seg_map(seg)), seg)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_random_resized_crop_coord():
    img = Image.fromarray(RNG.integers(0, 255, (120, 160, 3),
                                       dtype=np.int64).astype(np.uint8))
    rng = np.random.default_rng(0)
    arr, coord = random_resized_crop_coord(img, 32, rng)
    assert arr.shape == (32, 32, 3)
    x0, y0, x1, y1 = coord
    assert 0 <= x0 < x1 <= 1 and 0 <= y0 < y1 <= 1


def test_eval_transform_center_crop():
    img = Image.fromarray(np.zeros((100, 200, 3), np.uint8))
    out = eval_transform(img, 64)
    assert out.shape == (64, 64, 3)


def test_clip_normalize():
    arr = np.full((1, 1, 3), 255, np.uint8)
    out = clip_normalize(arr)
    want = (1.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / \
        np.array([0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)


# ---------------------------------------------------------------------------
# sampler / loader
# ---------------------------------------------------------------------------

def test_sharded_sampler_partition():
    s0 = ShardedEpochSampler(1000, global_batch=64, shard=0, num_shards=4)
    s1 = ShardedEpochSampler(1000, global_batch=64, shard=1, num_shards=4)
    a, b = s0.epoch_indices(3), s1.epoch_indices(3)
    assert a.shape == b.shape == (15, 16)        # 1000//64 steps, 64/4 each
    assert not np.intersect1d(a, b).size         # disjoint shards
    # same epoch → same permutation base; different epoch differs
    np.testing.assert_array_equal(a, s0.epoch_indices(3))
    assert not np.array_equal(a, s0.epoch_indices(4))


def test_batch_loader_shapes_and_determinism():
    ds = SyntheticDataset(length=64, max_words=12, image_size=32,
                          patch_size=8)
    sampler = ShardedEpochSampler(len(ds), global_batch=8)
    loader = BatchLoader(ds, sampler, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 8
    b = batches[0]
    assert b["input_ids"].shape == (8, 12)
    assert b["image"].shape == (8, 32, 32, 3)
    assert b["image_seg"].shape == (8, 4, 4)
    # deterministic across re-iterations
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(b["image"], again[0]["image"])


def test_batch_loader_corrupt_retry():
    class Flaky(SyntheticDataset):
        def sample(self, idx, rng):
            if idx % 3 == 0:
                raise ValueError("corrupt")
            return super().sample(idx, rng)

    ds = Flaky(length=32, max_words=8, image_size=16, patch_size=8)
    loader = BatchLoader(ds, ShardedEpochSampler(32, global_batch=8), seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 4                     # retries filled the holes


def test_batch_loader_worker_count_invariance():
    """Multiprocess decode must produce bit-identical batches to the
    in-thread path (per-sample position-seeded rng)."""
    import functools
    cfg = DataConfig(datatype="synthetic", batch_size=8)
    ds = build_dataset(cfg, use_seg=True, normalize=False)
    sampler = ShardedEpochSampler(64, global_batch=8)
    thread_loader = BatchLoader(ds, sampler, seed=3)
    mp_loader = BatchLoader(
        ds, sampler, seed=3, num_workers=2,
        dataset_factory=functools.partial(build_dataset, cfg, True, False))
    try:
        a = list(thread_loader.epoch(1))
        b = list(mp_loader.epoch(1))
        assert len(a) == len(b) == 8
        for ba, bb in zip(a, b):
            assert ba["image"].dtype == np.uint8
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])
        # pool survives into a second epoch
        b2 = list(mp_loader.epoch(2))
        a2 = list(thread_loader.epoch(2))
        np.testing.assert_array_equal(a2[0]["image"], b2[0]["image"])
    finally:
        mp_loader.close()


def test_batch_loader_mp_requires_factory():
    ds = SyntheticDataset(length=8)
    with pytest.raises(ValueError):
        BatchLoader(ds, ShardedEpochSampler(8, global_batch=8),
                    num_workers=2)


def test_batch_loader_mp_worker_error_propagates():
    import functools
    cfg = DataConfig(datatype="nonexistent_shard", batch_size=4,
                     data_dir="/nonexistent")
    ds = SyntheticDataset(length=16)       # parent-side dataset is fine
    loader = BatchLoader(
        ds, ShardedEpochSampler(16, global_batch=4), num_workers=1,
        dataset_factory=functools.partial(build_dataset, cfg))
    try:
        with pytest.raises(RuntimeError, match="data worker failed"):
            list(loader.epoch(0))
    finally:
        loader.close()


def test_build_dataset_concat():
    cfg = DataConfig(datatype="synthetic,synthetic,", batch_size=8)
    ds = build_dataset(cfg)
    assert isinstance(ds, ConcatDataset)
    assert len(ds) == 1024
    s = ds.sample(700, np.random.default_rng(0))
    assert s["image"].shape == (224, 224, 3)


def test_seg_map_codec_binary_and_reference_formats():
    seg = RNG.integers(0, 500, size=(224, 300)).astype(np.int32)
    from segclip_tpu.data.superpixel import encode_seg_map, decode_seg_map
    np.testing.assert_array_equal(
        decode_seg_map(encode_seg_map(seg, binary=True)), seg)
    np.testing.assert_array_equal(
        decode_seg_map(encode_seg_map(seg, binary=False)), seg)
    assert len(encode_seg_map(seg, binary=True)) < \
        len(encode_seg_map(seg, binary=False))


def test_felzenszwalb_scale_convention_matches_skimage():
    """skimage divides `scale` by 255 internally ([0,1] pixels); with the
    reference recipe (scale=224 sigma=0.9 min_size=224) a textured image
    must produce MANY segments, not collapse to one (regression)."""
    img = RNG.uniform(0, 255, (224, 224, 3)).astype(np.uint8)
    img[:, :112] //= 2
    n = felzenszwalb(img, scale=224.0, sigma=0.9, min_size=224).max() + 1
    assert n >= 5, f"only {n} segments — scale convention broken"
