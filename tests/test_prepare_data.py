"""prepare_data map/reduce tests: worker-count-invariant output bytes and
resumable superpixel chunks (reference: the Queue map/reduce in
preprocess/COCO/felzenszwalb_extraction_coco.py:31-101)."""
import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from segclip_tpu.cli import prepare_data
from segclip_tpu.data.records import SgrReader

RNG = np.random.default_rng(11)


def _make_corpus(tmp_path, n=6):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    caps = {}
    for i in range(n):
        name = f"img_{i:03d}.jpg"
        arr = RNG.integers(0, 256, (48 + 8 * i, 64, 3), dtype=np.int64)
        Image.fromarray(arr.astype(np.uint8)).save(img_dir / name,
                                                   quality=85)
        caps[name] = [f"caption {i}", f"alt caption {i}"]
    cap_path = tmp_path / "caps.json"
    cap_path.write_text(json.dumps(caps))
    return img_dir, cap_path


def _pack(tmp_path, out_name, img_dir, cap_path, workers):
    out = tmp_path / out_name
    out.mkdir()
    prepare_data.main([
        "pack", "--name", "c", "--image-dir", str(img_dir),
        "--captions-json", str(cap_path), "--out-dir", str(out),
        "--short-side", "32", "--workers", str(workers)])
    return out


def test_pack_parallel_matches_serial_bytes(tmp_path):
    img_dir, cap_path = _make_corpus(tmp_path)
    o1 = _pack(tmp_path, "w1", img_dir, cap_path, workers=1)
    o2 = _pack(tmp_path, "w2", img_dir, cap_path, workers=2)
    for suffix in ("c_images.sgr", "c_captions.sgr"):
        a = (o1 / suffix).read_bytes()
        b = (o2 / suffix).read_bytes()
        assert a == b, f"{suffix} differs between worker counts"


def test_superpixels_parallel_matches_serial_and_resumes(tmp_path):
    img_dir, cap_path = _make_corpus(tmp_path)
    o1 = _pack(tmp_path, "w1", img_dir, cap_path, workers=1)
    o2 = _pack(tmp_path, "w2", img_dir, cap_path, workers=1)

    prepare_data.main(["superpixels", "--name", "c", "--data-dir", str(o1),
                       "--chunk-size", "2", "--workers", "1"])
    # parallel run with a pre-completed chunk (simulated resume) — part
    # names encode their [start, end) record bounds
    task = (str(o2 / "c_images.sgr"), str(o2 / "c_seg.sgr.part2_4"), 2, 4,
            224.0, 0.9, 224)
    prepare_data._superpixel_chunk(task)
    assert os.path.exists(o2 / "c_seg.sgr.part2_4")
    # a stale chunk from a run with a DIFFERENT chunk size must be ignored
    # (not merged), not corrupt the output
    (o2 / "c_seg.sgr.part0_3").write_bytes(b"SGR0bogus")
    prepare_data.main(["superpixels", "--name", "c", "--data-dir", str(o2),
                       "--chunk-size", "2", "--workers", "2"])

    a = (o1 / "c_seg.sgr").read_bytes()
    b = (o2 / "c_seg.sgr").read_bytes()
    assert a == b
    leftovers = list(o2.glob("c_seg.sgr.part*"))
    assert leftovers == [o2 / "c_seg.sgr.part0_3"], \
        "matching parts must be cleaned up; stale parts left for the user"
    # payload sanity: one seg map per image, decodable
    r = SgrReader(str(o1 / "c_seg.sgr"))
    assert len(r) == len(SgrReader(str(o1 / "c_images.sgr")))


def _make_tars(tmp_path, n_tars=2, per_tar=3):
    tar_dir = tmp_path / "tars"
    tar_dir.mkdir()
    for t in range(n_tars):
        with tarfile.open(tar_dir / f"shard_{t}.tar", "w") as tf:
            for i in range(per_tar):
                arr = RNG.integers(0, 256, (40, 56, 3), dtype=np.int64)
                buf = io.BytesIO()
                Image.fromarray(arr.astype(np.uint8)).save(buf, format="JPEG")
                info = tarfile.TarInfo(f"s{t}_{i}.jpg")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf.addfile(info, buf)
                txt = f"tar caption {t}/{i}".encode()
                info = tarfile.TarInfo(f"s{t}_{i}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))
    return tar_dir


def test_pack_tars_parallel_matches_serial_bytes(tmp_path):
    tar_dir = _make_tars(tmp_path)
    outs = []
    for w in (1, 2):
        out = tmp_path / f"tw{w}"
        out.mkdir()
        prepare_data.main(["pack-tars", "--name", "g", "--tar-dir",
                           str(tar_dir), "--out-dir", str(out),
                           "--short-side", "32", "--workers", str(w)])
        outs.append(out)
    for suffix in ("g_images.sgr", "g_captions.sgr"):
        assert (outs[0] / suffix).read_bytes() == \
            (outs[1] / suffix).read_bytes()
    r = SgrReader(str(outs[0] / "g_images.sgr"))
    assert len(r) == 6
    assert not (outs[1] / ".g_tars_tmp").exists()


def test_pack_pickle_migrates_reference_artifacts(tmp_path):
    """pack-pickle: dict-of-JPEG-bytes pickles + caption pickle/json → SGR
    shards with bytes verbatim (the reference's coco_train2014.pkl /
    cc3m_train_desc.pkl layout; merge order = combine_pickle.py)."""
    import pickle
    rng = np.random.default_rng(4)

    def jpeg(i):
        import io as _io
        from PIL import Image as _Image
        buf = _io.BytesIO()
        _Image.fromarray(rng.integers(0, 255, (32, 40, 3)).astype(
            np.uint8)).save(buf, format="JPEG", quality=80 + i)
        return buf.getvalue()

    imgs1 = {"a.jpg": jpeg(0), "b.jpg": jpeg(1), "nocap.jpg": jpeg(2)}
    imgs2 = {"c.jpg": jpeg(3), "a.jpg": b"dup-ignored"}
    (tmp_path / "p1.pkl").write_bytes(pickle.dumps(imgs1))
    (tmp_path / "p2.pkl").write_bytes(pickle.dumps(imgs2))
    caps = {"a.jpg": "a cat", "b.jpg": ["two", "captions"], "c.jpg": "sea"}
    (tmp_path / "desc.pkl").write_bytes(pickle.dumps(caps))

    out = tmp_path / "out"
    out.mkdir()
    prepare_data.main([
        "pack-pickle", "--name", "m", "--images-pkl",
        str(tmp_path / "p1.pkl"), str(tmp_path / "p2.pkl"),
        "--captions-pkl", str(tmp_path / "desc.pkl"),
        "--out-dir", str(out)])

    ri = SgrReader(str(out / "m_images.sgr"))
    rc = SgrReader(str(out / "m_captions.sgr"))
    assert len(ri) == 3                              # nocap dropped
    assert ri.get(b"a.jpg") == imgs1["a.jpg"]        # bytes verbatim,
    assert ri.get(b"c.jpg") == imgs2["c.jpg"]        # first pickle wins
    assert json.loads(rc.get(b"a.jpg")) == ["a cat"]
    assert json.loads(rc.get(b"b.jpg")) == ["two", "captions"]


def test_shapes_holdout_excludes_pairs_and_writes_probe_split(tmp_path):
    """`prepare_data shapes --holdout`: held-out color×shape compositions
    appear in NO training caption (and, by the same resampling, no image),
    the manifests are written, and the pair probe split covers every pair
    exactly n_per_pair times with correct GT class ids + pairs.json
    (the open-vocabulary generalization harness, data/procgen.py)."""
    import json as _json

    from PIL import Image
    from segclip_tpu.cli import prepare_data
    from segclip_tpu.data.procgen import (COLORS, HOLDOUT_PAIRS_DEFAULT,
                                          SHAPE_CLASSES)

    out = tmp_path / "corpus"
    prepare_data.main([
        "shapes", "--out-dir", str(out), "--train-n", "40",
        "--eval-n", "2", "--no-superpixels", "--holdout",
        "--pair-eval-n", "1"])

    # manifest records the default holdout set, which must cover every
    # shape class exactly once (VERDICT r4 #2: the probe needs signal no
    # matter which class grounds) with distinct colors
    held = {tuple(p) for p in _json.loads(
        (out / "holdout.json").read_text())["holdout_pairs"]}
    assert held == set(HOLDOUT_PAIRS_DEFAULT)
    held_shapes = [s for _, s in HOLDOUT_PAIRS_DEFAULT]
    assert sorted(held_shapes) == sorted(SHAPE_CLASSES)
    held_colors = [c for c, _ in HOLDOUT_PAIRS_DEFAULT]
    assert len(set(held_colors)) == len(held_colors)

    # no training caption mentions a held-out composition; the color-mode
    # caption names every drawn shape with its color, so caption-level
    # absence implies image-level absence (same resampled stream draws
    # both, data/procgen._scene_with_captions)
    rc = SgrReader(str(out / "shapes_captions.sgr"))
    caps = [c for k in rc.keys() for c in json.loads(rc.get(k))]
    assert len(caps) == 80                     # both-captions: 2 per image
    for color, shape in held:
        assert not any(f"{color} {shape}" in c for c in caps), (color, shape)
    # ...while the held-out SHAPES still occur (in other colors) — the
    # resampler replaces the color, not the shape
    for _, shape in held:
        assert any(shape in c for c in caps), shape

    # probe split: every pair exactly once, GT ids match the shape class,
    # manifest complete
    pair_root = out / "pair_eval"
    pairs = _json.loads((pair_root / "pairs.json").read_text())
    assert len(pairs) == len(COLORS) * len(SHAPE_CLASSES)
    covered = {(p["color"], p["shape"]) for p in pairs.values()}
    assert covered == {(c, s) for c in COLORS for s in SHAPE_CLASSES}
    names = (pair_root / "ImageSets/Segmentation/val.txt"
             ).read_text().split()
    assert sorted(names) == sorted(pairs)
    probe = names[0]
    mask = np.asarray(Image.open(
        pair_root / "SegmentationClass" / f"{probe}.png"))
    want_id = 1 + SHAPE_CLASSES.index(pairs[probe]["shape"])
    assert set(np.unique(mask)) == {0, want_id}


def test_shapes_meta_sidecar_and_pipeline_class_ids(tmp_path):
    """`prepare_data shapes` writes the <name>_meta.sgr class-metadata
    sidecar ({"cls": per-caption named class, "scene": shape bitmask}) and
    PairRecordDataset(emit_class_ids=True) ships it as per-sample
    text_class/scene_classes — the inputs of model.infonce_mask='class'
    (docs/PERF.md 'Run N' diagnosis)."""
    import re

    from segclip_tpu.cli import prepare_data
    from segclip_tpu.data.pipeline import PairRecordDataset
    from segclip_tpu.data.procgen import SHAPE_CLASSES

    out = tmp_path / "ment"
    prepare_data.main([
        "shapes", "--out-dir", str(out), "--train-n", "20",
        "--eval-n", "1", "--no-superpixels", "--captions", "mention"])

    rc = SgrReader(str(out / "shapes_captions.sgr"))
    rm = SgrReader(str(out / "shapes_meta.sgr"))
    shape_re = re.compile("|".join(SHAPE_CLASSES))
    for k in rc.keys():
        caps = json.loads(rc.get(k))
        meta = json.loads(rm.get(k))
        assert len(meta["cls"]) == len(caps) == 2
        assert meta["cls"][0] == 0            # full caption = unstructured
        # the mention's class id names the shape in the mention caption
        kind = SHAPE_CLASSES[meta["cls"][1] - 1]
        assert kind in caps[1]
        # scene bitmask covers exactly the shapes of the full caption
        named = set(shape_re.findall(caps[0]))
        want_mask = sum(1 << SHAPE_CLASSES.index(s) for s in named)
        assert meta["scene"] == want_mask
        # the mention's class is always present in its own scene
        assert (meta["scene"] >> (meta["cls"][1] - 1)) & 1

    ds = PairRecordDataset("shapes", str(out), use_seg=False,
                           normalize=False, emit_class_ids=True)
    rng = np.random.default_rng(0)
    # samples alternate (full, mention) per image in caption order
    s0 = ds.sample(0, rng)
    s1 = ds.sample(1, rng)
    assert s0["text_class"] == 0 and s0["scene_classes"] > 0
    assert 1 <= s1["text_class"] <= len(SHAPE_CLASSES)
    assert s0["scene_classes"] == s1["scene_classes"]
    assert s0["text_class"].dtype == np.int32

    # corpora without the sidecar fail loudly when the mask asks for it
    import shutil
    os_removed = out / "shapes_meta.sgr"
    shutil.move(str(os_removed), str(out / "gone.sgr"))
    with pytest.raises(FileNotFoundError, match="infonce_mask"):
        PairRecordDataset("shapes", str(out), use_seg=False,
                          normalize=False, emit_class_ids=True)


def test_shapes_equal_area_mode_equalizes_class_pixel_areas():
    """--equal-area: per-shape circumradius multipliers bring every class's
    mean instance pixel area within a tight band of the circle's, where the
    default generator spans >3x (square 4r^2 vs triangle 1.3r^2) — the
    measured confound behind area-ordered grounding (docs/PERF.md). Same
    rng draw sequence in both modes (the multiplier scales the sampled
    radius), so seeds stay comparable across modes."""
    from segclip_tpu.data.procgen import (SHAPE_CLASSES, _forced_scene,
                                          _equal_area_multipliers)

    mult = _equal_area_multipliers()
    assert mult["circle"] == 1.0
    assert abs(mult["square"] - 0.8862) < 1e-3   # sqrt(pi/4)

    def mean_areas(equal_area):
        areas = {}
        for kind in SHAPE_CLASSES:
            rng = np.random.default_rng(7)       # same stream both modes
            tot = sum(int((_forced_scene(rng, (224, 224), kind, "red",
                                         equal_area)[1] > 0).sum())
                      for _ in range(25))
            areas[kind] = tot / 25
        return areas

    base, eq = mean_areas(False), mean_areas(True)
    assert max(base.values()) / min(base.values()) > 2.5
    assert max(eq.values()) / min(eq.values()) < 1.35
    # circle is the fixed point of the equalization
    assert eq["circle"] == base["circle"]


def test_shapes_mention_captions_single_shape_and_stream_invariant(tmp_path):
    """--captions mention packs [color-full, single-shape mention] per
    image. The mention names exactly ONE shape that is actually in the
    scene (with its true color when color-bearing — so the holdout
    guarantee carries over), and the image shard is byte-identical to the
    'both' corpus at the same seed (mention draws use a separate rng
    stream, data/procgen.write_train_corpus)."""
    import re

    from segclip_tpu.cli import prepare_data
    from segclip_tpu.data.procgen import COLORS, SHAPE_CLASSES

    a, b = tmp_path / "both", tmp_path / "mention"
    for out, mode in ((a, "both"), (b, "mention")):
        prepare_data.main([
            "shapes", "--out-dir", str(out), "--train-n", "30",
            "--eval-n", "1", "--no-superpixels", "--holdout",
            "--pair-eval-n", "1", "--captions", mode])

    ra, rb = SgrReader(str(a / "shapes_images.sgr")), \
        SgrReader(str(b / "shapes_images.sgr"))
    assert list(ra.keys()) == list(rb.keys())
    assert all(ra.get(k) == rb.get(k) for k in ra.keys())

    ca, cb = SgrReader(str(a / "shapes_captions.sgr")), \
        SgrReader(str(b / "shapes_captions.sgr"))
    shape_re = re.compile("|".join(SHAPE_CLASSES))
    saw_color, saw_plain = 0, 0
    for k in cb.keys():
        full_color = json.loads(ca.get(k))[0]
        caps = json.loads(cb.get(k))
        assert len(caps) == 2
        assert caps[0] == full_color          # style (a) unchanged
        names = shape_re.findall(caps[1])
        assert len(names) == 1                # exactly one shape named
        (kind,) = names
        colors_in = [c for c in COLORS if f"{c} {kind}" in caps[1]]
        if colors_in:
            saw_color += 1
            # color-bearing mention: the (color, shape) pair must be one
            # the scene really contains == appears in the full caption
            assert f"{colors_in[0]} {kind}" in full_color
        else:
            saw_plain += 1
            assert f" {kind}" in full_color   # shape is in the scene
    # the 50/50 color/plain mix actually mixes over 30 images
    assert saw_color >= 5 and saw_plain >= 5


def test_shapes_mention_only_two_distinct_mentions(tmp_path):
    """--captions mention-only packs TWO single-shape mentions per image
    (no full-scene caption): distinct shape classes whenever the scene
    has >=2, every mention truthful (named shape in the scene), meta cls
    nonzero for both samples, and the image shard stays byte-identical to
    the 'both' corpus at the same seed (separate mention rng stream)."""
    import re

    from segclip_tpu.cli import prepare_data
    from segclip_tpu.data.procgen import SHAPE_CLASSES

    a, b = tmp_path / "both", tmp_path / "monly"
    for out, mode in ((a, "both"), (b, "mention-only")):
        prepare_data.main([
            "shapes", "--out-dir", str(out), "--train-n", "30",
            "--eval-n", "1", "--no-superpixels", "--captions", mode])

    ra = SgrReader(str(a / "shapes_images.sgr"))
    rb = SgrReader(str(b / "shapes_images.sgr"))
    assert list(ra.keys()) == list(rb.keys())
    assert all(ra.get(k) == rb.get(k) for k in ra.keys())

    ca = SgrReader(str(a / "shapes_captions.sgr"))
    cb = SgrReader(str(b / "shapes_captions.sgr"))
    rm = SgrReader(str(b / "shapes_meta.sgr"))
    shape_re = re.compile("|".join(SHAPE_CLASSES))
    n_multi = n_distinct = 0
    for k in cb.keys():
        full_color = json.loads(ca.get(k))[0]   # names every placed shape
        caps = json.loads(cb.get(k))
        meta = json.loads(rm.get(k))
        assert len(caps) == len(meta["cls"]) == 2
        scene_kinds = set(shape_re.findall(full_color))
        named = []
        for cap, cls in zip(caps, meta["cls"]):
            names = shape_re.findall(cap)
            assert len(names) == 1             # single-shape mention
            assert names[0] in scene_kinds     # truthful
            assert cls == 1 + SHAPE_CLASSES.index(names[0])
            assert (meta["scene"] >> (cls - 1)) & 1
            named.append(names[0])
        if len(scene_kinds) >= 2:
            n_multi += 1
            n_distinct += named[0] != named[1]
    # distinct-shape pairing holds on every multi-shape scene
    assert n_multi >= 5 and n_distinct == n_multi
