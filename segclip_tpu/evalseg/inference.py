"""Zero-shot segmentation inference: group-attention decode + sliding window.

Reproduces ViTSegInference (seg_segmentation/evaluation/vit_seg.py:118-256)
TPU-natively:
  - ONE encode_image per crop (the reference encodes twice — once in
    get_attn_maps, once in encode_decode — with identical deterministic
    results; we reuse the outputs);
  - soft patch→group attention bilinearly upsampled to pixels
    (resize_attn_map, vit_seg.py:30-58) then hard-argmaxed one-hot;
  - group↔class affinity softmax with the image-level top-5 class gate
    (vit_seg.py:232-247) and the per-crop background threshold
    min(bg_thresh, affinity.max()) (vit_seg.py:252-254);
  - sliding-window accumulation (mmseg EncoderDecoder.slide_inference
    semantics: edge-aligned 224² windows, stride 224, logit averaging) with
    crops batched into padded power-of-two buckets so each bucket size
    compiles once.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segclip_tpu.evalseg.miou import MIoUMeter
from segclip_tpu.ops.pos_embed import interp_matrix


def _upsample_attn(soft_attn: jax.Array, gh: int, gw: int, out_h: int,
                   out_w: int) -> jax.Array:
    """(N, G, gh·gw) → (N, out_h, out_w, G) bilinear, torch
    align_corners=False semantics, as two static matmuls."""
    n, g, _ = soft_attn.shape
    attn = soft_attn.reshape(n, g, gh, gw).astype(jnp.float32)
    mh = jnp.asarray(interp_matrix(gh, out_h, "linear"))
    mw = jnp.asarray(interp_matrix(gw, out_w, "linear"))
    attn = jnp.einsum("oh,nghw->ngow", mh, attn)
    attn = jnp.einsum("pw,ngow->ngop", mw, attn)
    return attn.transpose(0, 2, 3, 1)            # (N, H, W, G)


def _decode_crops(params, crops, text_bank, model, with_bg: bool,
                  bg_thresh: float, out_h: int, out_w: int, gh: int, gw: int):
    """crops: (N, h, w, 3) → per-pixel class logits (N, C[+bg], out_h, out_w)."""
    vis = model.apply({"params": params}, crops,
                      method=lambda m, im: m.encode_image(im,
                                                          training=False))
    soft_attn = vis.mid["soft_attn"]                     # (N, G, L)
    attn_up = _upsample_attn(soft_attn, gh, gw, out_h, out_w)
    onehot = jax.nn.one_hot(jnp.argmax(attn_up, axis=-1),
                            attn_up.shape[-1], dtype=jnp.float32)

    groups = vis.hidden[:, 1:, :].astype(jnp.float32)    # (N, G, E)
    pooled = vis.pooled.astype(jnp.float32)              # (N, E)
    groups = groups / jnp.linalg.norm(groups, axis=-1, keepdims=True)
    pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)

    scale = jnp.minimum(
        jnp.exp(params["clip"]["logit_scale"].astype(jnp.float32)), 100.0)
    text = text_bank.astype(jnp.float32)                 # (C, E)
    num_fg = text.shape[0]

    group_aff = jnp.einsum("nge,ce->ngc", groups, text) * scale
    pre_aff = jax.nn.softmax(group_aff, axis=-1)

    avg_aff = jax.nn.softmax(
        jnp.einsum("ne,ce->nc", pooled, text) * scale, axis=-1)
    k = min(5, num_fg)
    _, top_idx = jax.lax.top_k(avg_aff, k)               # (N, k)
    gate = jnp.zeros_like(avg_aff).at[
        jnp.arange(avg_aff.shape[0])[:, None], top_idx].set(1.0)

    gated = jnp.where(gate[:, None, :] > 0, group_aff, -jnp.inf)
    aff = jax.nn.softmax(gated, axis=-1) * pre_aff       # (N, G, C)

    fg = jnp.einsum("nhwg,ngc->nhwc", onehot, aff)       # (N, H, W, C)

    if with_bg:
        crop_max = jnp.max(aff, axis=(1, 2))             # (N,) per-crop max
        thresh = jnp.minimum(bg_thresh, crop_max)[:, None, None]
        bg = (jnp.max(fg, axis=-1) < thresh).astype(fg.dtype)[..., None]
        logits = jnp.concatenate([bg, fg], axis=-1)
    else:
        logits = fg
    return logits.transpose(0, 3, 1, 2)                  # (N, C, H, W)


class ZeroShotSegmenter:
    """Stateful wrapper: jits the crop decoder per (bucket, crop-shape)."""

    def __init__(self, model, params, text_bank, with_bg: bool,
                 bg_thresh: float, patch_size: int = 16,
                 crop_size: int = 224, stride: int = 224):
        self.model = model
        self.params = params
        self.text_bank = text_bank
        self.with_bg = with_bg
        self.bg_thresh = bg_thresh
        self.patch = patch_size
        self.crop = crop_size
        self.stride = stride
        self.num_classes = text_bank.shape[0] + (1 if with_bg else 0)
        self._jitted = {}

    def _decoder(self, n: int, h: int, w: int,
                 out_h: Optional[int] = None, out_w: Optional[int] = None):
        out_h, out_w = out_h or h, out_w or w
        key = (n, h, w, out_h, out_w)
        if key not in self._jitted:
            gh, gw = h // self.patch, w // self.patch
            fn = functools.partial(_decode_crops, model=self.model,
                                   with_bg=self.with_bg,
                                   bg_thresh=self.bg_thresh,
                                   out_h=out_h, out_w=out_w, gh=gh, gw=gw)
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _windows(self, h: int, w: int):
        """Edge-aligned slide windows (mmseg slide_inference semantics)."""
        hs = max(1, math.ceil((h - self.crop) / self.stride) + 1)
        ws = max(1, math.ceil((w - self.crop) / self.stride) + 1)
        wins = []
        for i in range(hs):
            for j in range(ws):
                y2 = min(i * self.stride + self.crop, h)
                x2 = min(j * self.stride + self.crop, w)
                y1, x1 = max(y2 - self.crop, 0), max(x2 - self.crop, 0)
                wins.append((y1, x1, y2, x2))
        return wins

    def slide(self, image: np.ndarray) -> np.ndarray:
        """image: normalized (H, W, 3) → class logits (C, H, W).

        Images smaller than the crop on either side (extreme aspect ratios
        where the 2048 long-side cap pushes the short side below 224) are
        zero-padded to crop size, mmseg-style, and the logits cropped back.
        """
        h0, w0, _ = image.shape
        if h0 < self.crop or w0 < self.crop:
            image = np.pad(image, ((0, max(0, self.crop - h0)),
                                   (0, max(0, self.crop - w0)), (0, 0)))
        h, w, _ = image.shape
        wins = self._windows(h, w)
        crops = np.stack([image[y1:y2, x1:x2] for y1, x1, y2, x2 in wins])

        n = len(wins)
        bucket = 1 << (n - 1).bit_length()            # next power of two
        if bucket > n:
            pad = np.zeros((bucket - n,) + crops.shape[1:], crops.dtype)
            crops = np.concatenate([crops, pad])

        logits = np.asarray(
            self._decoder(bucket, self.crop, self.crop)(
                self.params, jnp.asarray(crops), self.text_bank))[:n]

        canvas = np.zeros((self.num_classes, h, w), np.float32)
        count = np.zeros((1, h, w), np.float32)
        for lg, (y1, x1, y2, x2) in zip(logits, wins):
            canvas[:, y1:y2, x1:x2] += lg
            count[:, y1:y2, x1:x2] += 1.0
        return (canvas / count)[:, :h0, :w0]

    def whole(self, image: np.ndarray) -> np.ndarray:
        """Whole-image mode. The encoder floors H/W to patch multiples (a
        stride-16 conv ignores trailing pixels) but the attention maps are
        upsampled to the full (H, W), matching the reference decode."""
        h, w, _ = image.shape
        hf = h // self.patch * self.patch
        wf = w // self.patch * self.patch
        logits = np.asarray(
            self._decoder(1, hf, wf, h, w)(
                self.params, jnp.asarray(image[None, :hf, :wf]),
                self.text_bank))[0]
        return logits

    def group_map(self, image: np.ndarray) -> np.ndarray:
        """Hard patch→group assignment upsampled to pixels (H, W) int32 —
        the demo's *_group visualization (vit_seg.py:144-200, 346-375)."""
        h, w, _ = image.shape
        hf = h // self.patch * self.patch
        wf = w // self.patch * self.patch
        gh, gw = hf // self.patch, wf // self.patch

        key = ("group_map", hf, wf, h, w)
        if key not in self._jitted:
            def attn_fn(params, img):
                vis = self.model.apply(
                    {"params": params}, img,
                    method=lambda m, im: m.encode_image(im, training=False))
                return _upsample_attn(vis.mid["soft_attn"], gh, gw, h, w)

            self._jitted[key] = jax.jit(attn_fn)
        attn = np.asarray(self._jitted[key](
            self.params, jnp.asarray(image[None, :hf, :wf])))[0]
        return attn.argmax(axis=-1).astype(np.int32)

    def _resize_argmax(self, c: int, h: int, w: int, oh: int, ow: int):
        """Jitted on-device bilinear upsample + argmax (the host-numpy
        version cost ~1 s/image on this machine's single core)."""
        key = ("resize", c, h, w, oh, ow)
        if key not in self._jitted:
            mh = jnp.asarray(interp_matrix(h, oh, "linear"))
            mw = jnp.asarray(interp_matrix(w, ow, "linear"))

            @jax.jit
            def fn(logits):
                up = jnp.einsum("oh,chw->cow", mh, logits)
                up = jnp.einsum("pw,cow->cop", mw, up)
                return jnp.argmax(up, axis=0).astype(jnp.int32)

            self._jitted[key] = fn
        return self._jitted[key]

    def _make_slide_fn(self, n_bucket: int, hb: int, wb: int, ohb: int,
                       owb: int):
        """Raw (unjitted) shape-generic fused predict for one image:
        decode all windows, accumulate, bilinear-upsample, argmax. Also the
        vmap target for the mesh-sharded batch evaluator."""
        gh = gw = self.crop // self.patch
        crop = self.crop
        decode = functools.partial(_decode_crops, model=self.model,
                                   with_bg=self.with_bg,
                                   bg_thresh=self.bg_thresh,
                                   out_h=crop, out_w=crop, gh=gh, gw=gw)

        def linear_matrix(out_pad, in_pad, n_out, n_in):
            """torch-convention bilinear weights built on device from
            traced sizes; rows/cols beyond (n_out, n_in) are zero."""
            i = jax.lax.broadcasted_iota(jnp.float32,
                                         (out_pad, in_pad), 0)
            j = jax.lax.broadcasted_iota(jnp.float32,
                                         (out_pad, in_pad), 1)
            src = (i + 0.5) * (n_in / n_out) - 0.5
            src = jnp.clip(src, 0.0, n_in - 1.0)
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(src - j))
            return jnp.where((i < n_out) & (j < n_in), wgt, 0.0)

        def fn(params, image, text_bank, ys, xs, valid, h, w, oh, ow):
            crops = jnp.stack([
                jax.lax.dynamic_slice(image, (ys[i], xs[i], 0),
                                      (crop, crop, 3))
                for i in range(n_bucket)])
            logits = decode(params, crops, text_bank)   # (N, C, c, c)
            canvas = jnp.zeros((self.num_classes, hb, wb), jnp.float32)
            count = jnp.zeros((1, hb, wb), jnp.float32)
            for i in range(n_bucket):
                patch = logits[i] * valid[i]
                cur = jax.lax.dynamic_slice(
                    canvas, (0, ys[i], xs[i]),
                    (self.num_classes, crop, crop))
                canvas = jax.lax.dynamic_update_slice(
                    canvas, cur + patch, (0, ys[i], xs[i]))
                cnt = jax.lax.dynamic_slice(count, (0, ys[i], xs[i]),
                                            (1, crop, crop))
                canvas_ones = jnp.full((1, crop, crop), valid[i])
                count = jax.lax.dynamic_update_slice(
                    count, cnt + canvas_ones, (0, ys[i], xs[i]))
            full = canvas / jnp.maximum(count, 1e-6)
            mh = linear_matrix(ohb, hb, oh.astype(jnp.float32),
                               h.astype(jnp.float32))
            mw = linear_matrix(owb, wb, ow.astype(jnp.float32),
                               w.astype(jnp.float32))
            up = jnp.einsum("oh,chw->cow", mh, full)
            up = jnp.einsum("pw,cow->cop", mw, up)
            return jnp.argmax(up, axis=0).astype(jnp.int32)

        return fn

    def _slide_predict(self, n_bucket: int, hb: int, wb: int, ohb: int,
                       owb: int):
        """jitted single-image fused predict. All image-specific quantities
        (window coords, true h/w/oh/ow) are runtime inputs and dims are
        quantized to buckets, so an entire eval dataset reuses a handful of
        executables (a per-exact-shape key would recompile the whole ViT
        decode for nearly every image). Only the final int map crosses the
        host boundary."""
        key = ("slide_predict", n_bucket, hb, wb, ohb, owb)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self._make_slide_fn(n_bucket, hb, wb, ohb, owb))
        return self._jitted[key]

    def _slide_predict_batch(self, mesh, n_images: int, n_bucket: int,
                             hb: int, wb: int, ohb: int, owb: int):
        """Mesh-sharded batch predict: vmap the single-image program over a
        leading image axis sharded on `data` — with n_images == mesh size
        each device runs exactly the sequential per-image program, so
        predictions are identical to the one-at-a-time path (the reference
        shards eval across GPUs the same way, main_seg_zeroshot.py:137-146).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from segclip_tpu.parallel.mesh import DATA_AXIS
        key = ("slide_predict_batch", n_images, n_bucket, hb, wb, ohb, owb)
        if key not in self._jitted:
            fn = self._make_slide_fn(n_bucket, hb, wb, ohb, owb)
            vfn = jax.vmap(fn, in_axes=(None, 0, None) + (0,) * 7)
            rep = NamedSharding(mesh, P())
            sh = NamedSharding(mesh, P(DATA_AXIS))
            self._jitted[key] = jax.jit(
                vfn, in_shardings=(rep, sh, rep) + (sh,) * 7,
                out_shardings=sh)
        return self._jitted[key]

    def _slide_inputs(self, image: np.ndarray, orig_shape: Tuple[int, int]):
        """Host-side prep shared by single and batched slide predict:
        returns (bucket_key, args) where args = (padded image, ys, xs,
        valid, h, w, oh, ow) as numpy."""
        oh, ow = orig_shape
        h, w, _ = image.shape
        hp, wp = max(h, self.crop), max(w, self.crop)
        wins = self._windows(hp, wp)
        n_bucket = 1 << (len(wins) - 1).bit_length()
        hb = self._bucket(hp, self.crop)
        wb = self._bucket(wp, self.crop)
        ohb = self._bucket(oh, 256)
        owb = self._bucket(ow, 256)

        padded = np.zeros((hb, wb, 3), np.float32)
        padded[:h, :w] = image
        ys = np.zeros(n_bucket, np.int32)
        xs = np.zeros(n_bucket, np.int32)
        valid = np.zeros(n_bucket, np.float32)
        for i, (y1, x1, y2, x2) in enumerate(wins):
            ys[i], xs[i], valid[i] = y1, x1, 1.0
        args = (padded, ys, xs, valid,
                np.int32(h), np.int32(w), np.int32(oh), np.int32(ow))
        return (n_bucket, hb, wb, ohb, owb), args

    @staticmethod
    def _bucket(n: int, q: int) -> int:
        return max(q, -(-n // q) * q)

    def predict(self, image: np.ndarray, orig_shape: Tuple[int, int],
                mode: str = "slide") -> np.ndarray:
        """Full-image class prediction at the ORIGINAL resolution (mmseg
        rescale=True: bilinear logits upsample then argmax)."""
        oh, ow = orig_shape
        if mode == "slide":
            bucket_key, args = self._slide_inputs(image, orig_shape)
            fn = self._slide_predict(*bucket_key)
            pred = np.asarray(fn(self.params,
                                 *[jnp.asarray(a) for a in args[:1]],
                                 self.text_bank,
                                 *[jnp.asarray(a) for a in args[1:]]))
            return pred[:oh, :ow]
        logits = self.whole(image)
        c, h, w = logits.shape
        if (oh, ow) == (h, w):
            return logits.argmax(axis=0).astype(np.int32)
        return np.asarray(self._resize_argmax(c, h, w, oh, ow)(
            jnp.asarray(logits)))


def evaluate_dataset(segmenter: ZeroShotSegmenter, dataset,
                     log_every: int = 50, logger=None) -> dict:
    """Run zero-shot mIoU over a SegEvalDataset (sequential, one chip)."""
    meter = MIoUMeter(segmenter.num_classes,
                      ignore_index=dataset.spec.ignore_index)
    for i, sample in enumerate(dataset):
        pred = segmenter.predict(sample.image, sample.orig_shape)
        if sample.label is not None:
            meter.update(pred, sample.label)
        if logger and (i + 1) % log_every == 0:
            logger.info("eval %d/%d  running mIoU %.2f", i + 1, len(dataset),
                        meter.results()["mIoU"])
    return meter.results(dataset.spec.classes)


def evaluate_dataset_sharded(segmenter: ZeroShotSegmenter, dataset,
                             mesh=None, log_every: int = 50,
                             logger=None, images_per_device: int = 1) -> dict:
    """Mesh-parallel zero-shot mIoU: images sharing a padded-shape bucket
    are batched over the mesh's `data` axis, one image per device — the
    multi-device equivalent of the reference's dataset sharding across GPUs
    (multi_gpu_test, main_seg_zeroshot.py:137-146). Predictions (and thus
    mIoU) are identical to evaluate_dataset; a trailing partial group is
    padded with its own last image and the duplicates discarded.

    Multi-host: each process evaluates its strided slice of the dataset on
    its local mesh and the confusion-matrix accumulators are summed across
    hosts (the reference's collect_results + rank-0 evaluate), so every
    host returns the full-dataset metrics.
    """
    import jax
    from segclip_tpu.parallel.mesh import make_mesh
    n_proc = jax.process_count()
    proc = jax.process_index()
    if mesh is None:
        mesh = make_mesh(devices=jax.local_devices()) if n_proc > 1 \
            else make_mesh()
    # images_per_device > 1 batches several same-bucket images through one
    # vmapped program even on a single chip — amortizes per-dispatch latency
    # (significant on tunneled backends) at the cost of proportional HBM.
    n_images = int(np.prod(list(mesh.shape.values()))) * max(
        1, images_per_device)
    if n_images == 1 and n_proc == 1:
        return evaluate_dataset(segmenter, dataset, log_every, logger)

    if n_proc > 1:
        # Establish the cross-process communicator BEFORE the per-image
        # loop: the final accumulator allgather below would otherwise be
        # this run's first cross-process collective, reached after minutes
        # of per-host eval work whose skew (different shape buckets →
        # different compiles) can exceed the communicator rendezvous's
        # hard 30 s deadline (parallel/mesh.warmup_collectives has the
        # full story). Same primitive as the final reduce, so the exact
        # clique it needs is the one warmed.
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(np.zeros((1,), np.float32))

    meter = MIoUMeter(segmenter.num_classes,
                      ignore_index=dataset.spec.ignore_index)
    n_done = 0

    def flush(bucket_key, group):
        nonlocal n_done
        n_real = len(group)
        while len(group) < n_images:          # pad with the last image
            group.append(group[-1])
        args_stacked = [np.stack([g[0][k] for g in group])
                        for k in range(8)]
        fn = segmenter._slide_predict_batch(mesh, n_images, *bucket_key)
        preds = np.asarray(fn(segmenter.params, args_stacked[0],
                              segmenter.text_bank, *args_stacked[1:]))
        for (args, label, (oh, ow)), pred in list(zip(group, preds))[:n_real]:
            if label is not None:
                meter.update(pred[:oh, :ow], label)
        n_done += n_real
        if logger and n_done % max(log_every, n_images) < n_images:
            logger.info("eval %d/%d  running mIoU %.2f", n_done,
                        len(dataset), meter.results()["mIoU"])

    def my_samples():
        if n_proc == 1:
            yield from dataset
        else:                       # strided per-process dataset shard
            for i in range(proc, len(dataset), n_proc):
                yield dataset.load(i)

    groups: dict = {}
    for sample in my_samples():
        bucket_key, args = segmenter._slide_inputs(sample.image,
                                                   sample.orig_shape)
        groups.setdefault(bucket_key, []).append(
            (args, sample.label, sample.orig_shape))
        if len(groups[bucket_key]) == n_images:
            flush(bucket_key, groups.pop(bucket_key))
    for bucket_key in sorted(groups):
        flush(bucket_key, groups.pop(bucket_key))

    if n_proc > 1:                  # sum accumulators across hosts
        from jax.experimental import multihost_utils
        meter.set_state(
            np.asarray(multihost_utils.process_allgather(
                meter.state())).sum(axis=0))
    return meter.results(dataset.spec.classes)
