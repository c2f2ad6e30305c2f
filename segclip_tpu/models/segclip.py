"""SegCLIP: top-level model owning the CLIP towers + MAE decoders and
computing the four pretraining losses (reference modules/modeling.py:174-256):

  1. global-batch InfoNCE over pooled features — the *other* modality is
     all-gathered across the data mesh axis, labels are rank-offset
     (modeling.py:204-210, 338-362);
  2. superpixel symmetric-KL on the patch→group hard assignment
     (modeling.py:212-224);
  3. text MAE: a second masked text forward → vocab CE (226-236);
  4. vision MAE: a second masked image forward → pixel MSE (238-252).

PRNG: Gumbel noise and MAE masking draw from linen rng streams "gumbel" and
"mae" (the reference relies on torch global RNG; we thread keys explicitly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from segclip_tpu.config import ModelConfig
from segclip_tpu.models.clip import CLIPModule
from segclip_tpu.models.mae_decoder import TextMAEDecoder, VisionMAEDecoder
from segclip_tpu.parallel.collectives import global_gather, rank_of


def info_nce_pair(text_feat: jax.Array, vis_feat: jax.Array,
                  logit_scale: jax.Array,
                  axis_name: Optional[str] = None,
                  text_class: Optional[jax.Array] = None,
                  scene_classes: Optional[jax.Array] = None) -> jax.Array:
    """Symmetric global-batch InfoNCE (modeling.py:204-210, 338-362).

    With `text_class`/`scene_classes` (model.infonce_mask="class"; both
    (B,) int32 — text_class: class the caption names, 0 = unstructured;
    scene_classes: bitmask of classes present in the image), entries whose
    caption TRUTHFULLY describes the image are masked out of the softmax
    denominator (logit → -inf), except the labeled positive. Rationale +
    measurements: docs/PERF.md "Run N" — on structured corpora a
    class-naming caption matches ~29% of batch images, and one-label CE
    (the reference objective) then floods the loss with false negatives
    (mean 27.5/row at B=96), actively pushing class names away from
    correct visual features. Masking is class-granular: a color-bearing
    mention ("a red circle") masks ALL circle images — conservative for
    cross-color pairs (drops some true negatives), never wrong.
    """
    t = text_feat / jnp.linalg.norm(text_feat, axis=-1, keepdims=True)
    v = vis_feat / jnp.linalg.norm(vis_feat, axis=-1, keepdims=True)
    scale = jnp.minimum(jnp.exp(logit_scale.astype(jnp.float32)), 100.0)

    v_all = global_gather(v, axis_name)
    t_all = global_gather(t, axis_name)

    logits_t2v = scale * (t.astype(jnp.float32) @ v_all.astype(jnp.float32).T)
    logits_v2t = scale * (v.astype(jnp.float32) @ t_all.astype(jnp.float32).T)

    local_b = t.shape[0]
    labels = jnp.arange(local_b) + local_b * rank_of(axis_name)

    if text_class is not None:
        tc = text_class.astype(jnp.int32)                      # (B,)
        sc = scene_classes.astype(jnp.int32)                   # (B,)
        tc_all = global_gather(tc, axis_name)                  # (Bg,)
        sc_all = global_gather(sc, axis_name)                  # (Bg,)
        cols = jnp.arange(tc_all.shape[0])
        not_self = cols[None, :] != labels[:, None]            # (B, Bg)

        def truthful(named, scene_bits):
            # caption naming class c>0 truthfully describes an image whose
            # scene bitmask has bit c-1 set
            return (named > 0) & (
                ((scene_bits >> jnp.maximum(named - 1, 0)) & 1) == 1)

        fn_t2v = truthful(tc[:, None], sc_all[None, :]) & not_self
        fn_v2t = truthful(tc_all[None, :], sc[:, None]) & not_self
        logits_t2v = jnp.where(fn_t2v, -1e9, logits_t2v)
        logits_v2t = jnp.where(fn_v2t, -1e9, logits_v2t)

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    return (ce(logits_t2v) + ce(logits_v2t)) / 2.0


def superpixel_kl_loss(hard_attn: jax.Array, image_seg: jax.Array) -> jax.Array:
    """Symmetric KL between the per-patch group assignment and its mean over
    same-superpixel patches (modeling.py:212-224).

    hard_attn: (B, G, L) straight-through one-hot over groups;
    image_seg: (B, gh, gw) integer superpixel ids per patch.
    """
    attn = hard_attn.transpose(0, 2, 1).astype(jnp.float32)   # (B, L, G)
    b, l, g = attn.shape
    seg = image_seg.reshape(b, -1)
    affinity = (seg[:, :, None] == seg[:, None, :]).astype(jnp.float32)

    cluster_sum = jnp.einsum("bql,blc->bqc", affinity, attn,
                             preferred_element_type=jnp.float32)
    counts = jnp.sum(affinity, axis=-1, keepdims=True)
    cluster_mean = cluster_sum / jnp.maximum(counts, 1.0)

    coef = b * l * g

    def kl(p_logits, q_logits):
        # torch F.kl_div(log_softmax(p), softmax(q), 'sum'):
        # sum_i q_i * (log q_i - log_softmax(p)_i), with 0·log0 := 0.
        logp = jax.nn.log_softmax(p_logits, axis=-1)
        q = jax.nn.softmax(q_logits, axis=-1)
        logq = jax.nn.log_softmax(q_logits, axis=-1)
        return jnp.sum(q * (logq - logp)) / coef

    return (kl(attn, cluster_mean) + kl(cluster_mean, attn)) / 2.0


class SegCLIP(nn.Module):
    """Loss head over the CLIP towers; `__call__` returns the loss dict."""
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.clip = CLIPModule(
            embed_dim=c.embed_dim, image_resolution=c.image_resolution,
            vision_layers=c.vision_layers, vision_width=c.vision_width,
            vision_patch_size=c.vision_patch_size,
            context_length=c.context_length, vocab_size=c.vocab_size,
            transformer_width=c.transformer_width,
            transformer_layers=c.transformer_layers,
            first_stage_layer=c.first_stage_layer, group_num=c.group_num,
            cross_layer=c.cross_layer, tau=c.gumbel_tau,
            compute_dtype=dtype, attention_impl=c.attention_impl,
            remat=c.remat, grouping_impl=c.grouping_impl)
        if c.use_vision_mae_recon:
            self.vis_mae_decoder = VisionMAEDecoder(
                in_dim=c.vision_width, dec_dim=c.vision_width // 2,
                image_resolution=c.image_resolution,
                patch_size=c.vision_patch_size, depth=c.mae_decoder_depth,
                heads=c.mae_decoder_num_heads, compute_dtype=dtype,
                remat=c.remat)
        if c.use_text_mae_recon:
            self.seq_mae_decoder = TextMAEDecoder(
                in_dim=c.embed_dim, dec_dim=c.embed_dim // 2,
                seq_len=c.max_words, vocab_size=c.vocab_size,
                depth=c.mae_decoder_depth, heads=c.mae_decoder_num_heads,
                compute_dtype=dtype, remat=c.remat)

    def encode_image(self, image, **kw):
        return self.clip.encode_image(image, **kw)

    def encode_text(self, text, **kw):
        return self.clip.encode_text(text, **kw)

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 image: jax.Array, image_seg: Optional[jax.Array] = None,
                 training: bool = True,
                 axis_name: Optional[str] = None,
                 text_class: Optional[jax.Array] = None,
                 scene_classes: Optional[jax.Array] = None) -> dict:
        c = self.cfg
        gumbel = self.make_rng("gumbel") if training else None

        txt = self.clip.encode_text(input_ids, training=training)
        vis = self.clip.encode_image(image, training=training,
                                     gumbel_key=gumbel)

        if c.infonce_mask not in ("none", "class"):
            raise ValueError(f"model.infonce_mask must be none|class, "
                             f"got {c.infonce_mask!r}")
        use_mask = c.infonce_mask == "class" and training
        if use_mask and text_class is None:
            raise ValueError(
                "model.infonce_mask='class' needs text_class/scene_classes "
                "in the batch — corpus missing the <name>_meta.sgr sidecar?")

        losses = {}
        losses["sim_loss"] = info_nce_pair(
            txt.pooled, vis.pooled, self.clip.logit_scale,
            axis_name=axis_name,
            text_class=text_class if use_mask else None,
            scene_classes=scene_classes if use_mask else None)

        if c.use_seglabel and image_seg is not None:
            losses["seglabel_loss"] = superpixel_kl_loss(vis.mid["hard_attn"],
                                                         image_seg)

        if c.group_balance_weight > 0 and training:
            # Anti-collapse usage balance (from-scratch aid, config.py):
            # KL(mean hard assignment ‖ uniform over groups). The hard map
            # is straight-through, so this gradient reaches the centers
            # through the tau-tempered softmax.
            usage = jnp.mean(vis.mid["hard_attn"].astype(jnp.float32),
                             axis=(0, 2))                       # (G,)
            g = usage.shape[0]
            losses["group_balance_loss"] = (
                c.group_balance_weight
                * jnp.sum(usage * jnp.log(jnp.maximum(usage * g, 1e-8))))

        # The MAE losses are training-only (the reference forward returns
        # None entirely at eval, modeling.py:255); at training=False we
        # return the deterministic losses (InfoNCE + seglabel) without
        # touching the "mae" rng stream.
        if c.use_text_mae_recon and training:
            t_masked = self.clip.encode_text(
                input_ids, mask_ratio=c.mae_seq_mask_ratio, training=training,
                mask_key=self.make_rng("mae"))
            recon_mask = (t_masked.mae_mask +
                          attention_mask.astype(t_masked.mae_mask.dtype)) > 1
            losses["text_mae_loss"] = self.seq_mae_decoder(
                input_ids, t_masked.hidden, recon_mask,
                t_masked.ids_restore, attention_mask)

        if c.use_vision_mae_recon and training:
            v_masked = self.clip.encode_image(
                image, mask_ratio=c.mae_vis_mask_ratio, training=training,
                mask_key=self.make_rng("mae"),
                gumbel_key=self.make_rng("gumbel"))
            # Decoder input: reconstructed patch features with a mean-CLS
            # prepended (modeling.py:243-245).
            hidden = v_masked.mid["hidden"]
            cls = jnp.mean(hidden, axis=1, keepdims=True)
            hidden = jnp.concatenate([cls, hidden], axis=1)
            losses["vis_mae_loss"] = self.vis_mae_decoder(
                image, hidden, v_masked.mae_mask, v_masked.ids_restore)

        losses["loss"] = sum(v for k, v in losses.items() if k != "loss")
        return losses


def build_segclip(cfg: ModelConfig) -> SegCLIP:
    return SegCLIP(cfg)


def init_segclip(cfg: ModelConfig, seed: int = 0):
    """Initialize a SegCLIP model + params on tiny dummy inputs."""
    model = SegCLIP(cfg)
    rng = jax.random.key(seed)
    p_rng, g_rng, m_rng = jax.random.split(rng, 3)
    dummy_ids = jnp.zeros((1, cfg.max_words), jnp.int32).at[:, 1].set(49407)
    dummy_mask = jnp.ones((1, cfg.max_words), jnp.int32)
    dummy_img = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3),
                          jnp.float32)
    dummy_seg = jnp.zeros((1, cfg.grid_size, cfg.grid_size), jnp.int32)
    extra = {}
    if cfg.infonce_mask != "none":
        extra = {"text_class": jnp.zeros((1,), jnp.int32),
                 "scene_classes": jnp.zeros((1,), jnp.int32)}
    init_fn = jax.jit(model.init, static_argnames=("training",))
    params = init_fn({"params": p_rng, "gumbel": g_rng, "mae": m_rng},
                     dummy_ids, dummy_mask, dummy_img, dummy_seg,
                     training=True, **extra)["params"]
    return model, params
