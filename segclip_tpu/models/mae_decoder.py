"""MAE decoders for the masked-reconstruction losses.

Reference modules/module_mae.py. Two variants (the reference multiplexes one
class with `choice_seq`; we split them):
  - VisionMAEDecoder (forward_vis, module_mae.py:304-330): embed → append
    mask tokens → unshuffle by ids_restore → fixed 2D sin-cos pos →
    `depth` timm-style blocks (LN eps 1e-6, erf GELU) → per-patch pixel
    prediction → MSE on removed patches only;
  - TextMAEDecoder (forward_seq, module_mae.py:332-354): same
    embed/unshuffle → 1D sinusoid pos → blocks with the text padding mask →
    vocab logits → CE with ignore_index −1 on masked-and-real positions.

Decoder pos embeddings are deterministic tables, so they are compile-time
constants here rather than frozen buffers.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from segclip_tpu.ops.attention import padding_bias
from segclip_tpu.ops.pos_embed import sincos_2d, sinusoid_table
from segclip_tpu.models.layers import LayerNormFP32, MHAttention, Mlp

xavier_uniform = nn.initializers.xavier_uniform()


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 3) → (B, L, P·P·3), (ph, pw, c) flatten order — identical to
    the reference patchify on NCHW inputs (module_mae.py:18-29)."""
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, L, P·P·3) → (B, H, W, 3)."""
    b, l, _ = x.shape
    g = int(round(l ** 0.5))
    p = patch_size
    x = x.reshape(b, g, g, p, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * p, g * p, 3)


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -1) -> jax.Array:
    """Mean CE over labels != ignore_index (torch CrossEntropyLoss semantics)."""
    logits32 = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits32, axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll * valid) / denom


class MAEBlock(nn.Module):
    """Pre-LN block with erf GELU (timm Block / module_mae.py:185-233)."""
    width: int
    heads: int
    ln_eps: float = 1e-6
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.norm1 = LayerNormFP32(eps=self.ln_eps)
        self.attn = MHAttention(self.width, self.heads,
                                compute_dtype=self.compute_dtype,
                                kernel_init=xavier_uniform)
        self.norm2 = LayerNormFP32(eps=self.ln_eps)
        self.mlp = Mlp(4 * self.width, self.width, act="gelu",
                       compute_dtype=self.compute_dtype,
                       kernel_init=xavier_uniform)

    def __call__(self, x: jax.Array,
                 bias: Optional[jax.Array] = None) -> jax.Array:
        x = x + self.attn(self.norm1(x), bias=bias)
        x = x + self.mlp(self.norm2(x))
        return x


class _DecoderCore(nn.Module):
    """Shared embed / mask-token / unshuffle front-end."""
    in_dim: int
    dec_dim: int
    depth: int
    heads: int
    ln_eps: float
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        Block = nn.remat(MAEBlock) if self.remat else MAEBlock
        self.decoder_embed = nn.Dense(self.dec_dim, kernel_init=xavier_uniform,
                                      dtype=self.compute_dtype,
                                      param_dtype=jnp.float32)
        self.mask_token = self.param("mask_token",
                                     nn.initializers.normal(0.02),
                                     (1, 1, self.dec_dim), jnp.float32)
        self.blocks = [Block(self.dec_dim, self.heads, ln_eps=self.ln_eps,
                                compute_dtype=self.compute_dtype,
                                name=f"blocks_{i}")
                       for i in range(self.depth)]
        self.decoder_norm = LayerNormFP32(eps=self.ln_eps)

    def embed_unshuffle(self, hidden: jax.Array,
                        ids_restore: jax.Array) -> jax.Array:
        x = self.decoder_embed(hidden.astype(self.compute_dtype))
        b, kept, d = x.shape
        n_mask = ids_restore.shape[1] - kept
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (b, n_mask, d))
        x = jnp.concatenate([x, mask_tokens], axis=1)
        return jnp.take_along_axis(x, ids_restore[:, :, None], axis=1)


class VisionMAEDecoder(nn.Module):
    in_dim: int                 # encoder width (768)
    dec_dim: int                # in_dim // 2
    image_resolution: int
    patch_size: int
    depth: int = 3
    heads: int = 8
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.core = _DecoderCore(self.in_dim, self.dec_dim, self.depth,
                                 self.heads, ln_eps=1e-6,
                                 compute_dtype=self.compute_dtype,
                                 remat=self.remat)
        self.decoder_pred = nn.Dense(self.patch_size ** 2 * 3,
                                     kernel_init=xavier_uniform,
                                     dtype=self.compute_dtype,
                                     param_dtype=jnp.float32)
        grid = self.image_resolution // self.patch_size
        self.pos_embed = jnp.asarray(sincos_2d(self.dec_dim, grid,
                                               cls_token=True))

    def __call__(self, image: jax.Array, hidden: jax.Array,
                 mae_mask: jax.Array, ids_restore: jax.Array,
                 loss_allpatch: bool = False) -> jax.Array:
        """image (B,H,W,3); hidden (B,1+K,W_enc) kept tokens (CLS first);
        mae_mask/ids_restore over the (1+L)-token sequence."""
        x = self.core.embed_unshuffle(hidden, ids_restore)
        x = x + self.pos_embed.astype(x.dtype)
        for blk in self.core.blocks:
            x = blk(x)
        x = self.core.decoder_norm(x)
        pred = self.decoder_pred(x)[:, 1:, :]          # drop CLS

        target = patchify(image, self.patch_size)
        loss = jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
            axis=-1)                                    # (B, L)
        if loss_allpatch:
            return jnp.mean(loss)
        patch_mask = mae_mask[:, 1:].astype(jnp.float32)
        return jnp.sum(loss * patch_mask) / jnp.maximum(jnp.sum(patch_mask),
                                                        1.0)


class TextMAEDecoder(nn.Module):
    in_dim: int                 # text embed dim (512)
    dec_dim: int                # in_dim // 2
    seq_len: int                # max_words
    vocab_size: int
    depth: int = 3
    heads: int = 8
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.core = _DecoderCore(self.in_dim, self.dec_dim, self.depth,
                                 self.heads, ln_eps=1e-5,
                                 compute_dtype=self.compute_dtype,
                                 remat=self.remat)
        self.decoder_pred = nn.Dense(self.vocab_size,
                                     kernel_init=xavier_uniform,
                                     dtype=self.compute_dtype,
                                     param_dtype=jnp.float32)
        self.pos_embed = jnp.asarray(sinusoid_table(self.seq_len,
                                                    self.dec_dim))

    def __call__(self, input_ids: jax.Array, hidden: jax.Array,
                 recon_mask: jax.Array, ids_restore: jax.Array,
                 attention_mask: jax.Array) -> jax.Array:
        """recon_mask: bool (B, L) — positions that were MAE-masked AND are
        real tokens ((seq_mae_mask + attention_mask) > 1, modeling.py:234)."""
        x = self.core.embed_unshuffle(hidden, ids_restore)
        x = x + self.pos_embed.astype(x.dtype)
        bias = padding_bias(attention_mask)
        for blk in self.core.blocks:
            x = blk(x, bias=bias)
        x = self.core.decoder_norm(x)
        pred = self.decoder_pred(x)                    # (B, L, V)

        m = recon_mask.astype(input_ids.dtype)
        labels = input_ids * m - (1 - m)               # −1 where not scored
        return cross_entropy_ignore(pred.reshape(-1, self.vocab_size),
                                    labels.reshape(-1))
