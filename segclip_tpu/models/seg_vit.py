"""SegViT: the two-stage visual transformer with the semantic grouping
bottleneck — the heart of the model.

Behavior contract (reference modules/module_seg_vit.py):
  - `first_stage_layer` blocks run over patch tokens (CLS split off);
  - the SemanticLearner cross-attends G learnable centers over patches and
    hard-assigns every patch to one center via Gumbel straight-through
    (tau, softmax over the center axis), aggregating count-normalized group
    tokens (lines 244-314);
  - inference path: 12-first_stage blocks over the G group tokens, CLS = max
    over groups (lines 438-448);
  - MAE path (explicit `mae_path` flag here, vs. the reference's
    shape-sniffing at line 423): groups are scattered back to patch positions
    by the ReconstructLayer (316-345) and a *separate* 2-block stack
    (`layers_mae`) runs over them; CLS = mean (425-433).

Returns `mid` dict: {"hidden": patch/reconstructed features,
"hard_attn"/"soft_attn": (B, G, L) assignment maps} — the attn maps feed the
zero-shot segmentation decode and the superpixel-KL loss.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from segclip_tpu.ops.grouping import group_assign_aggregate
from segclip_tpu.ops.layers import quick_gelu
from segclip_tpu.models.layers import (GroupedLinear, LayerNormFP32,
                                       MHAttention, Mlp,
                                       ResidualAttentionBlock,
                                       trunc_normal_02)


class CrossAttentionBlock(nn.Module):
    """q += attn(ln_x(q), ln_k(kv)); q += mlp(ln_2(q))
    (module_seg_vit.py:199-218). Note ln_k normalizes the *raw* kv."""
    width: int
    heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "xla"

    def setup(self):
        self.ln_x = LayerNormFP32()
        self.ln_k = LayerNormFP32()
        self.attn = MHAttention(self.width, self.heads,
                                compute_dtype=self.compute_dtype,
                                impl=self.attention_impl)
        self.ln_2 = LayerNormFP32()
        self.mlp = Mlp(4 * self.width, self.width, act="quick_gelu",
                       compute_dtype=self.compute_dtype)

    def __call__(self, q: jax.Array, kv: jax.Array) -> jax.Array:
        q = q + self.attn(self.ln_x(q), self.ln_k(kv))
        q = q + self.mlp(self.ln_2(q))
        return q


class SemanticLearner(nn.Module):
    """Aggregates L patch tokens into `num_tokens` semantic group tokens.

    Pipeline (module_seg_vit.py:277-314): learnable centers → `cross_layer`
    cross-attention blocks with kv = [centers; raw patches] → cross_ln;
    keys/values from grouped channel mixes of the *normed* patches; group
    logits = q·k (un-scaled); Gumbel-ST hard assignment over centers;
    count-normalized value aggregation; residual-with-centers then
    ln → MLP(erf-gelu) → QuickGELU projection.
    """
    width: int
    num_tokens: int
    heads: int
    cross_layer: int = 2
    tau: float = 0.9
    compute_dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "xla"
    # "auto": fused Pallas kernel on TPU for the (deterministic) eval path —
    # bit-exact vs the jnp path and ~1.4x faster. Training defaults to the
    # jnp path: the fused forward + custom straight-through VJP exists
    # (grouping_impl="pallas") and matches jnp gradients exactly, but the
    # full-step A/B on the chip is a wash (147.0 vs 146.5 ms @ B=96 — the
    # grouping chain is ~0.5% of the step and the VJP residuals offset the
    # forward win; docs/PERF.md).
    grouping_impl: str = "auto"

    def setup(self):
        self.norm = LayerNormFP32()
        self.semantic_center = self.param("semantic_center", trunc_normal_02,
                                          (self.num_tokens, self.width),
                                          jnp.float32)
        self.cross_att = [
            CrossAttentionBlock(self.width, self.heads,
                                compute_dtype=self.compute_dtype,
                                attention_impl=self.attention_impl,
                                name=f"cross_att_{i}")
            for i in range(self.cross_layer)
        ]
        self.cross_ln = LayerNormFP32()
        self.k_conv = GroupedLinear(self.width, self.heads,
                                    compute_dtype=self.compute_dtype)
        self.k_ln = LayerNormFP32()
        self.v_conv = GroupedLinear(self.width, self.heads,
                                    compute_dtype=self.compute_dtype)
        self.proj_ln = LayerNormFP32()
        self.proj_mlp = Mlp(4 * self.width, self.width, act="gelu",
                            compute_dtype=self.compute_dtype)

    def __call__(self, inputs: jax.Array, training: bool = False,
                 gumbel_key: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """inputs: (B, L, D) → (groups (B,G,D), hard (B,G,L), soft (B,G,L),
        centers-after-cross (B,G,D))."""
        b = inputs.shape[0]
        in_feature = self.norm(inputs)

        q = jnp.broadcast_to(
            self.semantic_center.astype(self.compute_dtype)[None],
            (b, self.num_tokens, self.width))
        for blk in self.cross_att:
            kv = jnp.concatenate([q, inputs.astype(self.compute_dtype)],
                                 axis=1)
            q = blk(q, kv)
        q = self.cross_ln(q)

        k = self.k_ln(self.k_conv(in_feature))
        v = self.v_conv(in_feature)

        use_fused = (self.grouping_impl == "pallas"
                     or (self.grouping_impl == "auto" and not training
                         and jax.default_backend() == "tpu"))
        if use_fused and not training:
            from segclip_tpu.ops.pallas.grouping import fused_group_assign
            grouped, hard_attn, soft_attn = fused_group_assign(
                q, k, v, tau=self.tau, training=False)
        elif use_fused:
            # Training: fused kernel forward + hand-derived straight-through
            # VJP. Noise drawn exactly like the jnp path → same trajectory.
            from segclip_tpu.ops.pallas.grouping import fused_group_assign_st
            noise = jax.random.gumbel(
                gumbel_key, (b, self.num_tokens, inputs.shape[1]),
                jnp.float32)
            grouped, hard_attn, soft_attn = fused_group_assign_st(
                q, k, v, noise, self.tau,
                jax.default_backend() != "tpu")
        else:
            # Un-scaled affinity logits over the center axis (fp32 for the
            # softmax/Gumbel numerics).
            logits = jnp.einsum("bsd,bld->bsl", q, k,
                                preferred_element_type=jnp.float32)
            grouped, hard_attn, soft_attn = group_assign_aggregate(
                logits, v, tau=self.tau, key=gumbel_key, training=training)

        out = quick_gelu(self.proj_mlp(self.proj_ln(q + grouped)))
        return out, hard_attn, soft_attn, q


class ReconstructLayer(nn.Module):
    """Scatters G group tokens back to L patch positions through a learned
    (G, G) mix of the hard assignment (module_seg_vit.py:316-345)."""
    num_tokens: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, groups: jax.Array, hard_attn: jax.Array) -> jax.Array:
        """groups: (B, G, D); hard_attn: (B, G, L) → (B, L, D)."""
        attn = hard_attn.transpose(0, 2, 1)                     # (B, L, G)
        attn = nn.Dense(self.num_tokens, kernel_init=trunc_normal_02,
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name="rec_proj_a")(attn)                # (B, L, G)
        out = jnp.einsum("blg,bgd->bld", attn,
                         groups.astype(self.compute_dtype),
                         preferred_element_type=jnp.float32)
        return quick_gelu(out.astype(self.compute_dtype))


class SegViT(nn.Module):
    """Two-stage ViT over a (B, 1+L, D) token sequence (CLS first)."""
    width: int
    layers: int = 12
    first_stage_layer: int = 10
    group_num: int = 8
    cross_layer: int = 2
    tau: float = 0.9
    compute_dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "xla"
    remat: bool = False
    grouping_impl: str = "auto"

    def setup(self):
        Block = (nn.remat(ResidualAttentionBlock) if self.remat
                 else ResidualAttentionBlock)
        heads = self.width // 64
        second = self.layers - self.first_stage_layer
        self.layers0 = [
            Block(self.width, heads,
                                   compute_dtype=self.compute_dtype,
                                   attention_impl=self.attention_impl,
                                   name=f"layers0_{i}")
            for i in range(self.first_stage_layer)
        ]
        self.semantic_layer2 = SemanticLearner(
            self.width, self.group_num, heads, cross_layer=self.cross_layer,
            tau=self.tau, compute_dtype=self.compute_dtype,
            attention_impl=self.attention_impl,
            grouping_impl=self.grouping_impl)
        self.layers2 = [
            Block(self.width, heads,
                                   compute_dtype=self.compute_dtype,
                                   attention_impl=self.attention_impl,
                                   name=f"layers2_{i}")
            for i in range(second)
        ]
        self.layers_mae2 = [
            Block(self.width, heads,
                                   compute_dtype=self.compute_dtype,
                                   attention_impl=self.attention_impl,
                                   name=f"layers_mae2_{i}")
            for i in range(second)
        ]
        self.reconstruct_layer2 = ReconstructLayer(
            self.group_num, compute_dtype=self.compute_dtype)

    def _touch_other_branch(self, x: jax.Array, mae_path: bool) -> None:
        x_ = x[:, 1:]
        sx, hard_attn, _, _ = self.semantic_layer2(x_, training=False)
        if mae_path:
            for blk in self.layers2:
                sx = blk(sx)
        else:
            rx = self.reconstruct_layer2(sx, hard_attn)
            for blk in self.layers_mae2:
                rx = blk(rx)

    def __call__(self, x: jax.Array, mae_path: bool = False,
                 training: bool = False,
                 gumbel_key: Optional[jax.Array] = None):
        """Returns (tokens, mid) where tokens is (B, 1+G, D) on the grouping
        path or (B, 1+L_kept, D) on the MAE path."""
        if self.is_initializing():
            # Trace the branch not taken so every parameter (layers2 /
            # layers_mae2 / reconstruct) exists after a single init call.
            self._touch_other_branch(x, mae_path)

        cls, x_ = x[:, :1], x[:, 1:]

        for blk in self.layers0:
            x_ = blk(x_)

        mid = {"hidden": None, "hard_attn": None, "soft_attn": None}

        if mae_path:
            sx, hard_attn, _, _ = self.semantic_layer2(
                x_, training=training, gumbel_key=gumbel_key)
            x_ = self.reconstruct_layer2(sx, hard_attn)
            for blk in self.layers_mae2:
                x_ = blk(x_)
            mid["hidden"] = x_
            cls = jnp.mean(x_, axis=1, keepdims=True)
            x = jnp.concatenate([cls, x_], axis=1)
        else:
            mid["hidden"] = x_
            gx, hard_attn, soft_attn, _ = self.semantic_layer2(
                x_, training=training, gumbel_key=gumbel_key)
            for blk in self.layers2:
                gx = blk(gx)
            cls = jnp.max(gx, axis=1, keepdims=True)
            x = jnp.concatenate([cls, gx], axis=1)
            mid["hard_attn"] = hard_attn
            mid["soft_attn"] = soft_attn

        return x, mid
