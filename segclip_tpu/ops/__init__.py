"""Pure-function numerics: attention, grouping, masking, position embeddings.

These are the TPU-native equivalents of the reference's third-party native
layers (cuDNN under nn.MultiheadAttention / Conv2d). Everything here is
jit-traceable, static-shape, and bf16-friendly with fp32 accumulation.
"""
from segclip_tpu.ops.layers import layer_norm, quick_gelu
from segclip_tpu.ops.attention import multi_head_attention, causal_mask, padding_bias
from segclip_tpu.ops.masking import random_masking
from segclip_tpu.ops.grouping import gumbel_softmax, group_assign_aggregate
