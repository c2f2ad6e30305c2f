"""Class-name text-embedding bank.

Equivalent of build_seg_inference's one-time text encoding
(seg_segmentation/evaluation/builder.py:46-79): tokenize template×class
prompts, encode, mean over templates, then L2-normalize (normalize AFTER the
mean, matching builder.py:65-66).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from segclip_tpu.data.tokenizer import default_tokenizer
from segclip_tpu.evalseg.templates import TEMPLATE_SETS


def build_text_bank(model, params, classnames: Sequence[str],
                    template_set: str = "simple",
                    context_length: int = 77) -> jax.Array:
    """Returns (num_classes, embed_dim) normalized fp32 embeddings."""
    templates = TEMPLATE_SETS[template_set]
    tok = default_tokenizer()
    prompts = [t.format(name) for name in classnames for t in templates]
    ids = tok.batch_tokenize(prompts, context_length)

    @jax.jit
    def encode(p, ids):
        return model.apply({"params": p}, ids,
                           method=lambda m, t: m.encode_text(
                               t, training=False)).pooled

    emb = encode(params, jnp.asarray(ids)).astype(jnp.float32)
    emb = emb.reshape(len(classnames), len(templates), -1).mean(axis=1)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
