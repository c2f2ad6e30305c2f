"""MAE-style per-sample random masking via argsort-of-noise.

Reproduces the semantics of the reference random_masking
(module_clip_util.py:91-124): draw uniform noise per position, pin kept
positions (CLS / EOT) to -1 so they sort first, keep the lowest-noise
`len_keep` positions.

Note on the reference's keep_sep: the reference scatters `sep_pos` with a
(1, N) index, which writes only batch row 0 (an upstream bug). We implement
the documented *intent* — pin each sample's own EOT position — since that is
what keep_sep exists for; parity tests inject noise explicitly.

JAX-native: noise comes from a threaded PRNG key (or is injected for tests);
gathers are static-shape so everything jits.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def random_masking(
    x: jax.Array,
    mask_ratio: float,
    key: Optional[jax.Array] = None,
    keep_cls: bool = False,
    keep_sep: bool = False,
    sep_pos: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (x_masked, mask, ids_restore, ids_keep).

    x: (N, L, D). mask: (N, L) with 0=keep, 1=removed (unshuffled order).
    ids_restore: (N, L) inverse permutation; ids_keep: (N, len_keep).
    `noise` overrides the PRNG draw (for deterministic tests).
    """
    n, length, _ = x.shape
    len_keep = int(length * (1 - mask_ratio))

    if noise is None:
        if key is None:
            raise ValueError("random_masking needs a PRNG key or explicit noise")
        noise = jax.random.uniform(key, (n, length))

    if keep_cls:
        noise = noise.at[:, 0].set(-1.0)
    if keep_sep:
        if sep_pos is None:
            raise ValueError("keep_sep requires sep_pos")
        noise = jax.vmap(lambda row, pos: row.at[pos].set(-1.0))(noise, sep_pos)

    ids_shuffle = jnp.argsort(noise, axis=1)          # ascending: small = keep
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

    mask = jnp.ones((n, length), dtype=x.dtype)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)

    return x_masked, mask, ids_restore, ids_keep
