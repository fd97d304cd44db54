"""Masked selection primitives: top-k under masks, sector partitioning.

These back the feature-extraction picking rules of the reference
(``feature_extract.cpp:152-272``: per-ring 6 sectors, sort by curvature, pick
bounded counts with neighbor suppression) in fixed-shape form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_BIG = -1e30
BIG = 1e30


def masked_top_k(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Largest-k scores among masked entries.

    Returns (values [.., k], idx [.., k], valid [.., k]). Invalid slots carry
    NEG_BIG values.
    """
    s = jnp.where(mask, scores, NEG_BIG)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx, vals > NEG_BIG / 2


def masked_bottom_k(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    vals, idx, valid = masked_top_k(-scores, mask, k)
    return -vals, idx, valid


def compact_by_mask(values: jnp.ndarray, mask: jnp.ndarray, fill=0.0):
    """Stable-compact masked rows to the front; returns (values, new_mask).

    Uses argsort on (!mask, index) so relative order is preserved.
    """
    n = mask.shape[0]
    order = jnp.argsort(jnp.where(mask, jnp.arange(n), n + jnp.arange(n)))
    out = values[order]
    new_mask = mask[order]
    shape = (n,) + (1,) * (values.ndim - 1)
    return jnp.where(new_mask.reshape(shape), out, fill), new_mask
