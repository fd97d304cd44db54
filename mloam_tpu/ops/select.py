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


def compact_stride(values: jnp.ndarray, mask: jnp.ndarray, cap: int,
                   fill=0.0):
    """[N, ...] -> ([cap, ...], mask [cap]) without any sort.

    Valid rows are scattered to the front by their cumsum rank (stable), and
    when more than ``cap`` are valid an even stride over the compacted rows
    is taken. Replaces sort-based compaction on latency-critical paths: a
    full-range-image argsort (~29k rows) is ~200 serial bitonic stages,
    while cumsum+scatter is O(log n) depth.
    """
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, rank, n)  # out-of-bounds rows are dropped
    buf = jnp.full((n,) + values.shape[1:], fill, values.dtype)
    buf = buf.at[dest].set(values, mode="drop")
    num = jnp.sum(mask.astype(jnp.int32))
    ar = jnp.arange(cap, dtype=jnp.int32)
    strided = _even_stride(ar, num, cap)
    sel = jnp.where(num <= cap, ar, strided)
    out_mask = ar < jnp.minimum(num, cap)
    shape = (cap,) + (1,) * (values.ndim - 1)
    return jnp.where(out_mask.reshape(shape), buf[sel], fill), out_mask


def _even_stride(ar: jnp.ndarray, num: jnp.ndarray, cap: int) -> jnp.ndarray:
    """floor(ar * num / cap) in exact integer arithmetic.

    f32 would lose integer precision once ar*num exceeds ~2^24 (silent
    duplicated/skipped source rows); int64 is unavailable without jax's
    x64 flag. Split the product instead: ar*num = (ar*q)*cap + ar*r with
    q, r = divmod(num, cap), so floor(ar*num/cap) = ar*q + (ar*r)//cap.
    ar*q <= num < 2^31; ar*r < cap^2 <= 2^32 is computed in uint32 (exact
    for the cap <= 65536 capacities used here).
    """
    assert cap <= 65536, "even-stride exactness requires cap <= 2^16"
    q, r = num // cap, num % cap
    frac = (ar.astype(jnp.uint32) * r.astype(jnp.uint32)
            ) // jnp.uint32(cap)
    return ar * q + frac.astype(jnp.int32)


def compact_gather_indices(mask: jnp.ndarray, cap: int):
    """Gather plan for compaction: (src_idx [cap], out_mask [cap]).

    Gathering any [N, ...] array with ``src_idx`` (and masking rows by
    ``out_mask``) yields the first-``cap`` valid rows front-compacted by
    rank; when more than ``cap`` rows are valid, an even stride over the
    compacted order is taken (same semantics as :func:`compact_stride`).
    One plan can compact every field of a correspondence struct with a
    single consistent permutation.
    """
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, rank, n)
    src = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    num = jnp.sum(mask.astype(jnp.int32))
    ar = jnp.arange(cap, dtype=jnp.int32)
    strided = _even_stride(ar, num, cap)
    sel = jnp.where(num <= cap, ar, strided)
    out_mask = ar < jnp.minimum(num, cap)
    return src[jnp.clip(sel, 0, n - 1)], out_mask


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
