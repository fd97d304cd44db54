"""Correspondence search without kd-trees.

The reference builds PCL kd-trees for every matching step (scan-to-scan:
``feature_extract.hpp:132-376``; scan-to-map kNN: ``feature_extract.hpp:
379-643``). On TPU we replace trees with dense distance computations that map
onto the MXU: ||a-b||² = ||a||² + ||b||² - 2a·b, i.e. one matmul per
(query, reference) tile, reduced with top-k. For map-scale reference sets the
matmul is chunked over the reference axis with a running top-k merge so VMEM
stays bounded and XLA pipelines HBM reads.

All inputs are fixed-capacity padded arrays with boolean masks; masked-out
reference points get +inf distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30


def pairwise_sqdist(q: jnp.ndarray, r: jnp.ndarray,
                    center: jnp.ndarray | None = None) -> jnp.ndarray:
    """[Nq,D]x[Nr,D] -> [Nq,Nr] squared distances (MXU-friendly form).

    TPU numerics: the ||q||²+||r||²-2q·r expansion catastrophically cancels
    when ||q-r|| << ||q||, and the MXU's default bf16 matmul makes this fatal
    at LiDAR ranges (all distances collapse to 0 at ~10 m). We therefore
    (a) recenter both sets to the reference mean so coordinates are small and
    (b) force float32 accumulation with Precision.HIGHEST.
    """
    if center is None:
        center = jnp.mean(r, axis=0)
    q = q - center
    r = r - center
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1, keepdims=True).T
    cross = jnp.dot(q, r.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return jnp.maximum(qq + rr - 2.0 * cross, 0.0)


def knn(
    q: jnp.ndarray,
    r: jnp.ndarray,
    r_mask: jnp.ndarray,
    k: int,
    chunk: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest reference points for each query.

    Returns (dists [Nq,k] squared, idx [Nq,k] into r). Chunked over the
    reference axis: each step computes a [Nq, chunk] distance tile and merges
    it into the running best-k via a single top-k over 2k candidates.
    """
    nq = q.shape[0]
    nr = r.shape[0]
    dim = r.shape[1]
    if nr < k:  # tiny reference sets: pad so top_k is well-defined
        pad = k - nr
        r = jnp.pad(r, ((0, pad), (0, 0)))
        r_mask = jnp.pad(r_mask, (0, pad))
        nr = k
    if nr <= chunk:
        d = pairwise_sqdist(q, r)
        d = jnp.where(r_mask[None, :], d, _BIG)
        if nr >= 1024:
            # TPU-optimized partial reduction (exact top_k lowers to a
            # bitonic sort over the whole row — a hot spot at map sizes)
            neg, idx = jax.lax.approx_max_k(-d, k, recall_target=0.95)
        else:
            neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    # chunks are reduced in PARALLEL (batched per-chunk approx top-k, one
    # final merge) — a serial scan over chunks puts 3-4 dependent
    # matmul+top-k stages on the critical path of the per-sweep program,
    # which costs more latency than the extra [nchunks, nq, k] candidates
    # buffer (a few hundred KB) saves in VMEM.
    nchunks = (nr + chunk - 1) // chunk
    pad = nchunks * chunk - nr
    r_p = jnp.pad(r, ((0, pad), (0, 0)))
    m_p = jnp.pad(r_mask, (0, pad))
    r_c = r_p.reshape(nchunks, chunk, dim)
    m_c = m_p.reshape(nchunks, chunk)
    center = jnp.mean(r, axis=0)

    def per_chunk(rc, mc):
        d = pairwise_sqdist(q, rc, center=center)
        d = jnp.where(mc[None, :], d, _BIG)
        neg, idx = jax.lax.approx_max_k(-d, k, recall_target=0.95)
        return -neg, idx

    cd, ci = jax.vmap(per_chunk)(r_c, m_c)          # [nchunks, nq, k]
    bases = (jnp.arange(nchunks, dtype=jnp.int32) * chunk)[:, None, None]
    cand_d = jnp.moveaxis(cd, 0, 1).reshape(nq, nchunks * k)
    cand_i = jnp.moveaxis(ci + bases, 0, 1).reshape(nq, nchunks * k)
    neg2, sel = jax.lax.top_k(-cand_d, k)
    best_i = jnp.take_along_axis(cand_i, sel, axis=1)
    return -neg2, best_i


def knn_auto(q, r, r_mask, k: int, chunk: int = 4096):
    """k-NN entry point for the matchers (solver/factors.py).

    Measured head-to-head INSIDE the fused per-sweep program on a v5e
    (BENCH_NOTES round-1 log), the XLA matmul+approx_max_k path beats both
    Pallas kernel variants (ops/pallas_knn) at every pipeline shape —
    XLA fuses the distance computation into the approx reduction without
    materializing the distance matrix, and its bucketed top-k maps to the
    same lane structure. The Pallas kernel remains available (and tested)
    for standalone use / future revisit on newer hardware; isolated
    microbenchmarks through the axon tunnel are NOT trustworthy evidence
    either way (submission fan-out + eager-op poisoning, BENCH_NOTES)."""
    return knn(q, r, r_mask, k, chunk)


def nearest(q, r, r_mask, chunk: int = 4096):
    d, i = knn(q, r, r_mask, 1, chunk)
    return d[:, 0], i[:, 0]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_jit(q, r, r_mask, k: int, chunk: int = 4096):
    return knn(q, r, r_mask, k, chunk)
