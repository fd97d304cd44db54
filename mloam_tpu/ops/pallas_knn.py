"""Pallas TPU kernel: fused brute-force nearest-neighbor correspondence.

SURVEY §7.4 ranks NN correspondence as the make-or-break kernel. The XLA
path (ops/knn.py) materializes [Nq, chunk] distance tiles in HBM between
the matmul and the top-k; this kernel keeps every distance tile in VMEM
and folds the reduction in-register — one pass over the reference set per
query tile, no distance matrix ever leaving the chip.

Layout (the whole trick):

  * The reference set is stored TRANSPOSED and augmented: ``r_aug[4, NR]``
    holds x/y/z rows plus a precomputed ``||r||²`` row. A ``[NR, 3]`` f32
    array in VMEM pads its 3-lane minor dim to 128 lanes (42x waste — a
    64k-point map would need 32 MB); ``[4, NR]`` pads sublanes 4→8 only.
  * k-NN is bucketed with **bucket = lane**: reference point ``o`` belongs
    to bucket ``o % 128``. The per-bucket running minimum over the whole
    reference is then a pure ELEMENTWISE min of the [TQ, 128] lane slices
    of each distance tile — no lane reductions, no relayouts, no
    permutation (the natural storage order already interleaves spatially
    adjacent points — which are adjacent in the voxel-sorted map — across
    lanes). The kernel tracks, per (query, lane), the winning distance and
    the winning 128-point *segment* id; the final k-of-128 selection and
    index reconstruction run outside on the tiny [Nq, 128] result.
  * Masked reference points are displaced to +2e4 m before the kernel so
    they can never win; the wrapper restores the XLA path's contract
    (distance ``_BIG``, index clipped) afterwards.
  * f32 + Precision.HIGHEST + recentering: the ||q||²+||r||²-2q·r
    expansion catastrophically cancels in bf16 at LiDAR ranges
    (see ops/knn.py).

Exact for k=1 (the true nearest always wins its lane). For k>1 a true
neighbor is lost only when two of the true top-k collide in one of the 128
lane buckets (rare; replacement is the next-nearest in that lane, so
acceptance gates using d[:, k-1] only become stricter — like
``lax.approx_max_k`` recall semantics).

Replaces the reference's PCL kd-trees (feature_extract.hpp:132-643).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_FAR = 2e4       # displacement for masked/padded reference points (meters)
_KNOCK = 1e12    # must exceed any real or displaced distance (~1.6e9)
_LANES = 128


def _lane_bucket_kernel(q_ref, r_ref, d_ref, s_ref, *, tr: int, n_r: int):
    """Per-lane-bucket running minima over all reference tiles for one
    query tile. Outputs [TQ, 128] best distances and segment ids
    (reference index = segment * 128 + lane)."""
    q = q_ref[:]                                   # [TQ, 3]
    tq = q.shape[0]
    qq = jnp.sum(q * q, axis=-1, keepdims=True)    # [TQ, 1]
    segs_per_tile = tr // _LANES
    n_tiles = n_r // tr

    def body(t, carry):
        best_d, best_s = carry                     # [TQ, 128] each
        off = pl.multiple_of(t * tr, tr)
        rt = r_ref[0:3, pl.ds(off, tr)]            # [3, TR]
        rr = r_ref[3:4, pl.ds(off, tr)]            # [1, TR]
        cross = jax.lax.dot_general(
            q, rt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # [TQ, TR]
        d = qq + rr - 2.0 * cross
        for g in range(segs_per_tile):
            dg = d[:, g * _LANES:(g + 1) * _LANES]  # [TQ, 128] static slice
            s = t * segs_per_tile + g
            take = dg < best_d
            best_d = jnp.where(take, dg, best_d)
            best_s = jnp.where(take, s, best_s)
        return best_d, best_s

    init = (jnp.full((tq, _LANES), _KNOCK, jnp.float32),
            jnp.zeros((tq, _LANES), jnp.int32))
    best_d, best_s = jax.lax.fori_loop(0, n_tiles, body, init)
    d_ref[:] = jnp.maximum(best_d, 0.0)
    s_ref[:] = best_s


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr"))
def knn_pallas(q: jnp.ndarray, r: jnp.ndarray, r_mask: jnp.ndarray,
               k: int, tq: int = 256, tr: int = 2048):
    """Lane-bucketed k-NN: (d² [Nq,k] ascending, idx [Nq,k] into r)."""
    assert k <= _LANES
    nq, dim = q.shape
    assert dim == 3, "pallas knn is specialized to 3-D points"
    nr = r.shape[0]
    nq_p = -(-nq // tq) * tq
    nr_p = -(-nr // tr) * tr

    # recenter for f32 accuracy, then displace masked + padded points
    valid = r_mask.astype(jnp.float32)
    center = jnp.sum(r * valid[:, None], 0) / jnp.maximum(jnp.sum(valid), 1.0)
    qp = jnp.pad(q - center, ((0, nq_p - nq), (0, 0)))
    rc = jnp.where(r_mask[:, None], r - center, _FAR)
    rc = jnp.pad(rc, ((0, nr_p - nr), (0, 0)), constant_values=_FAR)
    r_aug = jnp.concatenate(
        [rc.T, jnp.sum(rc * rc, axis=1)[None, :]], axis=0
    )                                               # [4, NR_p]

    bd, bs = pl.pallas_call(
        functools.partial(_lane_bucket_kernel, tr=tr, n_r=nr_p),
        grid=(nq_p // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nr_p), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, _LANES), jnp.int32),
        ],
    )(qp, r_aug)

    bd, bs = bd[:nq], bs[:nq]
    neg, lane = jax.lax.top_k(-bd, k)              # tiny: [Nq, 128] -> k
    d = -neg
    idx = jnp.take_along_axis(bs, lane, axis=1) * _LANES + lane
    ok = (idx < nr) & (d < _KNOCK * 0.5)
    idx = jnp.clip(idx, 0, nr - 1)
    ok = ok & r_mask[idx]
    return jnp.where(ok, d, _BIG), idx


def knn(q, r, r_mask, k: int):
    """k-NN with automatic backend choice (Pallas on TPU for 3-D points,
    XLA elsewhere)."""
    if jax.devices()[0].platform == "tpu" and q.shape[-1] == 3 \
            and r.shape[0] >= 256:
        return knn_pallas(q, r, r_mask, k)
    from mloam_tpu.ops import knn as knn_ops

    return knn_ops.knn(q, r, r_mask, k)


def nearest(q, r, r_mask):
    """1-NN with automatic backend choice (exact on both backends)."""
    d, i = knn(q, r, r_mask, 1)
    return d[:, 0], i[:, 0]
