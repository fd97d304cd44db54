"""Pallas TPU kernel: fused brute-force 1-NN correspondence search.

SURVEY §7.4 ranks NN correspondence as the make-or-break kernel. The XLA
path (ops/knn.py) materializes a [Nq, chunk] distance tile in HBM between
the matmul and the top-k; this Pallas kernel keeps each distance tile in
VMEM and folds the running minimum in-register — one pass over the
reference set per query tile, no distance matrix ever leaving VMEM.

Grid: (query_tiles,) with the full reference resident (streamed per tile by
the implicit pipeline). Each program:
  - loads a [TQ, 3] query tile and iterates reference tiles [TR, 3]
  - computes the [TQ, TR] squared-distance tile on the MXU
    (f32 accumulation — see ops/knn.py on bf16 cancellation)
  - updates the running (min distance, argmin index) with a masked select

Returns exact 1-NN (distances², indices); falls back to the XLA path
off-TPU. Mosaic note: 1-D f32 outputs must tile at 1024 to match the XLA
layout (T(1024)) — hence the 1024 default query tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _nn_kernel(q_ref, r_ref, rmask_ref, d_ref, i_ref, *, tr: int, n_r: int):
    q = q_ref[:]                               # [TQ, 3] VMEM
    tq = q.shape[0]
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # [TQ, 1]

    n_tiles = n_r // tr

    def body(t, carry):
        best_d, best_i = carry
        r = r_ref[pl.ds(t * tr, tr), :]        # [TR, 3]
        m = rmask_ref[pl.ds(t * tr, tr)]       # [TR]
        rr = jnp.sum(r * r, axis=-1)[None, :]  # [1, TR]
        cross = jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                       # [TQ, TR]
        d = qq + rr - 2.0 * cross
        d = jnp.where(m[None, :] > 0, d, _BIG)
        tile_min = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + t * tr
        take = tile_min < best_d
        return (
            jnp.where(take, tile_min, best_d),
            jnp.where(take, tile_arg, best_i),
        )

    init = (jnp.full((tq,), _BIG, jnp.float32), jnp.zeros((tq,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    d_ref[:] = jnp.maximum(best_d, 0.0)
    i_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("tq", "tr"))
def nearest_pallas(q: jnp.ndarray, r: jnp.ndarray, r_mask: jnp.ndarray,
                   tq: int = 1024, tr: int = 1024):
    """Exact 1-NN: (d² [Nq], idx [Nq]) of each query in the reference set.

    Shapes are padded up to tile multiples; masked/padded reference points
    can never win (distance forced to +inf).
    """
    nq, _ = q.shape
    nr = r.shape[0]
    nq_p = -(-nq // tq) * tq
    nr_p = -(-nr // tr) * tr
    qp = jnp.pad(q, ((0, nq_p - nq), (0, 0)))
    rp = jnp.pad(r, ((0, nr_p - nr), (0, 0)))
    mp = jnp.pad(r_mask.astype(jnp.float32), (0, nr_p - nr))

    # recenter (see ops/knn.py: bf16/cancellation discipline)
    center = jnp.sum(rp * mp[:, None], 0) / jnp.maximum(jnp.sum(mp), 1.0)
    qp = qp - center
    rp = rp - center

    d, i = pl.pallas_call(
        functools.partial(_nn_kernel, tr=tr, n_r=nr_p),
        grid=(nq_p // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr_p, 3), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr_p,), lambda g: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq,), lambda g: (g,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p,), jnp.float32),
            jax.ShapeDtypeStruct((nq_p,), jnp.int32),
        ],
    )(qp, rp, mp)
    return d[:nq], i[:nq]


def nearest(q, r, r_mask):
    """1-NN with automatic backend choice (Pallas on TPU, XLA elsewhere)."""
    if jax.devices()[0].platform == "tpu":
        return nearest_pallas(q, r, r_mask)
    from mloam_tpu.ops import knn as knn_ops

    d, i = knn_ops.knn(q, r, r_mask, 1)
    return d[:, 0], i[:, 0]
