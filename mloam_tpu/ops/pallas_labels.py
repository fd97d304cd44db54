"""Pallas TPU kernel: fused connected-component label propagation on the
range image.

The XLA segmentation path (frontend/segmentation.py) lowers each round of
row/column segmented min-scans to ~30 small ``associative_scan`` kernels
per sweep — pure dispatch/HBM overhead for a [16, 1800] image that fits in
a handful of vector registers. This kernel runs the whole propagation (all
rounds, both axes, azimuth wrap) in ONE dispatch, entirely in VMEM:

  * segmented min-scans become Hillis-Steele log-doubling with circular
    lane rolls (``pltpu.roll``): 11 steps cover a 1920-column ring;
  * the column pass rolls along sublanes (4 steps for 16 rings);
  * azimuth wrap (col C-1 <-> col 0) is a stitch step before each round:
    if connected, both columns take the min of the two labels, and the
    following scans propagate it through the runs.

Semantics match ``segmentation._segmented_min_scan`` iteration (the
label-propagation replacement for the reference's BFS,
image_segmenter.hpp:226-358).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _seg_min_scan_ring(lab, reset, axis: int, steps: int):
    """Bidirectional segmented min over runs on a ring (log-doubling).

    reset[i] (int32 0/1 — Mosaic cannot rotate i1 vectors) marks a boundary
    between element i-1 and i along ``axis``.
    """
    n = lab.shape[axis]

    def sweep(v, f, sign):
        for j in range(steps):
            s = (sign * (1 << j)) % n  # pltpu.roll wants shift >= 0
            v_s = pltpu.roll(v, s, axis=axis)
            f_s = pltpu.roll(f, s, axis=axis)
            v = jnp.where(f > 0, v, jnp.minimum(v, v_s))
            f = f | f_s
        return v

    fwd = sweep(lab, reset, +1)
    # backward: boundary between i and i+1 sits at reset[i+1]
    reset_b = pltpu.roll(reset, (n - 1) % n, axis=axis)
    bwd = sweep(lab, reset_b, -1)
    return jnp.minimum(fwd, bwd)


def _label_kernel(lab_ref, ch_ref, cv_ref, out_ref, *, rounds: int,
                  n_cols: int):
    """ch[r, c]: col c connected to col c-1 (c=0 entry holds the azimuth
    wrap connectivity C-1<->0). cv[r, c]: row r connected to row r-1
    (row 0 must be 0). Padded columns must be disconnected."""
    lab0 = lab_ref[:]
    ch = ch_ref[:]
    cv = cv_ref[:]
    r, cp = lab0.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, cp), 1)
    wrap = ch[:, 0:1] > 0
    # scans treat col 0 as a boundary; wrap is handled by the stitch.
    # int32 flags throughout (Mosaic cannot rotate i1 vectors).
    reset_h = jnp.where((ch > 0) & (col > 0), 0, 1).astype(jnp.int32)
    reset_v = jnp.where(cv > 0, 0, 1).astype(jnp.int32)
    h_steps = max(int(cp - 1).bit_length(), 1)
    v_steps = max(int(r - 1).bit_length(), 1)

    def stitch(lab):
        # exchange minima across the azimuth seam (C-1 <-> 0)
        m = jnp.minimum(lab[:, 0:1], lab[:, n_cols - 1:n_cols])
        lab = jnp.where((col == 0) & wrap, m, lab)
        return jnp.where((col == n_cols - 1) & wrap, m, lab)

    def one_round(_, lab):
        # row scan, seam exchange on fresh values, row scan again so the
        # crossing propagates this round (mirrors the XLA path's plain +
        # half-rolled row passes), then the column pass
        lab = _seg_min_scan_ring(lab, reset_h, axis=1, steps=h_steps)
        lab = stitch(lab)
        lab = _seg_min_scan_ring(lab, reset_h, axis=1, steps=h_steps)
        lab = _seg_min_scan_ring(lab, reset_v, axis=0, steps=v_steps)
        return lab

    out_ref[:] = jax.lax.fori_loop(0, rounds, one_round, lab0)


@functools.partial(jax.jit, static_argnames=("rounds",))
def propagate_labels_pallas(labels: jnp.ndarray, conn_h: jnp.ndarray,
                            conn_v: jnp.ndarray, rounds: int = 3):
    """labels [R, C] int32; conn_h/conn_v [R, C] bool per the kernel
    contract above. Returns converged labels [R, C]."""
    r, c = labels.shape
    cp = -(-c // _LANES) * _LANES
    pad = ((0, 0), (0, cp - c))
    big = jnp.int32(r * c)
    lab = jnp.pad(labels, pad, constant_values=big)
    ch = jnp.pad(conn_h.astype(jnp.int32), pad)
    cv = jnp.pad(conn_v.astype(jnp.int32), pad)

    out = pl.pallas_call(
        functools.partial(_label_kernel, rounds=rounds, n_cols=c),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, cp), jnp.int32),
    )(lab, ch, cv)
    return out[:, :c]
