"""Scan Context place recognition, batched.

Counterpart of the reference's ``SCManager`` (``mloam_loop/src/
scan_context.cpp`` + vendored nanoflann): polar-grid max-height descriptor
(``makeScancontext`` :55-101), ring-key / sector-key reductions, ring-key
kd-tree candidate search, and column-shift cosine distance with yaw recovery
(``distanceBtnScanContext``, ``detectLoopClosureID`` :191-268).

TPU form: the descriptor is one scatter-max; candidate search is a single
ring-key distance matmul over the whole database (no tree — at <= a few
thousand keyframes the dense form is faster than any tree walk); the
column-shift distance evaluates ALL S rotations of ALL N candidates as one
gather + einsum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.config import LoopConfig


class ScanContextDB(NamedTuple):
    desc: jnp.ndarray      # [K, R, S] descriptors
    ring_key: jnp.ndarray  # [K, R]
    valid: jnp.ndarray     # [K]
    head: jnp.ndarray      # scalar int32


def empty_db(capacity: int, cfg: LoopConfig) -> ScanContextDB:
    return ScanContextDB(
        desc=jnp.zeros((capacity, cfg.sc_num_rings, cfg.sc_num_sectors)),
        ring_key=jnp.zeros((capacity, cfg.sc_num_rings)),
        valid=jnp.zeros((capacity,), bool),
        head=jnp.asarray(0, jnp.int32),
    )


def make_descriptor(xyz: jnp.ndarray, mask: jnp.ndarray,
                    cfg: LoopConfig) -> jnp.ndarray:
    """[N, 3] sensor/base-frame points -> [R, S] max-height polar grid.

    Height uses z + 2.0 like the reference (lidar mount offset so heights
    stay positive; scan_context.cpp:60).
    """
    r_bins, s_bins = cfg.sc_num_rings, cfg.sc_num_sectors
    rho = jnp.linalg.norm(xyz[:, :2], axis=-1)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi)
    ring = jnp.floor(rho / cfg.sc_max_radius * r_bins).astype(jnp.int32)
    sector = jnp.floor((theta + jnp.pi) / (2 * jnp.pi) * s_bins).astype(jnp.int32)
    ok = mask & (rho < cfg.sc_max_radius)
    ring = jnp.clip(ring, 0, r_bins - 1)
    sector = jnp.clip(sector, 0, s_bins - 1)
    flat = ring * s_bins + sector
    z = jnp.where(ok, xyz[:, 2] + 2.0, -jnp.inf)
    grid = jnp.full((r_bins * s_bins,), -jnp.inf).at[flat].max(z)
    grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
    return grid.reshape(r_bins, s_bins)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Rotation-invariant ring key: per-ring occupancy mean ([..., R])."""
    return jnp.mean((desc != 0.0).astype(desc.dtype), axis=-1)


def add(db: ScanContextDB, desc: jnp.ndarray) -> ScanContextDB:
    k = db.valid.shape[0]
    i = db.head % k
    return ScanContextDB(
        desc=db.desc.at[i].set(desc),
        ring_key=db.ring_key.at[i].set(ring_key(desc)),
        valid=db.valid.at[i].set(True),
        head=db.head + 1,
    )


def _shifted_cosine_dist(q: jnp.ndarray, cands: jnp.ndarray):
    """Min-over-column-shift scan-context distance.

    q [R, S]; cands [N, R, S]. Returns (dist [N], shift [N]).
    Distance = 1 - mean_j cos(q_col_j, cand_col_{j+shift}) over non-empty
    column pairs (distanceBtnScanContext, scan_context.cpp:103-145).
    """
    r, s = q.shape
    # all S rotations of the query columns: rolled[k, :, j] = q[:, (j+k) % S]
    j = jnp.arange(s)
    k = jnp.arange(s)
    rolled = jnp.transpose(
        q[:, (j[None, :] + k[:, None]) % s], (1, 0, 2)
    )                                                      # [S, R, S]
    qn = jnp.linalg.norm(rolled, axis=1)                   # [S, S] col norms
    cn = jnp.linalg.norm(cands, axis=1)                    # [N, S]
    dots = jnp.einsum("krs,nrs->nks", rolled, cands)       # [N, S, S]
    denom = qn[None, :, :] * cn[:, None, :]
    cos = jnp.where(denom > 1e-9, dots / jnp.maximum(denom, 1e-9), 0.0)
    both = (qn[None, :, :] > 1e-9) & (cn[:, None, :] > 1e-9)
    n_valid = jnp.maximum(jnp.sum(both, axis=-1), 1)
    sim = jnp.sum(jnp.where(both, cos, 0.0), axis=-1) / n_valid  # [N, S]
    dist = 1.0 - sim
    best = jnp.argmin(dist, axis=-1)
    return jnp.take_along_axis(dist, best[:, None], 1)[:, 0], best


class LoopCandidate(NamedTuple):
    index: jnp.ndarray   # scalar int32 db index (into the ring)
    dist: jnp.ndarray    # scan-context distance
    yaw: jnp.ndarray     # recovered yaw offset (radians)
    found: jnp.ndarray   # bool


def detect(db: ScanContextDB, desc: jnp.ndarray, cfg: LoopConfig,
           exclude_after: jnp.ndarray | None = None) -> LoopCandidate:
    """Query the database with one descriptor.

    ``exclude_after``: db entries with insertion id >= this are skipped
    (NUM_EXCLUDE_RECENT semantics — recency is the caller's insertion
    order). Returns the best candidate below sc_dist_threshold.
    """
    k = db.valid.shape[0]
    ids = jnp.arange(k)
    # entry age: with a ring cursor, the insertion id of slot i is
    # head - 1 - ((head - 1 - i) % k) for valid slots
    last = db.head - 1
    ins_id = last - ((last - ids) % k)
    ok = db.valid
    if exclude_after is not None:
        ok = ok & (ins_id < exclude_after)

    qk = ring_key(desc)
    d_rk = jnp.sum((db.ring_key - qk[None, :]) ** 2, axis=-1)
    d_rk = jnp.where(ok, d_rk, jnp.inf)
    n_cand = min(cfg.num_candidates, k)
    neg, cand_idx = jax.lax.top_k(-d_rk, n_cand)
    cand_ok = jnp.isfinite(-neg)

    dist, shift = _shifted_cosine_dist(desc, db.desc[cand_idx])
    dist = jnp.where(cand_ok, dist, jnp.inf)
    best = jnp.argmin(dist)
    best_dist = dist[best]
    yaw = shift[best].astype(jnp.float32) / cfg.sc_num_sectors * 2 * jnp.pi
    # map shifts > pi to negative
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    return LoopCandidate(
        index=cand_idx[best],
        dist=best_dist,
        yaw=yaw,
        found=best_dist < cfg.sc_dist_threshold,
    )
