"""Good-feature selection: information-aware correspondence subsetting.

Counterpart of the reference's greedy observability-driven selection:
``Estimator::goodFeatureMatching`` (``estimator/src/estimator/estimator.cpp:
1347-1517``, random-queue greedy logdet maximization under a time budget)
and the mapper's ``ActiveFeatureSelection`` with methods wo_gf / rnd / fps /
gd_fix / gd_float (``estimator/src/lidarMapper/lidar_mapper.h:126-631``).

TPU-native reformulation of the greedy method: instead of a data-dependent
heap loop, selection runs a fixed number of *rounds*; each round scores ALL
remaining candidates by their log-det gain against the running 6x6
information matrix using the matrix determinant lemma —
    Δ_i = log det(I_r + J_i H⁻¹ J_iᵀ)
(rank-1 for plane factors, rank-3 for edges) — one 6x6 inverse plus one
batched einsum per round, then admits the top (target/rounds) scorers
jointly. This trades the exact greedy ordering for full parallelism; with
~8 rounds the selected sets have near-identical logdet in practice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core import rotations as rot
from mloam_tpu.core.se3 import Pose
from mloam_tpu.solver.factors import EdgeCorr, PlaneCorr


def plane_jacobian_blocks(corr: PlaneCorr, pose: Pose) -> jnp.ndarray:
    """[N, 6] Jacobian of n·(T p)+d wrt the right-perturbation tangent of T:
    J = [nᵀR | nᵀR [p]ₓᵀ] = [Rᵀn | p x Rᵀn]."""
    Rn = rot.quat_rotate(rot.quat_conjugate(pose.q)[None], corr.normal)
    return jnp.concatenate([Rn, jnp.cross(corr.p, Rn)], axis=-1)


def edge_jacobian_blocks(corr: EdgeCorr, pose: Pose) -> jnp.ndarray:
    """[N, 3, 6] Jacobian of the cross-product edge residual."""
    ab = corr.pa - corr.pb
    denom = jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-9)
    u = ab / denom                      # unit line direction
    # residual r = ((y - pa) x (y - pb)) / |ab| with y = T p;
    # dr/dy = -[u]x (cross-product rule), dy/dxi = R [I | [p]x^T]
    R = rot.quat_to_matrix(pose.q)      # [3, 3]
    dy = jnp.concatenate(
        [
            jnp.broadcast_to(R, corr.p.shape[:1] + (3, 3)),
            -R @ rot.skew(corr.p),
        ],
        axis=-1,
    )                                    # [N, 3, 6]
    return -rot.skew(u) @ dy


def logdet_gain_select(
    Jp: jnp.ndarray, wp: jnp.ndarray,
    Je: jnp.ndarray, we: jnp.ndarray,
    ratio: float, rounds: int = 8, jitter: float = 1e-3,
    max_ratio: float = 1.0,
):
    """Joint selection over plane (rank-1) and edge (rank-3) candidates.

    Returns (keep_p [Np] bool, keep_e [Ne] bool). Total kept ≈ ratio * valid.

    ``ratio`` may be traced (the gd_float budget-adaptive path);
    ``max_ratio`` must be a static upper bound on it — it sizes the
    per-round top-k width so every round can admit its full quota. (The
    old fixed 512-width clamp silently under-selected once
    ratio * n_valid / rounds exceeded 512.)
    """
    n_p = Jp.shape[0]
    n_e = Je.shape[0]
    valid_p = wp > 0
    valid_e = we > 0
    n_valid = jnp.sum(valid_p) + jnp.sum(valid_e)
    target = jnp.ceil(ratio * n_valid).astype(jnp.int32)
    per_round = jnp.maximum(target // rounds, 1)

    H0 = jitter * jnp.eye(6)
    keep_p0 = jnp.zeros((n_p,), bool)
    keep_e0 = jnp.zeros((n_e,), bool)

    def round_body(_, carry):
        H, keep_p, keep_e, remaining = carry
        Hinv = jnp.linalg.inv(H)
        # plane gains: log(1 + J Hinv Jᵀ)
        q_p = jnp.einsum("ni,ij,nj->n", Jp, Hinv, Jp)
        gain_p = jnp.log1p(jnp.maximum(q_p, 0.0))
        gain_p = jnp.where(valid_p & ~keep_p, gain_p, -jnp.inf)
        # edge gains: logdet(I3 + J Hinv Jᵀ)
        M = jnp.einsum("nai,ij,nbj->nab", Je, Hinv, Je)
        eye3 = jnp.eye(3)
        sign, ld = jnp.linalg.slogdet(eye3[None] + M)
        gain_e = jnp.where(sign > 0, ld, -jnp.inf)
        gain_e = jnp.where(valid_e & ~keep_e, gain_e, -jnp.inf)

        gains = jnp.concatenate([gain_p, gain_e])
        n_total = max(n_p + n_e, 1)
        # static width >= the worst-case per-round quota
        k = min(n_total, max(int(np.ceil(max_ratio * n_total / rounds)), 1))
        vals, idx = jax.lax.top_k(gains, k)
        rank = jnp.arange(vals.shape[0])
        admit = (rank < jnp.minimum(per_round, remaining)) & jnp.isfinite(vals)
        sel = jnp.zeros((n_p + n_e,), bool).at[idx].set(admit)
        sel_p = sel[:n_p]
        sel_e = sel[n_p:]
        H = (
            H
            + jnp.einsum("n,ni,nj->ij", sel_p.astype(Jp.dtype), Jp, Jp)
            + jnp.einsum("n,nai,naj->ij", sel_e.astype(Je.dtype), Je, Je)
        )
        n_admitted = jnp.sum(sel.astype(jnp.int32))
        return H, keep_p | sel_p, keep_e | sel_e, remaining - n_admitted

    _, keep_p, keep_e, _ = jax.lax.fori_loop(
        0, rounds, round_body, (H0, keep_p0, keep_e0, target)
    )
    return keep_p, keep_e


def random_select(w: jnp.ndarray, ratio: float, key: jax.Array) -> jnp.ndarray:
    """Bernoulli(ratio) mask over valid entries (method 'rnd')."""
    u = jax.random.uniform(key, w.shape)
    return (w > 0) & (u < ratio)


def fps_select(xyz: jnp.ndarray, w: jnp.ndarray, n_keep: int) -> jnp.ndarray:
    """Farthest-point sampling over valid points (method 'fps').

    Fixed n_keep iterations of argmax-of-min-distance; O(n_keep * N).
    """
    n = xyz.shape[0]
    valid = w > 0
    start = jnp.argmax(valid)  # first valid point
    min_d = jnp.where(valid, jnp.sum((xyz - xyz[start]) ** 2, -1), -jnp.inf)
    keep = jnp.zeros((n,), bool).at[start].set(valid[start])

    def body(_, carry):
        keep, min_d = carry
        nxt = jnp.argmax(min_d)
        ok = jnp.isfinite(min_d[nxt]) & (min_d[nxt] > 0)
        keep = keep.at[nxt].set(keep[nxt] | ok)
        d_new = jnp.sum((xyz - xyz[nxt]) ** 2, -1)
        min_d = jnp.where(valid & ~keep, jnp.minimum(min_d, d_new), -jnp.inf)
        return keep, min_d

    keep, _ = jax.lax.fori_loop(0, n_keep - 1, body, (keep, min_d))
    return keep


def apply_selection(
    plane: PlaneCorr, edge: EdgeCorr, pose: Pose, method: str, ratio: float,
    key: jax.Array | None = None, rounds: int = 8,
):
    """Return (plane, edge) with weights zeroed outside the selected subset.

    method ∈ {full, rnd, fps, gd} mirroring wo_gf / rnd / fps / gd_fix.
    """
    if method == "full" or ratio >= 1.0:
        return plane, edge
    if method == "rnd":
        assert key is not None
        kp, ke = jax.random.split(key)
        keep_p = random_select(plane.w, ratio, kp)
        keep_e = random_select(edge.w, ratio, ke)
    elif method == "fps":
        n_p = int(plane.w.shape[0] * ratio)
        n_e = max(int(edge.w.shape[0] * ratio), 1)
        keep_p = fps_select(plane.p, plane.w, n_p)
        keep_e = fps_select(edge.p, edge.w, n_e)
    elif method == "gd":
        Jp = plane_jacobian_blocks(plane, pose)
        Je = edge_jacobian_blocks(edge, pose)
        keep_p, keep_e = logdet_gain_select(
            Jp, plane.w, Je, edge.w, ratio, rounds
        )
    else:
        raise ValueError(f"unknown gf method {method}")
    return (
        plane._replace(w=plane.w * keep_p.astype(plane.w.dtype)),
        edge._replace(w=edge.w * keep_e.astype(edge.w.dtype)),
    )
