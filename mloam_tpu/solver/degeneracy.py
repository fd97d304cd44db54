"""Degeneracy detection + solution remapping (Zhang, "On Degeneracy of
Optimization-based State Estimation").

Counterpart of the reference's eigenvalue analysis of per-pose 6x6 Hessian
blocks with update projection (``estimator/src/estimator/estimator.cpp:
1598-1680``, ``lidar_tracker.cpp:131-163``, ``lidar_mapper_keyframe.cpp:
1172-1204``) and its remapping local parameterization
(``pose_local_parameterization.cpp:26-45``).

Here the projector P = V diag(λ_i >= thr) Vᵀ is applied to each 6-dof block
of the GN update — identical fixed-point semantics, expressed as batched
3-line linear algebra instead of a custom Ceres manifold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DegeneracyInfo(NamedTuple):
    eigvals: jnp.ndarray   # [B, 6] ascending per block
    factor: jnp.ndarray    # [B] smallest eigenvalue (the reference's lambda)
    degenerate: jnp.ndarray  # [B] bool — any direction below threshold


def analyze_blocks(H: jnp.ndarray, n_blocks: int, threshold: float) -> DegeneracyInfo:
    """Eigen-analysis of the 6x6 diagonal blocks of H [D, D]."""
    blocks = jnp.stack(
        [H[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6] for i in range(n_blocks)]
    )
    vals = jnp.linalg.eigvalsh(blocks)
    return DegeneracyInfo(
        eigvals=vals,
        factor=vals[:, 0],
        degenerate=jnp.any(vals < threshold, axis=-1),
    )


def remap_update(H: jnp.ndarray, dx: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Project each 6-dof block of dx onto the non-degenerate eigendirections
    of its corresponding 6x6 diagonal block of H."""
    P, _ = block_projector(H, threshold)
    return apply_block_projector(P, dx)


def block_projector(H: jnp.ndarray, threshold: float,
                    max_freeze: int | None = None,
                    shared: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-6-dof-block solution-remapping projectors from H's diagonal
    blocks: P_i = V diag(λ >= thr) Vᵀ.

    Computed ONCE per solve (the reference likewise installs the remap
    matrix into the local parameterization once per ``optimizeMap``,
    estimator.cpp:1598-1680) — eigh of many tiny blocks inside the GN loop
    is a TPU latency hotspot.

    ``max_freeze``: freeze at most this many (ascending) directions per
    block. The reference freezes EVERY direction below eig_thre_, which
    presumes a wide eigengap between the degenerate subspace and the rest;
    measured corridor spectra here put the second eigenvalue's noise floor
    inside the first's band, so freezing all-below can capture an
    observable direction — whose error then accumulates unchecked
    (measured: e1 frozen alongside e0 turned a 4 m drift into 19 m).
    max_freeze=1 freezes only the provably-degenerate leading direction.
    None = the reference's freeze-all-below rule.

    ``shared``: build ONE projector from the mean of the non-anchored
    blocks (blocks 1..n-1; block 0 carries the gauge anchor) and apply it
    identically to every block. Per-block projectors freeze slightly
    DIFFERENT directions in each block (eigvectors jitter with each
    block's noise), which corrupts the RELATIVE motion between window
    poses — measured on the corridor course, per-block freezing turned a
    bounded 2.7 m rigid-bias drift into 7-19 m of velocity corruption
    under every threshold/cap variant, while the shared projector keeps
    frozen directions consistent across the window so unfrozen-space
    pulls stay rigid and the frozen direction coasts exactly on the
    constant-velocity prediction.

    Returns (P [n, 6, 6], eigvals [n, 6] ascending — per-block spectra
    either way, for diagnostics/threshold calibration).
    """
    d = H.shape[0]
    assert d % 6 == 0
    n = d // 6
    blocks = jnp.stack([H[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6] for i in range(n)])
    vals, vecs = jnp.linalg.eigh(blocks)          # [n, 6], [n, 6, 6]
    rank = jnp.arange(6)[None, :]                 # ascending eig order
    if shared and n > 1:
        Hmean = jnp.mean(blocks[1:], axis=0)
        vals_s, vecs_s = jnp.linalg.eigh(Hmean)   # [6], [6, 6]
        keep = vals_s[None, :] >= threshold       # [1, 6]
        if max_freeze is not None:
            keep = keep | (rank >= max_freeze)
        keep = keep.astype(H.dtype)
        P_one = jnp.einsum("ik,k,jk->ij", vecs_s, keep[0], vecs_s)
        P = jnp.broadcast_to(P_one, (n, 6, 6))
        return P, vals
    keep = vals >= threshold                      # [n, 6] bool
    if max_freeze is not None:
        keep = keep | (rank >= max_freeze)
    keep = keep.astype(H.dtype)
    P = jnp.einsum("nik,nk,njk->nij", vecs, keep, vecs)
    return P, vals


def apply_block_projector(P: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Apply per-block projectors [n, 6, 6] to a flat update [n*6]."""
    n = P.shape[0]
    proj = jnp.einsum("nij,nj->ni", P, dx.reshape(n, 6))
    return proj.reshape(n * 6)
