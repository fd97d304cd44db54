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

import jax
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


def _spectral_keep(vals: jnp.ndarray, threshold: float,
                   rel_gap: float | None) -> jnp.ndarray:
    """Keep mask [..., 6] over ascending eigenvalues.

    A direction is degenerate iff (a) its eigenvalue is below the absolute
    ceiling ``threshold`` AND (b) — when ``rel_gap`` is given — it sits
    below a SPECTRAL GAP: the largest index m with e_m < rel_gap * e_{m+1}
    marks the degenerate subspace 0..m. The reference's gate is absolute
    only (eig_thre_ per platform yaml, estimator.cpp:1598-1680); round 4
    measured that no absolute value separates "corridor at noise 0.01"
    (e0 60-160, e0/e1 << 1) from "noiseless turning course" (e0 dips below
    100 but the spectrum dips TOGETHER, e0/e1 stays high) — eigenvalue
    magnitude scales with noise and scene richness, the eigengap does not.
    The absolute ceiling remains as a sanity bound: a strong-but-anisotropic
    scene (all directions far above any plausible noise floor) never fires.
    """
    below = vals < threshold
    if rel_gap is None:
        return ~below
    gap = vals[..., :-1] < rel_gap * vals[..., 1:]          # [..., 5]
    # degenerate_k = any gap at j >= k  (reversed cumulative-or)
    deg = jnp.flip(jnp.cumsum(jnp.flip(gap.astype(jnp.int32), -1), -1), -1) > 0
    deg = jnp.concatenate([deg, jnp.zeros_like(deg[..., :1], bool)], -1)
    return ~(below & deg)


def _projector_from(vecs: jnp.ndarray, keep: jnp.ndarray,
                    snap_purity: float | None) -> jnp.ndarray:
    """P = I − Σ_frozen u uᵀ from eigvectors [..., 6, 6] (columns) and a
    keep mask [..., 6].

    ``snap_purity``: purify each FROZEN eigenvector by snapping it to the
    canonical tangent axis it dominates when that component's magnitude
    exceeds the bound. Measured motivation (results/corridor round 4): the
    corridor's frozen direction is x-translation with a ~0.3 z-impurity;
    projecting with the raw eigvector couples the frozen x error into
    observable z (ez_max 1.74 m ON vs 0.39 OFF). The impurity is
    estimation noise in the eigvector, not geometry — the tunnel's
    unobservable direction IS the canonical axis — so snapping removes the
    coupling without weakening the freeze. Snapped directions are
    one-hot, hence orthonormal to each other only if frozen dirs dominate
    distinct axes; with the shipped max_freeze=1 at most one direction
    freezes and the projector is exact.
    """
    if snap_purity is not None:
        mag = jnp.abs(vecs)                                  # [..., 6, 6]
        dom = jnp.argmax(mag, axis=-2)                       # [..., 6]
        dommag = jnp.max(mag, axis=-2)                       # [..., 6]
        onehot = jax.nn.one_hot(dom, 6, dtype=vecs.dtype)    # [..., 6, 6]
        snapped = jnp.swapaxes(onehot, -1, -2)               # columns
        use = (dommag >= snap_purity)[..., None, :]
        vecs = jnp.where(use, snapped, vecs)
    frozen = 1.0 - keep.astype(vecs.dtype)
    sub = jnp.einsum("...ik,...k,...jk->...ij", vecs, frozen, vecs)
    return jnp.eye(6, dtype=vecs.dtype) - sub


def block_projector(H: jnp.ndarray, threshold: float,
                    max_freeze: int | None = None,
                    shared: bool = False,
                    rel_gap: float | None = None,
                    snap_purity: float | None = None,
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-6-dof-block solution-remapping projectors from H's diagonal
    blocks: P_i = I − Σ_frozen u uᵀ (= V diag(keep) Vᵀ when not snapping).

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

    ``rel_gap``: spectral-gap gate (see _spectral_keep) — a direction
    freezes only when it is BOTH below the absolute ceiling and separated
    from the rest of the spectrum by the gap ratio. This is what lets one
    default serve corridor AND noiseless turning courses.

    ``snap_purity``: frozen-direction purification (see _projector_from).

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
        keep = _spectral_keep(vals_s[None, :], threshold, rel_gap)
        if max_freeze is not None:
            keep = keep | (rank >= max_freeze)
        P_one = _projector_from(vecs_s, keep[0], snap_purity)
        P = jnp.broadcast_to(P_one, (n, 6, 6))
        return P, vals
    keep = _spectral_keep(vals, threshold, rel_gap)
    if max_freeze is not None:
        keep = keep | (rank >= max_freeze)
    P = _projector_from(vecs, keep, snap_purity)
    return P, vals


def shared_spectrum(H: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues [6] of the MEAN non-anchored 6x6 diagonal
    block — the spectrum the shared projector's gate actually sees.
    Averaging across the window is a spatial-persistence filter: a
    transient single-block dip (turning-course moment) dilutes by the
    window length, while a corridor's weak direction is shared by every
    block and survives the mean. Diagnostics/calibration must use THIS
    spectrum, not per-block ones (round-4 advisor: per-block counts
    overstate engagement)."""
    d = H.shape[0]
    n = d // 6
    blocks = jnp.stack(
        [H[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6] for i in range(n)])
    Hmean = jnp.mean(blocks[1:], axis=0) if n > 1 else blocks[0]
    return jnp.linalg.eigvalsh(Hmean)


def shared_weak_direction(H: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(eigvals [6] ascending, weakest eigvector [6]) of the mean
    non-anchored block — the candidate frozen direction."""
    d = H.shape[0]
    n = d // 6
    blocks = jnp.stack(
        [H[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6] for i in range(n)])
    Hmean = jnp.mean(blocks[1:], axis=0) if n > 1 else blocks[0]
    vals, vecs = jnp.linalg.eigh(Hmean)
    return vals, vecs[:, 0]


def apply_block_projector(P: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Apply per-block projectors [n, 6, 6] to a flat update [n*6]."""
    n = P.shape[0]
    proj = jnp.einsum("nij,nj->ni", P, dx.reshape(n, 6))
    return proj.reshape(n * 6)
