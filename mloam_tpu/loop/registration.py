"""Loop-closure registration: coarse align + LOAM-factor fine refinement.

Counterpart of the reference's ``LoopRegistration`` (``mloam_loop/src/
loop_registration.cpp``): global registration (normals + FPFH-33 + vendored
FastGlobalRegistration, :37-89) followed by two rounds of LOAM map-factor
Ceres refinement seeded by the global result (:104-211).

TPU-native coarse stage: the scan-context detection already recovers the
relative yaw, and candidate keyframes are position-gated — so the coarse
transform is (yaw from SC) ∘ (translation from ground-plane-constrained
centroid alignment). The fine stage is the same covariance-free map
edge/plane GN used everywhere else. An FPFH+RANSAC batched kernel (for
priorless global registration) is the known remaining gap vs the reference
(SURVEY §7.4 item 5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.config import LoopConfig, MloamConfig
from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.solver import factors
from mloam_tpu.solver.gauss_newton import gauss_newton


class RegistrationResult(NamedTuple):
    pose: Pose            # target <- query
    cost: jnp.ndarray     # mean squared residual of inliers
    inlier_frac: jnp.ndarray
    ok: jnp.ndarray       # bool acceptance


def coarse_align(q_xyz, q_mask, t_xyz, t_mask, yaw: jnp.ndarray) -> Pose:
    """Yaw from scan context + masked-centroid translation."""
    q_yaw = rot.so3_exp_quat(jnp.array([0.0, 0.0, 1.0]) * yaw)
    wq = q_mask.astype(q_xyz.dtype)
    wt = t_mask.astype(t_xyz.dtype)
    cq = jnp.sum(q_xyz * wq[:, None], 0) / jnp.maximum(jnp.sum(wq), 1)
    ct = jnp.sum(t_xyz * wt[:, None], 0) / jnp.maximum(jnp.sum(wt), 1)
    t = ct - rot.quat_rotate(q_yaw, cq)
    return Pose(q_yaw, t)


def fine_register(
    query_corner: FeatCloud,
    query_surf: FeatCloud,
    target_corner_xyz, target_corner_mask,
    target_surf_xyz, target_surf_mask,
    T_init: Pose,
    cfg: MloamConfig,
    outer_iters: int = 3,
    gn_iters: int = 8,
    accept_cost: float = 0.06,
    accept_inlier_frac: float = 0.5,
) -> RegistrationResult:
    """LOAM-factor ICP-style refinement of target <- query."""
    T = T_init
    st = None
    for _ in range(outer_iters):
        pc_proj = se3.transform_points(T, query_surf.xyz)
        cc_proj = se3.transform_points(T, query_corner.xyz)
        pc = factors.match_map_plane(
            query_surf, pc_proj, target_surf_xyz, target_surf_mask,
            dist_sq_threshold=2.0,
        )
        ec = factors.match_map_edge(
            query_corner, cc_proj, target_corner_xyz, target_corner_mask,
            dist_sq_threshold=2.0,
        )

        def residual_fn(Tx: Pose):
            re = factors.edge_residual(se3.transform_points(Tx, ec.p), ec)
            we = factors.robust_weights(
                jnp.sum(re * re, -1), ec.w, "huber", 0.2
            )
            rp = factors.plane_residual(se3.transform_points(Tx, pc.p), pc)
            wp = factors.robust_weights(rp * rp, pc.w, "huber", 0.2)
            return (
                jnp.concatenate([re.reshape(-1), rp]),
                jnp.concatenate([jnp.repeat(we, 3), wp]),
            )

        st = gauss_newton(residual_fn, T, lambda Tx, dx: se3.boxplus(Tx, dx),
                          dim=6, iters=gn_iters)
        T = st.x

    # acceptance: inlier fraction + mean residual of matched surf points
    rp = factors.plane_residual(se3.transform_points(T, pc.p), pc)
    n_match = jnp.sum(pc.w > 0)
    n_query = jnp.maximum(jnp.sum(query_surf.mask), 1)
    inlier = jnp.sum((pc.w > 0) & (jnp.abs(rp) < 0.3))
    mean_sq = jnp.sum(jnp.where(pc.w > 0, rp * rp, 0.0)) / jnp.maximum(n_match, 1)
    frac = inlier / n_query
    return RegistrationResult(
        pose=T,
        cost=mean_sq,
        inlier_frac=frac,
        ok=(frac > accept_inlier_frac) & (mean_sq < accept_cost),
    )
