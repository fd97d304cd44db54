"""SE(3) uncertainty algebra (Barfoot-style covariance compounding).

TPU-native re-derivation of the reference's ``estimator/src/lidarMapper/
associate_uct.hpp`` (adjointMatrix :9-16, compoundPoseWithCov :32-147,
pointToFS :150-156, evalPointUncertainty :164-215). All functions are batched
matrix algebra over leading dims — the per-point pushforward is meant to be
applied to whole clouds at once (the reference loops per point on CPU).

Tangent/covariance block order is [rho (trans); phi (rot)], identical to the
reference's adjoint layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose


def _covop1(B: jnp.ndarray) -> jnp.ndarray:
    """A = -tr(B) I + B  (the <<.>> operator of Barfoot eq. 44)."""
    tr = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(3, dtype=B.dtype)
    return -tr * eye + B


def _covop2(B: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """A = <<B>><<C>> + <<CB>>  (Barfoot eq. 45)."""
    return _covop1(B) @ _covop1(C) + _covop1(C @ B)


def compound_pose_cov(
    pose_1: Pose,
    cov_1: jnp.ndarray,
    pose_2: Pose,
    cov_2: jnp.ndarray,
    fourth_order: bool = True,
):
    """Compose T = T1 ∘ T2 and propagate 6x6 covariances.

    Second-order: Σ = Σ1 + Ad(T1) Σ2 Ad(T1)ᵀ. With ``fourth_order`` the
    Barfoot 4th-order correction terms (A1/A2/B) are added — numerically
    matching the reference's ``method == 2`` path.
    """
    pose_cp = se3.compose(pose_1, pose_2)
    AdT1 = se3.adjoint(pose_1)
    cov_2p = AdT1 @ cov_2 @ jnp.swapaxes(AdT1, -1, -2)
    cov = cov_1 + cov_2p
    if fourth_order:
        def blocks(C):
            return C[..., :3, :3], C[..., :3, 3:], C[..., 3:, 3:]

        c1_rr, c1_rp, c1_pp = blocks(cov_1)
        c2_rr, c2_rp, c2_pp = blocks(cov_2p)

        def build_A(c_rp, c_pp):
            Z = jnp.zeros_like(c_pp)
            top = jnp.concatenate([_covop1(c_pp), _covop1(c_rp + jnp.swapaxes(c_rp, -1, -2))], axis=-1)
            bot = jnp.concatenate([Z, _covop1(c_pp)], axis=-1)
            return jnp.concatenate([top, bot], axis=-2)

        A1 = build_A(c1_rp, c1_pp)
        A2 = build_A(c2_rp, c2_pp)

        c1_rpT = jnp.swapaxes(c1_rp, -1, -2)
        c2_rpT = jnp.swapaxes(c2_rp, -1, -2)
        Brr = (
            _covop2(c1_pp, c2_rr)
            + _covop2(c1_rpT, c2_rp)
            + _covop2(c1_rp, c2_rpT)
            + _covop2(c1_rr, c2_pp)
        )
        Brp = _covop2(c1_pp, c2_rpT) + _covop2(c1_rpT, c2_pp)
        Bpp = _covop2(c1_pp, c2_pp)
        top = jnp.concatenate([Brr, Brp], axis=-1)
        bot = jnp.concatenate([jnp.swapaxes(Brp, -1, -2), Bpp], axis=-1)
        B = jnp.concatenate([top, bot], axis=-2)

        cov = cov + (
            A1 @ cov_2p + cov_2p @ jnp.swapaxes(A1, -1, -2)
            + A2 @ cov_1 + cov_1 @ jnp.swapaxes(A2, -1, -2)
        ) / 12.0 + B / 4.0
    return pose_cp, cov


def point_cov_pushforward(
    points: jnp.ndarray,
    pose: Pose,
    cov_pose: jnp.ndarray,
    cov_meas: jnp.ndarray,
    cov_points: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-point 3x3 covariance of transformed points y = T p.

    Σ_y = G diag(Σ_pose, Σ_z) Gᵀ with G = [pointToFS(Tp) | R], where
    pointToFS(x) = [I | -[x]ₓ] on the xyz rows. Batched over points [N, 3];
    ``cov_meas`` is the per-lidar 3x3 measurement covariance, ``cov_points``
    optional existing per-point covariance [N, 3, 3] to accumulate (the
    reference adds it when filtering cov-clouds).
    Returns [N, 3, 3].
    """
    R = rot.quat_to_matrix(pose.q)  # [3, 3]
    y = se3.transform_points(pose, points)  # [N, 3]

    # pointToFS(y)[:3] = [ I3 | -skew(y) ]; contribution to Σ_y:
    #   [I|-S] [[Σrr, Σrp],[Σpr, Σpp]] [I|-S]ᵀ
    # = Σrr - S Σpr - Σrp Sᵀ + S Σpp Sᵀ        with S = skew(y)
    S = rot.skew(y)  # [N, 3, 3]
    c_rr = cov_pose[:3, :3]
    c_rp = cov_pose[:3, 3:]
    c_pp = cov_pose[3:, 3:]
    ST = jnp.swapaxes(S, -1, -2)
    pose_term = c_rr - S @ c_rp.T - c_rp @ ST + S @ c_pp @ ST
    # measurement (and optional prior point) covariance rotated into target frame
    meas = cov_meas if cov_points is None else cov_meas + cov_points
    meas_term = R @ meas @ R.T
    return pose_term + meas_term
