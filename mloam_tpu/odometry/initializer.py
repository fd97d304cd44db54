"""Motion-based multi-LiDAR extrinsic initialization (hand-eye calibration).

Counterpart of the reference's ``InitialExtrinsics`` (``estimator/src/
initial/initial_extrinsics.cpp``): screw-motion consistency filtering
(:104-116), rotation from the stacked quaternion linear system
``(L(q_ref) - R(q_l)) q_ext = 0`` solved by SVD with Huber-weighted rows and
a second-smallest-singular-value convergence gate (:119-241), translation
from the linear system ``(R_ref - I) t_ext = R_ext t_l - t_ref`` (:259-279),
plus the planar 4-DoF variant (:281-309).

TPU form: fixed-capacity motion-pair buffers with masks; the whole solve is
two batched matmuls + one SVD of a [4N, 4] stack — no heaps, no loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose


class MotionBuffer(NamedTuple):
    """Paired incremental motions of the reference lidar and one target
    lidar, fixed capacity."""

    ref_q: jnp.ndarray  # [N, 4]
    ref_t: jnp.ndarray  # [N, 3]
    tgt_q: jnp.ndarray  # [N, 4]
    tgt_t: jnp.ndarray  # [N, 3]
    mask: jnp.ndarray   # [N]
    head: jnp.ndarray   # scalar int32 write cursor

    @staticmethod
    def empty(n: int) -> "MotionBuffer":
        return MotionBuffer(
            ref_q=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            ref_t=jnp.zeros((n, 3)),
            tgt_q=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            tgt_t=jnp.zeros((n, 3)),
            mask=jnp.zeros((n,), bool),
            head=jnp.asarray(0, jnp.int32),
        )


def screw_consistent(ref: Pose, tgt: Pose, eps_r: float = 0.05,
                     eps_t: float = 0.1) -> jnp.ndarray:
    """Screw-motion congruence test (checkScrewMotion,
    initial_extrinsics.cpp:104-116): rigidly-mounted sensors see the same
    rotation angle and the same screw translation d = t·axis."""
    ang_r = jnp.linalg.norm(rot.so3_log(ref.q), axis=-1)
    ang_t = jnp.linalg.norm(rot.so3_log(tgt.q), axis=-1)
    axis_r = rot.so3_log(ref.q) / jnp.maximum(ang_r[..., None], 1e-9)
    axis_t = rot.so3_log(tgt.q) / jnp.maximum(ang_t[..., None], 1e-9)
    d_r = jnp.sum(ref.t * axis_r, -1)
    d_t = jnp.sum(tgt.t * axis_t, -1)
    return (jnp.abs(ang_r - ang_t) < eps_r) & (jnp.abs(d_r - d_t) < eps_t)


def add_pair(buf: MotionBuffer, ref: Pose, tgt: Pose,
             eps_r: float = 0.05, eps_t: float = 0.1) -> MotionBuffer:
    """Append one motion pair if screw-consistent (ring overwrite at
    capacity — the reference keeps the best N in a heap; a ring keeps the
    freshest, which behaves equivalently for continuous motion)."""
    ok = screw_consistent(ref, tgt, eps_r, eps_t)
    n = buf.mask.shape[0]
    idx = buf.head % n
    write = lambda arr, v: jnp.where(ok, arr.at[idx].set(v), arr)
    return MotionBuffer(
        ref_q=write(buf.ref_q, ref.q),
        ref_t=write(buf.ref_t, ref.t),
        tgt_q=write(buf.tgt_q, tgt.q),
        tgt_t=write(buf.tgt_t, tgt.t),
        mask=jnp.where(ok, buf.mask.at[idx].set(True), buf.mask),
        head=jnp.where(ok, buf.head + 1, buf.head),
    )


def quat_left_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """L(q): q ⊗ p = L(q) p, scalar-first. [..., 4] -> [..., 4, 4]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = jnp.stack([
        w, -x, -y, -z,
        x, w, -z, y,
        y, z, w, -x,
        z, -y, x, w,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (4, 4))


def quat_right_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """R(q): p ⊗ q = R(q) p, scalar-first."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = jnp.stack([
        w, -x, -y, -z,
        x, w, z, -y,
        y, -z, w, x,
        z, y, -x, w,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (4, 4))


class RotationSolution(NamedTuple):
    q_ext: jnp.ndarray       # [4]
    sigma2: jnp.ndarray      # second-smallest singular value (gate)
    converged: jnp.ndarray   # bool


def solve_rotation(buf: MotionBuffer, sv_threshold: float = 0.25,
                   irls_rounds: int = 2) -> RotationSolution:
    """SVD of the Huber-weighted stacked system (L(q_ref) - R(q_tgt)) q = 0.

    Convergence gate: second-smallest singular value > threshold (the
    rotation is fully observable only with rotations about >= 2 axes;
    initial_extrinsics.cpp:205-241).
    """
    A_blocks = quat_left_matrix(buf.ref_q) - quat_right_matrix(buf.tgt_q)  # [N,4,4]
    m = buf.mask.astype(A_blocks.dtype)

    w = m

    def round_fn(w, _):
        A = (A_blocks * w[:, None, None]).reshape(-1, 4)
        _, s, vt = jnp.linalg.svd(A, full_matrices=False)
        q = vt[3]
        # angular residual per pair -> huber reweight
        res = jnp.linalg.norm(
            jnp.einsum("nij,j->ni", A_blocks, q), axis=-1
        )
        ang = 2.0 * res  # small-angle proportionality
        delta = 0.1
        w_new = m * jnp.where(ang <= delta, 1.0, delta / jnp.maximum(ang, 1e-12))
        return w_new, (q, s)

    w, (q, s) = round_fn(w, None)
    for _ in range(irls_rounds - 1):
        w, (q, s) = round_fn(w, None)

    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    n_valid = jnp.sum(buf.mask)
    return RotationSolution(
        q_ext=rot.quat_normalize(q),
        sigma2=s[2],
        converged=(s[2] > sv_threshold) & (n_valid >= 10),
    )


def solve_translation(buf: MotionBuffer, q_ext: jnp.ndarray) -> jnp.ndarray:
    """LSQ of (R_ref - I) t_ext = R_ext t_tgt - t_ref over valid pairs
    (calibExTranslationNonPlanar, initial_extrinsics.cpp:259-279)."""
    R_ref = rot.quat_to_matrix(buf.ref_q)            # [N, 3, 3]
    eye = jnp.eye(3)
    A = (R_ref - eye) * buf.mask[:, None, None]
    b = (rot.quat_rotate(q_ext[None], buf.tgt_t) - buf.ref_t) * buf.mask[:, None]
    AtA = jnp.einsum("nij,nik->jk", A, A)
    Atb = jnp.einsum("nij,ni->j", A, b)
    return jnp.linalg.solve(AtA + 1e-6 * jnp.eye(3), Atb)


def solve_translation_planar(buf: MotionBuffer, q_ext: jnp.ndarray):
    """Planar 4-DoF variant: solves (x, y, yaw) with z unobservable
    (calibExTranslationPlanar, initial_extrinsics.cpp:281-309).

    System per pair: (R_ref - I)|_xy [tx, ty]ᵀ + [cos/sin yaw columns] = rhs.
    Returns (t_ext_xy as [3] with z=0, yaw_adjust_quat [4]).
    """
    R_ref = rot.quat_to_matrix(buf.ref_q)
    t_tgt_r = rot.quat_rotate(q_ext[None], buf.tgt_t)
    # unknowns: [tx, ty, cosγ, sinγ] (unit constraint relaxed to LSQ then
    # normalized). From (R_ref - I) t_X = R_yaw(γ) u - t_ref with
    # u = R_0 t_tgt:  J1 [tx,ty] - [[ux,-uy],[uy,ux]] [cosγ,sinγ] = -t_ref|xy
    J1 = (R_ref[:, :2, :2] - jnp.eye(2))               # [N, 2, 2]
    J2 = jnp.stack(
        [
            jnp.stack([t_tgt_r[:, 0], -t_tgt_r[:, 1]], -1),
            jnp.stack([t_tgt_r[:, 1], t_tgt_r[:, 0]], -1),
        ],
        axis=1,
    )                                                   # [N, 2, 2]
    A = jnp.concatenate([J1, -J2], axis=-1) * buf.mask[:, None, None]  # [N,2,4]
    b = -buf.ref_t[:, :2] * buf.mask[:, None]
    AtA = jnp.einsum("nij,nik->jk", A, A)
    Atb = jnp.einsum("nij,ni->j", A, b)
    x = jnp.linalg.solve(AtA + 1e-6 * jnp.eye(4), Atb)
    t_xy = jnp.array([x[0], x[1], 0.0])
    ab = x[2:] / jnp.maximum(jnp.linalg.norm(x[2:]), 1e-9)
    yaw = jnp.arctan2(ab[1], ab[0])
    q_yaw = rot.so3_exp_quat(jnp.array([0.0, 0.0, 1.0]) * yaw)
    return t_xy, q_yaw


def calibrate(buf: MotionBuffer, planar: bool = False,
              sv_threshold: float = 0.25) -> tuple[Pose, RotationSolution]:
    """Full init: rotation then translation. Returns (extrinsic base<-lidar,
    rotation diagnostics)."""
    rsol = solve_rotation(
        buf, sv_threshold=0.05 if planar else sv_threshold
    )
    if planar:
        t_xy, q_yaw = solve_translation_planar(buf, rsol.q_ext)
        q = rot.quat_normalize(rot.quat_multiply(q_yaw, rsol.q_ext))
        return Pose(q, t_xy), rsol
    t = solve_translation(buf, rsol.q_ext)
    return Pose(rsol.q_ext, t), rsol
