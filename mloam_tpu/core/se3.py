"""SE(3) pose algebra as a JAX pytree.

Counterpart of the reference's ``Pose`` class (``estimator/src/estimator/
pose.h:38-68``): quaternion + translation with compose/inverse/log/exp,
Lie-algebra mean pose (``computeMeanPose``), and slerp interpolation for
motion de-skew — re-derived batched, not translated.

Tangent convention: xi = [rho (trans), phi (rot)] in R^6, *right* perturbation
  T ⊞ xi = T ∘ Exp(xi)
matching the reference's local parameterization (quaternion right-multiply
update, ``pose_local_parameterization.cpp:26-45``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.core import rotations as rot


class Pose(NamedTuple):
    """Batched SE(3) pose: q [..., 4] scalar-first quaternion, t [..., 3]."""

    q: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        q = jnp.broadcast_to(rot.quat_identity(dtype), batch_shape + (4,))
        t = jnp.zeros(batch_shape + (3,), dtype)
        return Pose(q, t)

    @property
    def batch_shape(self):
        return self.q.shape[:-1]

    def matrix(self) -> jnp.ndarray:
        """[..., 4, 4] homogeneous transform."""
        R = rot.quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.q.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: jnp.ndarray) -> Pose:
    return Pose(rot.matrix_to_quat(T[..., :3, :3]), T[..., :3, 3])


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a)."""
    return Pose(
        rot.quat_normalize(rot.quat_multiply(a.q, b.q)),
        rot.quat_rotate(a.q, b.t) + a.t,
    )


def inverse(p: Pose) -> Pose:
    qinv = rot.quat_conjugate(p.q)
    return Pose(qinv, -rot.quat_rotate(qinv, p.t))


def relative(a: Pose, b: Pose) -> Pose:
    """a⁻¹ ∘ b."""
    return compose(inverse(a), b)


def transform_points(p: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points [..., 3] (pose batch dims broadcast)."""
    return rot.quat_rotate(p.q[..., None, :], pts) + p.t[..., None, :]


def exp(xi: jnp.ndarray) -> Pose:
    """se(3) exp: xi = [rho, phi] [..., 6] -> Pose, t = J_l(phi) rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    q = rot.so3_exp_quat(phi)
    J = rot.so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return Pose(q, t)


def log(p: Pose) -> jnp.ndarray:
    """Pose -> [..., 6] = [rho, phi] with t = J_l(phi) rho."""
    phi = rot.so3_log(p.q)
    Jinv = rot.so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Jinv, p.t)
    return jnp.concatenate([rho, phi], axis=-1)


def boxplus(p: Pose, xi: jnp.ndarray) -> Pose:
    """Right-perturbation retraction T ∘ Exp(xi)."""
    return compose(p, exp(xi))


def boxminus(a: Pose, b: Pose) -> jnp.ndarray:
    """Log(b⁻¹ ∘ a): tangent taking b to a under right perturbation."""
    return log(relative(b, a))


def adjoint(p: Pose) -> jnp.ndarray:
    """[..., 6, 6] adjoint Ad_T = [[R, [t]ₓR], [0, R]].

    Matches the reference's ``adjointMatrix`` (``associate_uct.hpp:9-16``)
    with tangent order [rho, phi].
    """
    R = rot.quat_to_matrix(p.q)
    tR = rot.skew(p.t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def interpolate(p0: Pose, p1: Pose, s) -> Pose:
    """Pose interpolation: slerp rotation, lerp translation (reference
    de-skew semantics, ``utility.h:62-76``)."""
    s = jnp.asarray(s, dtype=p0.q.dtype)
    q = rot.quat_slerp(p0.q, p1.q, s)
    t = p0.t + s[..., None] * (p1.t - p0.t)
    return Pose(q, t)


def scale(p: Pose, s) -> Pose:
    """Fractional pose: identity-to-p interpolation by factor s in [0,1]."""
    return interpolate(Pose.identity(p.batch_shape, p.q.dtype), p, s)


def mean_pose(poses: Pose, weights: jnp.ndarray | None = None,
              iters: int = 5) -> Pose:
    """Weighted Lie mean over the leading axis (iterated tangent mean).

    Counterpart of ``Pose::computeMeanPose``; the reference does one pass of
    se(3)-log averaging — we iterate a few fixed rounds (ation-free on TPU)
    which converges to the Karcher mean for tight clusters.
    """
    n = poses.q.shape[0]
    if weights is None:
        weights = jnp.ones((n,), poses.q.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)

    mu = Pose(poses.q[0], poses.t[0])

    def body(_, mu):
        xi = jax.vmap(lambda q, t: boxminus(Pose(q, t), mu))(poses.q, poses.t)
        delta = jnp.sum(w[:, None] * xi, axis=0)
        return boxplus(mu, delta)

    return jax.lax.fori_loop(0, iters, body, mu)


def tangent_scatter(poses: Pose, mu: Pose, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """6x6 scatter (covariance) of poses about mu in the tangent space at mu."""
    n = poses.q.shape[0]
    if weights is None:
        weights = jnp.ones((n,), poses.q.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    xi = jax.vmap(lambda q, t: boxminus(Pose(q, t), mu))(poses.q, poses.t)
    return jnp.einsum("n,ni,nj->ij", w, xi, xi)
