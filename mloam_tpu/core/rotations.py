"""Quaternion / SO(3) primitives.

Convention: quaternions are stored as ``[w, x, y, z]`` (scalar first), unit
norm, acting on column vectors by ``R(q) @ v``. All functions are pure jnp,
broadcast over leading batch dimensions, and are safe under ``vmap``/``jit``.

Counterpart of the reference's Eigen::Quaterniond usage and the small helpers
in ``estimator/src/utility/utility.h:173`` (``deltaQ``, ``skewSymmetric``) —
re-derived here, batched, rather than translated.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (both [..., 4], scalar-first)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4].

    Uses the 15-mul expansion (t = 2 q_v x v; v' = v + w t + q_v x t), cheaper
    than forming the rotation matrix and friendlier to fusion.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3, 3] rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] scalar-first quaternion (branch-free Shepperd).

    Computes all four candidate quaternions and selects the numerically best
    (largest pivot) with ``where`` — no data-dependent branching, so it jits
    and vmaps cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by its own pivot 4*q_i^2 = 1 + 2 m_ii - tr (or 1+tr).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def so3_exp_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternion; Taylor-safe near 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # sin(t/2)/t: exact vs 2nd-order Taylor 0.5 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] -> axis-angle [..., 3]; Taylor-safe near identity.

    AD-safe at the identity: the vector norm is guarded with the double-where
    pattern so jacfwd/jacrev produce finite derivatives when v == 0 (a plain
    ``norm`` has a NaN gradient at zero, which poisoned GN linearizations of
    priors evaluated exactly at their linearization point).
    """
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vnorm2 < 1e-12
    vnorm_safe = jnp.sqrt(jnp.where(small, 1.0, vnorm2))
    theta = 2.0 * jnp.arctan2(vnorm_safe, w)
    # theta/vnorm ~ 2/w - 2 vnorm^2/(3 w^3) near zero (atan2 series)
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, 0.5) - 2.0 * vnorm2 / (3.0 * jnp.maximum(w, 0.5) ** 3),
        theta / vnorm_safe,
    )
    return scale * v


def so3_exp_matrix(phi: jnp.ndarray) -> jnp.ndarray:
    return quat_to_matrix(so3_exp_quat(phi))


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, s) -> jnp.ndarray:
    """Spherical interpolation from q0 (s=0) to q1 (s=1); shortest arc.

    Implemented via the Lie-algebra form q0 ⊗ exp(s·log(q0⁻¹⊗q1)) — identical
    result to classic slerp, Taylor-safe, and batched. Used for motion
    de-skew (reference ``utility.h:55-101`` TransformToStart).
    """
    s = jnp.asarray(s, dtype=q0.dtype)
    dq = quat_multiply(quat_conjugate(q0), q1)
    phi = so3_log(dq)
    return quat_multiply(q0, so3_exp_quat(s[..., None] * phi))


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3) at phi [..., 3] -> [..., 3, 3].

    J_l = I + (1-cosθ)/θ² [φ]ₓ + (θ-sinθ)/θ³ [φ]ₓ²  (Taylor-safe).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    S = skew(phi)
    S2 = S @ S
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), S.shape)
    return eye + a * S + b * S2


def so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian J_l⁻¹ (Taylor-safe)."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    S = skew(phi)
    S2 = S @ S
    small = theta2 < 1e-8
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), S.shape)
    return eye - 0.5 * S + cot_term * S2
