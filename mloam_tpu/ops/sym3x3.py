"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

``jnp.linalg.eigh`` on [N, 3, 3] batches lowers to an iterative QR routine
that is very slow on TPU for thousands of small matrices; the map
correspondence builders call it ~10-20k times per sweep. This module
computes eigenvalues by the trigonometric (Cardano) method and eigenvectors
by cross-products of (A - λI) rows — pure VPU elementwise math, fully
vectorized, no data-dependent control flow.

Accuracy: eigenvalues to ~1e-6 relative; eigenvectors degrade gracefully for
near-degenerate pairs (the callers only branch on eigenvalue *ratios* and
use the extremal eigenvectors, which are well-separated exactly when the
geometric tests pass).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues of symmetric [..., 3, 3] -> [..., 3]."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    # det(B)/2 with B = (A - qI)
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = detB / (2.0 * jnp.maximum(p * p * p, _EPS))
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigvec_for(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric [..., 3, 3] for eigenvalue lam [...].

    Rows of (A - λI) span the plane orthogonal to the eigenvector; the
    largest cross product of row pairs is the most numerically reliable
    estimate.
    """
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(
        cand, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # fully degenerate (isotropic) fallback: any unit vector
    fallback = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), v.shape
    )
    return jnp.where(norm > 1e-10, v / jnp.maximum(norm, _EPS), fallback)


def smallest_eigvec3(A: jnp.ndarray):
    """(eigenvalues [..., 3] ascending, unit eigenvector of the smallest)."""
    vals = eigvalsh3(A)
    return vals, _eigvec_for(A, vals[..., 0])


def largest_eigvec3(A: jnp.ndarray):
    """(eigenvalues [..., 3] ascending, unit eigenvector of the largest)."""
    vals = eigvalsh3(A)
    return vals, _eigvec_for(A, vals[..., 2])
