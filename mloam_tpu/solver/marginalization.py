"""Schur-complement marginalization prior (VINS-style).

Counterpart of ``MarginalizationInfo`` / ``MarginalizationFactor``
(``estimator/src/factor/marginalization_factor.{h,cpp}``): the reference
assembles a dense H, b with 4 pthreads, Schur-eliminates the dropped states
(:286-301), eigendecomposes to recover a linearized prior (:305-313), and
replays it with a first-order state correction.

Here the solver already produces dense (H, g) on-device, so marginalization
is three jnp calls: partition, Schur, eigh. The prior is replayed as
r(x) = r0 + J · Δ(x, x_lin), Δ being the stacked boxminus against the
linearization point — identical first-order semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MargPrior(NamedTuple):
    """Linearized prior over the *kept* tangent (dimension K)."""

    J: jnp.ndarray    # [K, K] sqrt-information
    r0: jnp.ndarray   # [K]
    valid: jnp.ndarray  # scalar bool — inactive prior contributes nothing

    @staticmethod
    def empty(k: int, dtype=jnp.float32) -> "MargPrior":
        return MargPrior(jnp.zeros((k, k), dtype), jnp.zeros((k,), dtype),
                         jnp.asarray(False))

    def residual(self, delta: jnp.ndarray) -> jnp.ndarray:
        """delta [K] = boxminus(current kept states, linearization states)."""
        r = self.r0 + self.J @ delta
        return jnp.where(self.valid, r, 0.0)


def schur_marginalize(H: jnp.ndarray, g: jnp.ndarray, n_drop: int,
                      eps: float = 1e-8) -> MargPrior:
    """Eliminate the first ``n_drop`` tangent coordinates of (H, g).

    Returns the linearized prior on the remaining coordinates. Symmetrizes
    and pseudo-inverts the dropped block via eigh (the reference does the
    same, marginalization_factor.cpp:292-299).
    """
    m = n_drop
    Hmm = 0.5 * (H[:m, :m] + H[:m, :m].T)
    Hmr = H[:m, m:]
    Hrm = H[m:, :m]
    Hrr = H[m:, m:]
    gm = g[:m]
    gr = g[m:]

    vals, vecs = jnp.linalg.eigh(Hmm)
    inv_vals = jnp.where(vals > eps, 1.0 / jnp.maximum(vals, eps), 0.0)
    Hmm_inv = (vecs * inv_vals[None, :]) @ vecs.T

    Hp = Hrr - Hrm @ Hmm_inv @ Hmr
    gp = gr - Hrm @ Hmm_inv @ gm

    # recover sqrt-information J and r0 with Jᵀ J = Hp, Jᵀ r0 = gp
    vals2, vecs2 = jnp.linalg.eigh(0.5 * (Hp + Hp.T))
    s = jnp.sqrt(jnp.maximum(vals2, 0.0))
    s_inv = jnp.where(vals2 > eps, 1.0 / jnp.maximum(s, eps), 0.0)
    J = s[:, None] * vecs2.T
    r0 = (s_inv[:, None] * vecs2.T) @ gp
    return MargPrior(J=J, r0=r0, valid=jnp.asarray(True))
