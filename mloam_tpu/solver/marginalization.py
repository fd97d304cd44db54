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

import jax
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


class QuadPrior(NamedTuple):
    """Marginalization prior kept in quadratic (information) form.

    cost(δ) = 0.5 δᵀ H δ + bᵀ δ (+const), δ [K] = boxminus(current kept
    states, linearization states). It contributes H to the normal equations
    and b + Hδ to the gradient — the same first-order replay semantics as
    the sqrt-info form (``MargPrior`` / the reference's
    ``MarginalizationFactor::Evaluate``) without the eigendecomposition
    needed to recover J, which is a per-frame TPU latency cost. The hot
    odometry path uses this form; ``MargPrior`` remains for components that
    need explicit prior residual rows.
    """

    H: jnp.ndarray    # [K, K]
    b: jnp.ndarray    # [K]
    valid: jnp.ndarray  # scalar bool

    @staticmethod
    def empty(k: int, dtype=jnp.float32) -> "QuadPrior":
        return QuadPrior(jnp.zeros((k, k), dtype), jnp.zeros((k,), dtype),
                         jnp.asarray(False))


def _schur_core(H: jnp.ndarray, g: jnp.ndarray, n_drop: int, eps: float):
    """Schur complement onto the retained block: (Hp, gp).

    Pseudo-inverts the dropped block via eigh, as the reference does
    (marginalization_factor.cpp:292-299).

    float32 matmul precision is mandatory: Hrr − Hrm·Hmm⁻¹·Hmr subtracts
    large nearly-equal products, and the TPU's default bf16 MXU accumulation
    leaves the result indefinite often enough to blow up the prior replay
    (observed: negative solve costs, 20x ATE regression on chip).
    """
    with jax.default_matmul_precision("highest"):
        m = n_drop
        Hmm = 0.5 * (H[:m, :m] + H[:m, :m].T)
        Hmr = H[:m, m:]
        Hrm = H[m:, :m]
        Hrr = H[m:, m:]

        vals, vecs = jnp.linalg.eigh(Hmm)
        inv_vals = jnp.where(vals > eps, 1.0 / jnp.maximum(vals, eps), 0.0)
        Hmm_inv = (vecs * inv_vals[None, :]) @ vecs.T

        Hp = Hrr - Hrm @ Hmm_inv @ Hmr
        gp = g[m:] - Hrm @ Hmm_inv @ g[:m]
        return Hp, gp


def schur_marginalize_quad(H: jnp.ndarray, g: jnp.ndarray, n_drop: int,
                           eps: float = 1e-8) -> QuadPrior:
    """Eliminate the first ``n_drop`` tangent coordinates of (H, g) into a
    quadratic-form prior on the remaining coordinates.

    The result is PSD-PROJECTED: eigenvalues clamped at zero and the
    gradient projected onto the positive-curvature range — exactly what the
    reference's sqrt-info recovery does implicitly (J = √λ₊·Vᵀ,
    r0 = λ₊^{-1/2}·Vᵀg, marginalization_factor.cpp:305-313, discards the
    λ≤eps subspace of BOTH). Without it, Schur pseudo-inverse noise makes
    the prior slightly indefinite, and because the prior is re-marginalized
    recursively every frame the indefiniteness COMPOUNDS (observed: min
    eigenvalue drifting -0.2 → -13 over 300 frames, then the window solve
    riding the negative-curvature directions into a divergence — 0.6 m
    drift became 28 m at frame 500; with this projection the run is
    stable)."""
    Hp, gp = _schur_core(H, g, n_drop, eps)
    with jax.default_matmul_precision("highest"):
        vals, vecs = jnp.linalg.eigh(0.5 * (Hp + Hp.T))
        pos = vals > eps
        H_psd = (vecs * jnp.where(pos, vals, 0.0)[None, :]) @ vecs.T
        g_proj = vecs @ (pos * (vecs.T @ gp))
    return QuadPrior(H=H_psd, b=g_proj, valid=jnp.asarray(True))


def schur_marginalize(H: jnp.ndarray, g: jnp.ndarray, n_drop: int,
                      eps: float = 1e-8) -> MargPrior:
    """Eliminate the first ``n_drop`` tangent coordinates of (H, g).

    Returns the linearized prior on the remaining coordinates in sqrt-info
    (residual-row) form, recovered by eigendecomposition exactly like the
    reference (marginalization_factor.cpp:305-313).
    """
    Hp, gp = _schur_core(H, g, n_drop, eps)

    # recover sqrt-information J and r0 with Jᵀ J = Hp, Jᵀ r0 = gp
    vals2, vecs2 = jnp.linalg.eigh(0.5 * (Hp + Hp.T))
    s = jnp.sqrt(jnp.maximum(vals2, 0.0))
    s_inv = jnp.where(vals2 > eps, 1.0 / jnp.maximum(s, eps), 0.0)
    J = s[:, None] * vecs2.T
    r0 = (s_inv[:, None] * vecs2.T) @ gp
    return MargPrior(J=J, r0=r0, valid=jnp.asarray(True))
