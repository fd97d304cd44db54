"""Robust loss functions as IRLS weights.

Counterpart of the reference's Ceres losses: HuberLoss(0.1) used by tracker
and window solves, and the custom ``GemanMcClureLoss`` / graduated
``SurrogateGemanMcClureLoss`` GNC pair (``estimator/src/factor/
impl_loss_function.hpp:94-125``).

Convention: losses act on the squared residual norm s = ||r||². A factor's
contribution ρ(s) is implemented by scaling residual and Jacobian rows with
sqrt(w(s)), w(s) = ρ'(s) — the standard triggs-free IRLS correction, matching
what a Ceres solve converges to for these loss shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def trivial_weight(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones_like(s)


def huber_weight(s: jnp.ndarray, delta: float) -> jnp.ndarray:
    """ρ(s) = s for s <= δ²; 2δ√s − δ² above. w = ρ'(s)."""
    d2 = delta * delta
    sq = jnp.sqrt(jnp.maximum(s, 1e-20))
    return jnp.where(s <= d2, 1.0, delta / sq)


def geman_mcclure_weight(s: jnp.ndarray, c: float) -> jnp.ndarray:
    """ρ(s) = c² s / (c² + s); w = ρ'(s) = (c² / (c² + s))²."""
    c2 = c * c
    t = c2 / (c2 + s)
    return t * t


def surrogate_gm_weight(s: jnp.ndarray, c: float, mu: float) -> jnp.ndarray:
    """Graduated non-convexity surrogate of Geman-McClure:
    ρ_μ(s) = μ c² s / (μ c² + s); μ→1 recovers GM, large μ approaches L2.
    w = ρ'(s) = (μ c² / (μ c² + s))²."""
    mc2 = mu * c * c
    t = mc2 / (mc2 + s)
    return t * t


def gnc_mu_schedule(mu_init: float, iters: int):
    """Graduated non-convexity schedule compressed to a fixed GN budget.

    The reference anneals μ /= 1.4 per outer ICP iteration from 20 over
    ~30 iterations (``mloam_loop/test/test_icp.cpp:64,126``); our solves
    run a handful of fixed GN iterations, so the schedule is geometric
    from ``mu_init`` down to exactly 1 (the GM limit) on the final
    iteration: μ_i = mu_init^(1 − i/(iters−1)).

    Returns ``sched(i) -> μ`` accepting a traced iteration index.
    """

    def sched(i):
        if iters <= 1:
            return jnp.asarray(1.0, jnp.float32)
        e = 1.0 - jnp.minimum(jnp.asarray(i, jnp.float32), iters - 1) / (
            iters - 1)
        return jnp.maximum(1.0, jnp.power(jnp.float32(mu_init), e))

    return sched


def loss_weight(s: jnp.ndarray, kind: str, delta: float = 0.1,
                gm_c: float = 1.0, gnc_mu: float = 1.0) -> jnp.ndarray:
    if kind == "trivial":
        return trivial_weight(s)
    if kind == "huber":
        return huber_weight(s, delta)
    if kind == "gm":
        return geman_mcclure_weight(s, gm_c)
    if kind == "gnc_gm":
        return surrogate_gm_weight(s, gm_c, gnc_mu)
    raise ValueError(f"unknown loss kind: {kind}")
