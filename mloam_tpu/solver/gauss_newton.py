"""Gauss-Newton / Levenberg-Marquardt on product manifolds, dense form.

This replaces Ceres (DENSE_SCHUR, analytic-Jacobian cost functions,
``estimator/src/estimator/estimator.cpp:606-615`` and friends) with a
TPU-native design:

  * The state is any pytree with a user ``retract(x, dx)`` taking a flat
    tangent vector dx [D]. SLAM states here are tiny (window poses +
    extrinsics: D <= ~60), so the normal equations are assembled densely and
    solved directly — no Schur elimination needed for speed (the reference
    needed DENSE_SCHUR only because Ceres treats each pose as a block).
  * Jacobians come from one ``jax.jacfwd`` of the residual at dx = 0 — D
    forward passes, each a fully-batched residual evaluation; H = Jᵀ W J is a
    single [D, N] @ [N, D] matmul on the MXU.
  * Robust IRLS weights are recomputed each iteration from the current
    residuals (see robust.py).
  * A fixed iteration count (compile-time constant, lax.fori_loop) mirrors
    the reference's hard solver budgets; LM damping is adapted
    multiplicatively on cost increase, branch-free.
  * Degeneracy solution-remapping (``remap_threshold``) builds the per-block
    eigenprojector ONCE from the initial Hessian — exactly the reference's
    evalDegenracy installing a fixed remap matrix into the local
    parameterization for the whole solve (estimator.cpp:1598-1680) — and
    applies it to every update. Small eigendecompositions inside the GN loop
    are a TPU latency hotspot, so once-per-solve matters.
  * A marginalization prior enters as a quadratic form (``quad_prior``):
    H += Hp, g += b + Hp·δ(x) — no prior residual rows, nothing extra to
    differentiate.

The returned Gauss-Newton Hessian feeds degeneracy analysis, covariance
(H⁻¹, reference lidar_mapper_keyframe.cpp:602-618) and marginalization.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.solver import degeneracy
from mloam_tpu.solver.marginalization import QuadPrior

# residual_fn(x) -> (r [N], w [N]); w already folds validity mask and any
# per-residual sqrt-information. Robust reweighting happens here on top.
ResidualFn = Callable[[Any], tuple[jnp.ndarray, jnp.ndarray]]
RetractFn = Callable[[Any, jnp.ndarray], Any]
# linearize_fn(x) -> (H [D,D], g [D], cost): closed-form normal equations,
# bypassing the jacfwd in _linearize (analytic factor Jacobians).
LinearizeFn = Callable[[Any], tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]
# quad_prior = (delta_fn, QuadPrior): delta_fn(x) -> [D] boxminus of the
# optimized states against the prior's linearization points.
QuadPriorSpec = tuple[Callable[[Any], jnp.ndarray], QuadPrior]


class GNState(NamedTuple):
    x: Any
    cost: jnp.ndarray
    lm_lambda: jnp.ndarray
    H: jnp.ndarray   # damping-free JᵀWJ (+prior) of the *last* linearization
    g: jnp.ndarray
    eig0: jnp.ndarray  # [D/6, 6] ascending eigvals of H0's diagonal blocks
    #                    (zeros unless remap_threshold was given)
    frozen: jnp.ndarray  # [D/6] directions actually frozen per block =
    #                      trace deficit of the applied projector (zeros
    #                      when no remap) — the TRUE engagement signal
    #                      (counting raw sub-threshold eigenvalues
    #                      overstates it; round-4 advisor)
    eig_shared: jnp.ndarray  # [6] ascending spectrum of the mean
    #                          non-anchored block — what the shared
    #                          projector's gate actually sees (zeros when
    #                          no remap)
    weak_dir: jnp.ndarray  # [6] weakest eigvector of the shared-mean
    #                        block (zeros when no remap) — the candidate
    #                        frozen direction, exposed for the
    #                        persistence gate and diagnostics


def _linearize(residual_fn: ResidualFn, retract: RetractFn, x, dim: int,
               quad_prior: QuadPriorSpec | None = None,
               linearize_fn: LinearizeFn | None = None,
               mu: jnp.ndarray | None = None):
    """Build (H, g, cost) at x. One jacfwd over the flat tangent, or the
    caller's closed-form ``linearize_fn`` when given.

    All matmuls here run at float32 precision (the enclosing
    ``gauss_newton`` sets ``jax.default_matmul_precision("highest")``): the
    TPU's default bf16 MXU accumulation makes H assembly and especially the
    downstream Schur complement (large, nearly-cancelling products) only
    *marginally* stable — whether a run survives then depends on XLA
    fusion/rounding choices, i.e. on unrelated program edits. Observed as
    indefinite marginalization priors (negative total costs) and 20x ATE
    blowups on chip; invisible on CPU.

    IRLS robust weights belong *inside* residual_fn (computed from the
    current residuals, under stop_gradient if derived from r): the weight w
    is taken from the evaluation at dx=0 and the Jacobian only differentiates
    the raw residual, which is exactly the IRLS linearization.
    """
    if linearize_fn is not None:
        H, g, cost = (linearize_fn(x) if mu is None
                      else linearize_fn(x, mu))
    else:
        rf = residual_fn if mu is None else (lambda xx: residual_fn(xx, mu))

        def res_at(dx):
            r, _ = rf(retract(x, dx))
            return r

        zero = jnp.zeros((dim,), jnp.float32)
        r, w = rf(x)
        J = jax.jacfwd(res_at)(zero)            # [N, D]
        Jw = J * w[:, None]
        H = J.T @ Jw                             # [D, D]
        g = Jw.T @ r                             # [D]
        cost = 0.5 * jnp.sum(w * r * r)
    H_meas = H
    if quad_prior is not None:
        delta_fn, qp = quad_prior
        val = qp.valid.astype(H.dtype)
        delta = delta_fn(x)
        Hq = qp.H * val
        Hqd = Hq @ delta
        H = H + Hq
        g = g + val * qp.b + Hqd
        cost = cost + 0.5 * delta @ Hqd + val * jnp.dot(qp.b, delta)
    return H, g, cost, H_meas


def solve_normal(H: jnp.ndarray, g: jnp.ndarray, lm_lambda) -> jnp.ndarray:
    """Marquardt-scaled damped solve: Hd = H + λ (diag(H) + ε I).

    Scaling by diag(H) (not plain λI) matters for gauge-deficient SLAM
    windows: in a pure-relative problem the Hessian has an exact nullspace,
    and with λI damping the step along it is g_noise/λ — f32 reduction noise
    over thousands of residuals divided by a tiny λ produces meter-scale
    coherent window jumps. diag-scaled damping keeps the effective curvature
    in every direction proportional to the problem's own scale.
    """
    d = H.shape[0]
    damp = jnp.diag(jnp.diagonal(H)) + 1e-3 * jnp.eye(d, dtype=H.dtype)
    Hd = H + lm_lambda * damp
    L = jnp.linalg.cholesky(Hd + 1e-8 * jnp.eye(d, dtype=H.dtype))
    dx = jax.scipy.linalg.cho_solve((L, True), g)
    return -dx


def gauss_newton(
    residual_fn: ResidualFn,
    x0: Any,
    retract: RetractFn,
    dim: int,
    iters: int,
    init_lambda: float = 1e-4,
    remap_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    remap_threshold: float | None = None,
    remap_max_freeze: int | None = 1,
    remap_shared: bool = False,
    remap_rel_gap: float | None = None,
    remap_snap_purity: float | None = None,
    remap_P: jnp.ndarray | None = None,
    init_linearization=None,
    quad_prior: QuadPriorSpec | None = None,
    linearize_fn: LinearizeFn | None = None,
    iteration_hook: Callable[[jnp.ndarray, GNState], GNState] | None = None,
    mu_schedule: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> GNState:
    """Run ``iters`` damped GN steps.

    ``linearize_fn(x) -> (H, g, cost)`` supplies closed-form normal
    equations (analytic factor Jacobians) instead of the jacfwd default;
    ``residual_fn`` may then be ``None``. The quadratic prior is applied on
    top either way.

    ``remap_threshold``: build the per-6-dof-block degeneracy projector once
    from the initial Hessian and apply it to every update (the reference's
    solution-remapping parameterization); block eigenvalues are returned in
    ``GNState.eig0``. ``remap_max_freeze`` caps the number of frozen
    directions per block (see degeneracy.block_projector — the default 1
    freezes only the provably-degenerate leading direction; None is the
    reference's freeze-all-below rule). ``remap_fn(H, dx) -> dx`` is the
    fully general per-iteration form (recomputes from the current H each
    step).

    ``iteration_hook(i, state) -> state`` is the counterpart of the
    reference's Ceres ``IterationCallback`` (StateUpdatingCovarianceCallback,
    impl_callback.hpp:19-24): a pure function applied after every accepted
    step — use it to update covariance-coupled quantities mid-solve or to
    emit monitoring via ``jax.debug.callback``.

    ``mu_schedule(i) -> μ`` enables graduated non-convexity (the
    reference's SurrogateGemanMcClureLoss annealing,
    impl_loss_function.hpp:112-125 + test_icp.cpp:126): residual_fn /
    linearize_fn are then called as ``fn(x, μ_i)`` with the scheduled
    convexity at each (re-)linearization — see robust.gnc_mu_schedule."""

    with jax.default_matmul_precision("highest"):
        mu0 = mu_schedule(0) if mu_schedule is not None else None
        if init_linearization is not None:
            # caller already linearized at x0 (e.g. to run the persistence
            # gate on the measurement Hessian before the solve) — don't
            # pay a second full linearization
            H0, g0, c0, Hm0 = init_linearization
        else:
            H0, g0, c0, Hm0 = _linearize(residual_fn, retract, x0, dim,
                                         quad_prior, linearize_fn, mu0)
        if remap_P is not None:
            # externally-gated projector (the persistence gate builds P —
            # possibly identity — from temporal state the solver cannot
            # see); diagnostics still derive from Hm0
            P0 = remap_P
            n_bl = dim // 6 if dim % 6 == 0 else 0
            blocks = jnp.stack([Hm0[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6]
                                for i in range(n_bl)])
            eig0 = jnp.linalg.eigvalsh(blocks)
            frozen0 = 6.0 - jnp.trace(P0, axis1=-2, axis2=-1)
            eig_sh, wdir = degeneracy.shared_weak_direction(Hm0)
        elif remap_threshold is not None:
            # projector from the MEASUREMENT-ONLY Hessian: the reference's
            # evalDegenracy runs on res_ids_proj (point factors + extrinsic
            # priors), NOT the marginalization prior (estimator.cpp:
            # 1578-1594) — the prior's accumulated memory would otherwise
            # mask directions the CURRENT sweep cannot observe (a corridor
            # looks fully constrained forever once the prior matures)
            P0, eig0 = degeneracy.block_projector(
                Hm0, remap_threshold, remap_max_freeze, shared=remap_shared,
                rel_gap=remap_rel_gap, snap_purity=remap_snap_purity)
            frozen0 = 6.0 - jnp.trace(P0, axis1=-2, axis2=-1)
            eig_sh, wdir = degeneracy.shared_weak_direction(Hm0)
        else:
            P0 = None
            eig0 = jnp.zeros((dim // 6 if dim % 6 == 0 else 0, 6), H0.dtype)
            frozen0 = jnp.zeros((eig0.shape[0],), H0.dtype)
            eig_sh = jnp.zeros((6,), H0.dtype)
            wdir = jnp.zeros((6,), H0.dtype)
        init = GNState(x0, c0, jnp.asarray(init_lambda, jnp.float32), H0, g0,
                       eig0, frozen0, eig_sh, wdir)

        def body(i, st: GNState) -> GNState:
            if mu_schedule is not None:
                # GNC annealing: costs under different convexity μ are not
                # comparable (shrinking μ shrinks weights, so cost would
                # almost always "drop" and the accept gate would pass bad
                # steps — round-4 advisor). Re-linearize the current
                # iterate under this iteration's μ so the step, the
                # reference cost, and the trial cost all share one μ.
                mu_i = mu_schedule(i + 1)
                H_r, g_r, c_r, _ = _linearize(residual_fn, retract, st.x,
                                              dim, quad_prior, linearize_fn,
                                              mu_i)
                st = st._replace(H=H_r, g=g_r, cost=c_r)
            else:
                mu_i = None
            dx = solve_normal(st.H, st.g, st.lm_lambda)
            if P0 is not None:
                dx = degeneracy.apply_block_projector(P0, dx)
            if remap_fn is not None:
                dx = remap_fn(st.H, dx)
            x_new = retract(st.x, dx)
            H, g, cost, _ = _linearize(residual_fn, retract, x_new, dim,
                                       quad_prior, linearize_fn, mu_i)
            accept = cost <= st.cost
            lam = jnp.where(accept, st.lm_lambda * 0.5, st.lm_lambda * 4.0)
            lam = jnp.clip(lam, 1e-5, 1e2)
            # branch-free accept/reject
            x_out = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), x_new, st.x
            )
            st = GNState(
                x_out,
                jnp.where(accept, cost, st.cost),
                lam,
                jax.tree.map(lambda a, b: jnp.where(accept, a, b), H, st.H),
                jax.tree.map(lambda a, b: jnp.where(accept, a, b), g, st.g),
                st.eig0,
                st.frozen,
                st.eig_shared,
                st.weak_dir,
            )
            if iteration_hook is not None:
                st = iteration_hook(i, st)
            return st

        return jax.lax.fori_loop(0, iters, body, init)
