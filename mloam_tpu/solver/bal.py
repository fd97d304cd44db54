"""Bundle adjustment on BAL problems (Snavely camera model) — the real-data
validation of the GN/LM + robust-loss + Schur machinery.

Counterpart of the reference's in-repo solver validation executables
(``mloam_test/src/bundle_adjuster.cc`` + ``bal_problem.cc`` +
``snavely_reprojection_error.h``) driven by the real BAL dataset
``mloam_test/data/problem-49-7776-pre.txt`` (49 cameras, 7,776 points,
31,843 observations). The reference delegates to Ceres
(SPARSE/DENSE_SCHUR); here the same problem is solved TPU-natively:

  * residuals + Jacobians: one vmapped closed-form/jacfwd evaluation over
    all observations — three MXU-shaped batched einsums assemble the
    normal equations;
  * Schur elimination of the points: per-point 3x3 inverses (batched),
    off-diagonal camera-camera fill via a PRECOMPUTED observation-pair
    list (for point j every ordered pair of its observations contributes
    A_i1 Hpp_j^{-1} A_i2^T into S[c1, c2]) — a static-shape segment-sum
    into C*C 9x9 buckets instead of Ceres's dynamic sparse assembly;
  * the reduced camera system (C*9 square, dense) solves by Cholesky on
    the MXU; point back-substitution is another batched segment-sum.
  * optional sharded assembly: observations sharded across a device mesh,
    partial (Hcc, Hpp, A-pairs, g) psum'd — exactness vs the dense path
    is asserted on the REAL sparsity pattern (tests/test_realdata.py).

Robust losses (huber/gm/gnc_gm from solver.robust) apply per observation
on the squared 2-vector reprojection residual norm.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.solver import robust


class BalProblem(NamedTuple):
    cams: jnp.ndarray      # [C, 9] angle-axis(3), t(3), f, k1, k2
    pts: jnp.ndarray       # [P, 3]
    cam_idx: jnp.ndarray   # [N] int32
    pt_idx: jnp.ndarray    # [N] int32
    obs: jnp.ndarray       # [N, 2]
    # ordered observation pairs sharing a point (host-precomputed, static)
    pair_i: jnp.ndarray    # [M] int32 observation index 1
    pair_j: jnp.ndarray    # [M] int32 observation index 2


def load_bal(path: str, dtype=jnp.float32) -> BalProblem:
    """Parse a BAL problem file (`<C> <P> <N>`, N obs lines, then 9C + 3P
    parameter lines)."""
    with open(path) as f:
        nc, npt, no = map(int, f.readline().split())
        cam_idx = np.zeros(no, np.int32)
        pt_idx = np.zeros(no, np.int32)
        obs = np.zeros((no, 2), np.float64)
        for i in range(no):
            a, b, x, y = f.readline().split()
            cam_idx[i] = int(a)
            pt_idx[i] = int(b)
            obs[i] = (float(x), float(y))
        rest = np.array([float(f.readline()) for _ in range(9 * nc + 3 * npt)])
    cams = rest[: 9 * nc].reshape(nc, 9)
    pts = rest[9 * nc:].reshape(npt, 3)
    # pair list: for each point, all ordered pairs of its observations
    order = np.argsort(pt_idx, kind="stable")
    cnt = np.bincount(pt_idx, minlength=npt)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pi, pj = [], []
    for j in range(npt):
        o = order[starts[j]:starts[j + 1]]
        if len(o) == 0:
            continue
        g1, g2 = np.meshgrid(o, o, indexing="ij")
        pi.append(g1.ravel())
        pj.append(g2.ravel())
    return BalProblem(
        cams=jnp.asarray(cams, dtype), pts=jnp.asarray(pts, dtype),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        obs=jnp.asarray(obs, dtype),
        pair_i=jnp.asarray(np.concatenate(pi), jnp.int32),
        pair_j=jnp.asarray(np.concatenate(pj), jnp.int32),
    )


def snavely_residual(cam: jnp.ndarray, pt: jnp.ndarray,
                     ob: jnp.ndarray) -> jnp.ndarray:
    """2-vector reprojection residual of the 9-parameter Snavely camera
    (angle-axis rotation, translation, focal, 2 radial distortion terms;
    BAL's negative-z convention) — ``snavely_reprojection_error.h:46-77``
    re-derived, not transcribed."""
    aa, t = cam[:3], cam[3:6]
    f, k1, k2 = cam[6], cam[7], cam[8]
    theta = jnp.sqrt(jnp.sum(aa * aa) + 1e-24)
    k = aa / theta
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Rodrigues rotation of pt
    p = (pt * ct + jnp.cross(k, pt) * st
         + k * jnp.dot(k, pt) * (1.0 - ct)) + t
    xp = -p[0] / p[2]
    yp = -p[1] / p[2]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (k1 + k2 * r2)
    return jnp.stack([f * distortion * xp - ob[0],
                      f * distortion * yp - ob[1]])


def _linearize_obs(cams, pts, prob: BalProblem, loss: str, loss_scale: float,
                   gnc_mu: float):
    """Per-observation residuals, IRLS weights, and Jacobian blocks."""
    c = cams[prob.cam_idx]               # [N, 9]
    p = pts[prob.pt_idx]                 # [N, 3]

    def res(ci, pi, ob):
        return snavely_residual(ci, pi, ob)

    r = jax.vmap(res)(c, p, prob.obs)                       # [N, 2]
    Jc = jax.vmap(jax.jacfwd(res, argnums=0))(c, p, prob.obs)   # [N, 2, 9]
    Jp = jax.vmap(jax.jacfwd(res, argnums=1))(c, p, prob.obs)   # [N, 2, 3]
    s = jnp.sum(r * r, axis=-1)
    w = robust.loss_weight(s, loss, delta=loss_scale, gm_c=loss_scale,
                           gnc_mu=gnc_mu)
    return r, w, Jc, Jp


def bal_cost(cams, pts, prob: BalProblem, loss: str = "trivial",
             loss_scale: float = 1.0, gnc_mu: float = 1.0) -> jnp.ndarray:
    """0.5 Σ ρ(||r||²) — the quantity LM accepts on (true robust cost, not
    the IRLS quadratic)."""
    c = cams[prob.cam_idx]
    p = pts[prob.pt_idx]
    r = jax.vmap(snavely_residual)(c, p, prob.obs)
    s = jnp.sum(r * r, axis=-1)
    if loss == "trivial":
        rho = s
    elif loss == "huber":
        d2 = loss_scale * loss_scale
        rho = jnp.where(s <= d2,
                        s, 2.0 * loss_scale * jnp.sqrt(jnp.maximum(s, 1e-20))
                        - d2)
    elif loss == "gm":
        c2 = loss_scale * loss_scale
        rho = c2 * s / (c2 + s)
    elif loss == "gnc_gm":
        mc2 = gnc_mu * loss_scale * loss_scale
        rho = mc2 * s / (mc2 + s)
    else:
        raise ValueError(loss)
    return 0.5 * jnp.sum(rho)


def lm_step(cams, pts, prob: BalProblem, lam, loss: str = "trivial",
            loss_scale: float = 1.0, gnc_mu: float = 1.0,
            assemble=None):
    """One damped Schur-complement step -> (cams', pts'). ``assemble``
    overrides normal-equation assembly (the sharded variant plugs in
    here).

    Runs at f32 matmul precision throughout: the TPU's default bf16 MXU
    accumulation destroys the Schur complement's nearly-cancelling
    products (same failure mode documented in gauss_newton._linearize)."""
    with jax.default_matmul_precision("highest"):
        return _lm_step_inner(cams, pts, prob, lam, loss, loss_scale,
                              gnc_mu, assemble)


def _lm_step_inner(cams, pts, prob: BalProblem, lam, loss, loss_scale,
                   gnc_mu, assemble):
    C = cams.shape[0]
    P = pts.shape[0]
    if assemble is None:
        assemble = dense_assemble
    Hcc, Hpp, A, gc, gp = assemble(cams, pts, prob, loss, loss_scale, gnc_mu)

    # Marquardt-scaled damping on both blocks
    eye9 = jnp.eye(9, dtype=cams.dtype)
    eye3 = jnp.eye(3, dtype=cams.dtype)
    Hcc_d = Hcc + lam * (Hcc * eye9[None] + 1e-3 * eye9[None])
    Hpp_d = Hpp + lam * (Hpp * eye3[None] + 1e-3 * eye3[None])
    Hpp_inv = jnp.linalg.inv(Hpp_d)                          # [P, 3, 3]

    # Schur: S = blockdiag(Hcc_d) − Σ_pairs A_i1 Hpp⁻¹ A_i2ᵀ
    Ai = A[prob.pair_i]                                      # [M, 9, 3]
    Aj = A[prob.pair_j]
    Hinv_pair = Hpp_inv[prob.pt_idx[prob.pair_i]]            # [M, 3, 3]
    contrib = jnp.einsum("mab,mbc,mdc->mad", Ai, Hinv_pair, Aj)  # [M, 9, 9]
    bucket = (prob.cam_idx[prob.pair_i] * C
              + prob.cam_idx[prob.pair_j])                   # [M]
    Soff = jax.ops.segment_sum(contrib, bucket, num_segments=C * C)
    S = -Soff.reshape(C, C, 9, 9)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    S = S.transpose(0, 2, 1, 3).reshape(C * 9, C * 9)

    # reduced rhs: b = gc − Σ_obs A_i Hpp⁻¹ gp
    corr = jnp.einsum("nab,nb->na", A, jnp.einsum(
        "nab,nb->na", Hpp_inv[prob.pt_idx], gp[prob.pt_idx]))
    b = gc - jax.ops.segment_sum(corr, prob.cam_idx, num_segments=C)

    L = jnp.linalg.cholesky(S + 1e-8 * jnp.eye(C * 9, dtype=cams.dtype))
    dxc = -jax.scipy.linalg.cho_solve((L, True), b.reshape(-1)).reshape(C, 9)

    # back-substitute points: dx_p = −Hpp⁻¹ (gp + Σ_obs A_iᵀ dx_c)
    At_dxc = jnp.einsum("nab,na->nb", A, dxc[prob.cam_idx])  # [N, 3]
    gp_corr = gp + jax.ops.segment_sum(At_dxc, prob.pt_idx, num_segments=P)
    dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp_corr)
    return cams + dxc, pts + dxp


def dense_assemble(cams, pts, prob: BalProblem, loss, loss_scale, gnc_mu):
    """Normal-equation blocks on one device."""
    C, P = cams.shape[0], pts.shape[0]
    r, w, Jc, Jp = _linearize_obs(cams, pts, prob, loss, loss_scale, gnc_mu)
    Hcc = jax.ops.segment_sum(
        jnp.einsum("nka,n,nkb->nab", Jc, w, Jc), prob.cam_idx,
        num_segments=C)
    Hpp = jax.ops.segment_sum(
        jnp.einsum("nka,n,nkb->nab", Jp, w, Jp), prob.pt_idx,
        num_segments=P)
    A = jnp.einsum("nka,n,nkb->nab", Jc, w, Jp)              # [N, 9, 3]
    gc = jax.ops.segment_sum(jnp.einsum("nka,n,nk->na", Jc, w, r),
                             prob.cam_idx, num_segments=C)
    gp = jax.ops.segment_sum(jnp.einsum("nka,n,nk->na", Jp, w, r),
                             prob.pt_idx, num_segments=P)
    return Hcc, Hpp, A, gc, gp


def make_sharded_assemble(mesh, axis: str = "obs"):
    """Observation-sharded normal-equation assembly over a device mesh —
    the multi-host residual/Jacobian assembly shape (SURVEY §5.8: psum
    reductions replace the reference's single-machine pthread assembly,
    marginalization_factor.cpp:252-280).

    Each device linearizes its observation shard and computes PARTIAL
    segment-sums over the full camera/point index ranges; a psum merges
    them (Hcc/Hpp/gc/gp are sums over observations, so the decomposition
    is exact, not approximate). The per-observation coupling blocks A stay
    sharded and are re-gathered for the (replicated) Schur fill.
    Exactness vs dense_assemble is asserted on the real BAL sparsity in
    tests/test_realdata.py."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.devices.size

    def assemble(cams, pts, prob: BalProblem, loss, loss_scale, gnc_mu):
        C, Pn = cams.shape[0], pts.shape[0]
        N = prob.obs.shape[0]
        pad = (-N) % ndev
        cam_idx = jnp.pad(prob.cam_idx, (0, pad))
        pt_idx = jnp.pad(prob.pt_idx, (0, pad))
        obs = jnp.pad(prob.obs, ((0, pad), (0, 0)))
        valid = jnp.pad(jnp.ones((N,), cams.dtype), (0, pad))

        def shard_fn(cam_i, pt_i, ob, val):
            c = cams[cam_i]
            p = pts[pt_i]
            r = jax.vmap(snavely_residual)(c, p, ob)
            Jc = jax.vmap(jax.jacfwd(snavely_residual, argnums=0))(c, p, ob)
            Jp = jax.vmap(jax.jacfwd(snavely_residual, argnums=1))(c, p, ob)
            s = jnp.sum(r * r, axis=-1)
            w = val * robust.loss_weight(s, loss, delta=loss_scale,
                                         gm_c=loss_scale, gnc_mu=gnc_mu)
            Hcc = jax.ops.segment_sum(
                jnp.einsum("nka,n,nkb->nab", Jc, w, Jc), cam_i,
                num_segments=C)
            Hpp = jax.ops.segment_sum(
                jnp.einsum("nka,n,nkb->nab", Jp, w, Jp), pt_i,
                num_segments=Pn)
            A = jnp.einsum("nka,n,nkb->nab", Jc, w, Jp)
            gc = jax.ops.segment_sum(jnp.einsum("nka,n,nk->na", Jc, w, r),
                                     cam_i, num_segments=C)
            gp = jax.ops.segment_sum(jnp.einsum("nka,n,nk->na", Jp, w, r),
                                     pt_i, num_segments=Pn)
            return (jax.lax.psum(Hcc, axis), jax.lax.psum(Hpp, axis), A,
                    jax.lax.psum(gc, axis), jax.lax.psum(gp, axis))

        Hcc, Hpp, A, gc, gp = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(axis), P(), P()),
        )(cam_idx, pt_idx, obs, valid)
        return Hcc, Hpp, A[:N], gc, gp

    return assemble


def solve_bal(prob: BalProblem, iters: int = 20, loss: str = "trivial",
              loss_scale: float = 1.0, mu_schedule=None,
              assemble=None, init_lambda: float = 1e-4,
              verbose: bool = False):
    """Host-driven LM loop (accept/reject on the true robust cost).

    ``mu_schedule(k) -> μ`` anneals GNC convexity across OUTER LM
    iterations — the reference's μ /= 1.4-per-outer-solve schedule
    (``ceres_robust_curve_fitting.cpp:131-143``), not compressed into the
    inner GN iterations."""
    step = jax.jit(lm_step, static_argnames=("loss", "assemble"))
    costf = jax.jit(bal_cost, static_argnames=("loss",))
    cams, pts = prob.cams, prob.pts
    lam = init_lambda
    mu = mu_schedule(0) if mu_schedule is not None else 1.0
    cost = float(costf(cams, pts, prob, loss, loss_scale, mu))
    history = [cost]
    for k in range(iters):
        if mu_schedule is not None:
            mu = mu_schedule(k)
            cost = float(costf(cams, pts, prob, loss, loss_scale, mu))
        cams_n, pts_n = step(cams, pts, prob, lam, loss, loss_scale, mu,
                             assemble)
        cost_n = float(costf(cams_n, pts_n, prob, loss, loss_scale, mu))
        if np.isfinite(cost_n) and cost_n <= cost:
            cams, pts, cost = cams_n, pts_n, cost_n
            lam = max(lam * 0.3, 1e-8)
        else:
            lam = min(lam * 5.0, 1e6)
        history.append(cost)
        if verbose:
            print(f"  lm[{k:2d}] cost {cost:.6e} lam {lam:.1e} mu {mu:.2f}",
                  flush=True)
    return cams, pts, history
