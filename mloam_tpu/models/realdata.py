"""Real-data validation programs — the solver stack on the datasets the
reference ships in-repo (round-4 verdict missing #1: GN/LM, robust losses
and the sharded solver had only ever faced synthetic residual
distributions).

Programs (results land in results/realdata/):

  curve      robust exponential fit y = exp(m x + c) on
             ``mloam_test/data/data_curve_fitting.txt`` (201 samples with
             outliers; ground truth m=0.3, c=0.1 hard-coded in the
             reference driver, ``ceres_robust_curve_fitting.cpp:84-85``)
             with trivial/huber/gm and the reference's OUTER-annealed
             GNC schedule (μ₀=6, μ/=1.4 per outer solve, :106-143).
  nonconvex  robust quintic fit on ``data_non_convex_fitting.txt``
             (401 samples, heavy outliers; the smooth subset is exactly
             y = 4x⁵ − 2x⁴ + 3x³ − 4x² + 5x − 6, recovered to <0.4
             median abs residual).
  bal        bundle adjustment on the real BAL problem
             ``problem-49-7776-pre.txt`` (49 cams, 7,776 pts, 31,843
             observations — ``bundle_adjuster.cc`` counterpart): LM with
             point-Schur elimination, plus a huber variant, plus
             observation-sharded assembly exactness on the virtual mesh.

Usage: python -m mloam_tpu.models.realdata {curve,nonconvex,bal,all}
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.solver import bal as BAL
from mloam_tpu.solver import robust
from mloam_tpu.solver.gauss_newton import gauss_newton

REF_DATA = "/root/reference/mloam_test/data"
CURVE_GT = (0.3, 0.1)
QUINTIC_GT = (4.0, -2.0, 3.0, -4.0, 5.0, -6.0)


def load_xy(name: str) -> tuple[np.ndarray, np.ndarray]:
    d = np.loadtxt(os.path.join(REF_DATA, name), delimiter=",", skiprows=1)
    return d[:, 0].astype(np.float32), d[:, 1].astype(np.float32)


def _outdir() -> str:
    d = os.path.join("results", "realdata")
    os.makedirs(d, exist_ok=True)
    return d


def fit_robust(x: np.ndarray, y: np.ndarray, model: str, loss: str,
               scale: float, iters: int = 30,
               outer_gnc: bool = True, p_init=None):
    """Fit with the product gauss_newton. ``model``: 'exp' (params m, c)
    or 'quintic' (6 coefficients). GNC runs the reference's outer
    schedule: one fixed-μ solve per outer round, μ₀ → μ/1.4 until μ < 1
    (``ceres_robust_curve_fitting.cpp:131-143``)."""
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    if model == "exp":
        dim = 2
        p0 = jnp.zeros(2) if p_init is None else jnp.asarray(p_init)

        def predict(p):
            return jnp.exp(p[0] * xj + p[1])
    elif model == "quintic":
        dim = 6
        p0 = jnp.zeros(6) if p_init is None else jnp.asarray(p_init)
        powers = jnp.stack([xj ** k for k in (5, 4, 3, 2, 1, 0)], axis=-1)

        def predict(p):
            return powers @ p
    else:
        raise ValueError(model)

    def residual_fn(p, mu=1.0):
        r = yj - predict(p)
        w = robust.loss_weight(r * r, loss, delta=scale, gm_c=scale,
                               gnc_mu=mu)
        return r, w

    retract = lambda p, dx: p + dx
    if loss == "gnc_gm" and outer_gnc:
        # the reference's outer schedule with its own (commented-out)
        # adaptive seed restored: μ₀ = max residual² / c² — the GNC
        # literature's "start convex relative to the worst residual"
        # rule. The hard-coded μ₀=6 it ships is NOT near-convex for this
        # data (inlier s reaches ~24 at the cold start) and measured
        # here walking the fit to (0.69, −0.62); the adaptive seed with
        # ≥10 inner iterations recovers (0.303, 0.078).
        p = p0
        r0, _ = residual_fn(p, 1.0)
        # 100x headroom: μ₀ = max_s/c² alone leaves the worst residual at
        # weight 1/4 — still non-convex enough to bias the cold start
        # (measured: the curve fit walks to m=1.66 from μ₀=36; from
        # μ₀≈3600 it recovers 0.303)
        mu = max(100.0 * float(jnp.max(r0 * r0)) / (scale * scale), 6.0)
        while mu >= 1.0:
            st = gauss_newton(residual_fn, p, retract, dim=dim, iters=10,
                              mu_schedule=(lambda m: (lambda i: jnp.asarray(
                                  m, jnp.float32)))(mu))
            p = st.x
            mu /= 1.4
        # final GM polish at μ=1
        st = gauss_newton(residual_fn, p, retract, dim=dim, iters=10,
                          mu_schedule=lambda i: jnp.asarray(1.0, jnp.float32))
        return np.asarray(st.x)
    fn = (lambda p: residual_fn(p)) if loss != "gnc_gm" else residual_fn
    st = gauss_newton(fn, p0, retract, dim=dim, iters=iters,
                      mu_schedule=(robust.gnc_mu_schedule(6.0, iters + 1)
                                   if loss == "gnc_gm" else None))
    return np.asarray(st.x)


def curve_program() -> dict:
    x, y = load_xy("data_curve_fitting.txt")
    out = {"n": int(x.size), "gt": CURVE_GT, "fits": {}}
    warm = None
    for loss, scale in (("trivial", 1.0), ("huber", 0.5), ("gm", 1.0),
                        ("gnc_gm", 1.0)):
        # plain GM is non-convex and stalls from the zero cold start
        # (weights vanish on large residuals) — warm-start it from the
        # huber solution, the same role Ceres's warm state plays in the
        # product solves; gnc_gm exists precisely to need NO warm start
        p = fit_robust(x, y, "exp", loss, scale,
                       p_init=warm if loss == "gm" else None)
        if loss == "huber":
            warm = p
        err = float(np.hypot(p[0] - CURVE_GT[0], p[1] - CURVE_GT[1]))
        out["fits"][loss] = {"m": float(p[0]), "c": float(p[1]),
                             "param_err": err}
        print(f"  curve {loss:8s} m={p[0]:.4f} c={p[1]:.4f} err={err:.4f}",
              flush=True)
    return out


def nonconvex_program() -> dict:
    x, y = load_xy("data_non_convex_fitting.txt")
    # scale: residuals of the true quintic have ~0.36 median abs on the
    # inlier subset but outliers reach 1e5 — scale the squared-residual
    # losses to the inlier band
    out = {"n": int(x.size), "gt": QUINTIC_GT, "fits": {}}
    warm = None
    for loss, scale in (("trivial", 1.0), ("huber", 2.0), ("gm", 5.0),
                        ("gnc_gm", 5.0)):
        p = fit_robust(x, y, "quintic", loss, scale,
                       p_init=warm if loss == "gm" else None)
        if loss == "huber":
            warm = p
        err = float(np.max(np.abs(np.asarray(p) - np.asarray(QUINTIC_GT))))
        out["fits"][loss] = {"coeffs": [float(v) for v in p],
                             "max_coeff_err": err}
        print(f"  quintic {loss:8s} max|Δcoef|={err:.3f} "
              f"coeffs={np.round(p, 2)}", flush=True)
    return out


def bal_program(mesh=None) -> dict:
    path = os.path.join(REF_DATA, "problem-49-7776-pre.txt")
    prob = BAL.load_bal(path)
    out = {"cams": int(prob.cams.shape[0]), "pts": int(prob.pts.shape[0]),
           "obs": int(prob.obs.shape[0])}
    t0 = time.perf_counter()
    cams, pts, hist = BAL.solve_bal(prob, iters=25)
    out["initial_cost"] = float(hist[0])
    out["final_cost"] = float(hist[-1])
    out["lm_iters"] = len(hist) - 1
    out["wall_s"] = time.perf_counter() - t0
    print(f"  bal trivial: {hist[0]:.4e} -> {hist[-1]:.4e} "
          f"({out['wall_s']:.1f}s)", flush=True)
    _, _, hist_h = BAL.solve_bal(prob, iters=25, loss="huber",
                                 loss_scale=2.0)
    out["huber_final_cost"] = float(hist_h[-1])
    print(f"  bal huber:   {hist_h[0]:.4e} -> {hist_h[-1]:.4e}", flush=True)
    if mesh is not None:
        sh = BAL.make_sharded_assemble(mesh)
        d = BAL.dense_assemble(prob.cams, prob.pts, prob, "trivial", 1.0, 1.0)
        s = sh(prob.cams, prob.pts, prob, "trivial", 1.0, 1.0)
        rel = [float(jnp.max(jnp.abs(a - b))
                     / (1e-9 + jnp.max(jnp.abs(a))))
               for a, b in zip(d, s)]
        out["sharded_assembly_rel_err"] = rel
        print(f"  sharded assembly rel err: {max(rel):.2e}", flush=True)
    return out


def main():
    prog = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if prog in ("curve", "all"):
        print("curve fitting (data_curve_fitting.txt):", flush=True)
        res["curve"] = curve_program()
    if prog in ("nonconvex", "all"):
        print("non-convex quintic (data_non_convex_fitting.txt):", flush=True)
        res["nonconvex"] = nonconvex_program()
    if prog in ("bal", "all"):
        print("bundle adjustment (problem-49-7776-pre.txt):", flush=True)
        mesh = None
        if jax.device_count() >= 2:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("obs",))
        res["bal"] = bal_program(mesh)
    outd = _outdir()
    with open(os.path.join(outd, "summary.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {outd}/summary.json", flush=True)


if __name__ == "__main__":
    main()
