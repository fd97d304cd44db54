"""Solver layer: GN convergence, autodiff-vs-finite-difference factor
Jacobians (replacing the reference factors' check() self-tests),
marginalization consistency, degeneracy remapping, tracker accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.solver import degeneracy, factors, marginalization, robust
from mloam_tpu.solver.gauss_newton import gauss_newton


def make_feat(xyz, ring=None, time=None):
    n = xyz.shape[0]
    return FeatCloud(
        xyz=jnp.asarray(xyz, jnp.float32),
        mask=jnp.ones((n,), bool),
        time=jnp.zeros((n,)) if time is None else jnp.asarray(time, jnp.float32),
        ring=jnp.zeros((n,), jnp.int32) if ring is None else jnp.asarray(ring, jnp.int32),
    )


class TestGaussNewton:
    def test_point_cloud_alignment_converges(self):
        key = jax.random.PRNGKey(0)
        src = jax.random.uniform(key, (200, 3), minval=-5, maxval=5)
        T_true = se3.exp(jnp.array([0.3, -0.2, 0.1, 0.05, -0.02, 0.1]))
        dst = se3.transform_points(T_true, src)

        def residual_fn(T):
            r = (se3.transform_points(T, src) - dst).reshape(-1)
            return r, jnp.ones_like(r)

        st = gauss_newton(
            residual_fn, Pose.identity(), lambda T, dx: se3.boxplus(T, dx),
            dim=6, iters=6,
        )
        err = se3.boxminus(st.x, T_true)
        assert float(jnp.linalg.norm(err)) < 1e-4
        assert float(st.cost) < 1e-6

    def test_lm_rejects_bad_steps(self):
        # pathological residual with far initialization: cost must never rise
        def residual_fn(x):
            r = jnp.stack([jnp.exp(x[0]) - 1.0, 10.0 * x[1]])
            return r, jnp.ones(2)

        costs = []
        x = jnp.array([4.0, 1.0])
        st = gauss_newton(
            residual_fn, x, lambda x, dx: x + dx, dim=2, iters=12,
        )
        assert float(st.cost) < 1e-3


class TestFactorJacobians:
    """Autodiff through the residual chains vs central finite differences —
    the reference's CHECK_JACOBIAN equivalents."""

    def _check(self, res_fn, T0, atol=2e-3):
        def f(dx):
            return res_fn(se3.boxplus(T0, dx))

        J_ad = jax.jacfwd(f)(jnp.zeros(6))
        eps = 1e-3
        J_fd = np.zeros_like(np.asarray(J_ad))
        for i in range(6):
            e = np.zeros(6)
            e[i] = eps
            J_fd[..., i] = (
                np.asarray(f(jnp.asarray(e, jnp.float32)))
                - np.asarray(f(jnp.asarray(-e, jnp.float32)))
            ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=atol)

    def test_plane_residual_jacobian(self):
        corr = factors.PlaneCorr(
            p=jnp.array([[1.0, 2.0, 0.5], [-1.0, 0.3, 2.0]]),
            s=jnp.array([0.2, 0.9]),
            normal=jnp.array([[0.0, 0.0, 1.0], [0.707, 0.707, 0.0]]),
            d=jnp.array([-0.5, 1.0]),
            w=jnp.ones(2),
        )
        T0 = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.02, 0.05, -0.1]))

        def res(T):
            pt = factors.transform_deskew(T, corr.p, corr.s, True)
            return factors.plane_residual(pt, corr)

        self._check(res, T0)

    def test_edge_residual_jacobian(self):
        corr = factors.EdgeCorr(
            p=jnp.array([[1.0, 2.0, 0.5]]),
            s=jnp.array([0.5]),
            pa=jnp.array([[1.0, 2.0, 0.0]]),
            pb=jnp.array([[1.0, 2.0, 1.0]]),
            w=jnp.ones(1),
        )
        T0 = se3.exp(jnp.array([-0.1, 0.2, 0.0, 0.1, 0.0, 0.05]))

        def res(T):
            pt = factors.transform_deskew(T, corr.p, corr.s, True)
            return factors.edge_residual(pt, corr).reshape(-1)

        self._check(res, T0)

    def test_prior_residual_jacobian(self):
        prior = se3.exp(jnp.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03]))
        T0 = se3.boxplus(prior, jnp.array([0.05, 0, 0, 0, 0.02, 0]))

        def res(T):
            return factors.prior_residual(T, prior, 2.0, 3.0)

        self._check(res, T0)


class TestRobust:
    def test_huber_weight_shape(self):
        s = jnp.array([0.0001, 0.01, 1.0, 100.0])
        w = robust.huber_weight(s, 0.1)
        assert w[0] == 1.0 and w[1] == 1.0
        np.testing.assert_allclose(w[2], 0.1, atol=1e-6)
        np.testing.assert_allclose(w[3], 0.01, atol=1e-6)

    def test_gnc_interpolates_to_gm(self):
        s = jnp.array([0.5])
        gm = robust.geman_mcclure_weight(s, 1.0)
        sur = robust.surrogate_gm_weight(s, 1.0, 1.0)
        np.testing.assert_allclose(gm, sur, atol=1e-7)
        # large mu -> approaches L2 (weight 1)
        near_l2 = robust.surrogate_gm_weight(s, 1.0, 1e6)
        np.testing.assert_allclose(near_l2, 1.0, atol=1e-4)

    def test_gnc_mu_schedule_anneals_to_gm(self):
        """The compressed GNC schedule starts at mu_init and lands exactly
        at 1 (the GM limit) on the final iteration; monotone decreasing."""
        sched = robust.gnc_mu_schedule(20.0, 4)
        mus = [float(sched(i)) for i in range(5)]
        np.testing.assert_allclose(mus[0], 20.0, rtol=1e-5)
        np.testing.assert_allclose(mus[3], 1.0, rtol=1e-5)
        np.testing.assert_allclose(mus[4], 1.0, rtol=1e-5)  # clamped past end
        assert all(a >= b for a, b in zip(mus, mus[1:]))
        # degenerate 1-iteration budget: straight to GM
        assert float(robust.gnc_mu_schedule(20.0, 1)(0)) == 1.0

    def test_loss_weight_dispatch(self):
        s = jnp.array([0.04])
        np.testing.assert_allclose(
            robust.loss_weight(s, "gm", gm_c=0.2),
            robust.geman_mcclure_weight(s, 0.2))
        np.testing.assert_allclose(
            robust.loss_weight(s, "gnc_gm", gm_c=0.2, gnc_mu=5.0),
            robust.surrogate_gm_weight(s, 0.2, 5.0))
        with pytest.raises(ValueError):
            robust.loss_weight(s, "nope")

    def test_gnc_solve_recovers_under_outliers(self):
        """A 1-D location GN solve with 30% coherent outliers: huber is
        dragged, gnc_gm (annealed through gauss_newton's mu_schedule)
        recovers the inlier mode — the reference's reason for shipping
        GNC (impl_loss_function.hpp:94-125)."""
        from mloam_tpu.solver.gauss_newton import gauss_newton

        rng = np.random.default_rng(0)
        inl = rng.normal(0.0, 0.02, size=140)
        out = np.full(60, 1.5) + rng.normal(0.0, 0.02, size=60)
        z = jnp.asarray(np.concatenate([inl, out]), jnp.float32)

        def make_res(kind):
            def res(x, mu=1.0):
                r = x[0] - z
                w = robust.loss_weight(
                    jax.lax.stop_gradient(r * r), kind, delta=0.1,
                    gm_c=0.1, gnc_mu=mu)
                return r, w
            if kind != "gnc_gm":
                return lambda x: res(x)
            return res

        retract = lambda x, dx: x + dx
        x0 = jnp.array([0.4])  # seeded between the modes
        xh = gauss_newton(make_res("huber"), x0, retract, dim=1, iters=8)
        xg = gauss_newton(make_res("gnc_gm"), x0, retract, dim=1, iters=8,
                          mu_schedule=robust.gnc_mu_schedule(20.0, 9))
        err_h = abs(float(xh.x[0]))
        err_g = abs(float(xg.x[0]))
        assert err_g < 0.01, err_g        # GNC lands on the inlier mode
        assert err_g < 0.2 * err_h        # and beats huber by far


class TestMarginalization:
    def test_linear_gaussian_consistency(self):
        """Marginalizing block a of a quadratic must leave the same minimum
        over b as minimizing jointly."""
        key = jax.random.PRNGKey(1)
        A = jax.random.normal(key, (20, 12))
        H = A.T @ A + 0.1 * jnp.eye(12)
        g = jax.random.normal(jax.random.PRNGKey(2), (12,))
        # joint minimizer
        x_star = -jnp.linalg.solve(H, g)
        prior = marginalization.schur_marginalize(H, g, n_drop=6)
        # minimize prior over b alone: Jᵀ(r0 + J b) = 0
        Hb = prior.J.T @ prior.J
        gb = prior.J.T @ prior.r0
        b_star = -jnp.linalg.solve(Hb, gb)
        np.testing.assert_allclose(b_star, x_star[6:], atol=1e-4)

    def test_prior_residual_replay(self):
        H = jnp.eye(12) * 4.0
        g = jnp.zeros(12)
        prior = marginalization.schur_marginalize(H, g, 6)
        delta = jnp.arange(6, dtype=jnp.float32) * 0.1
        r = prior.residual(delta)
        np.testing.assert_allclose(r, 2.0 * delta, atol=1e-5)

    def test_empty_prior_is_zero(self):
        p = marginalization.MargPrior.empty(6)
        r = p.residual(jnp.ones(6))
        np.testing.assert_allclose(r, 0.0)


class TestDegeneracy:
    def test_remap_freezes_weak_directions(self):
        # block 0 strong, block 1 weak along one axis
        H = jnp.zeros((12, 12))
        H = H.at[:6, :6].set(100.0 * jnp.eye(6))
        d2 = jnp.diag(jnp.array([100.0, 100.0, 0.001, 100.0, 100.0, 100.0]))
        H = H.at[6:, 6:].set(d2)
        dx = jnp.ones(12)
        out = degeneracy.remap_update(H, dx, threshold=1.0)
        np.testing.assert_allclose(out[:6], 1.0, atol=1e-5)
        np.testing.assert_allclose(out[6 + 2], 0.0, atol=1e-5)
        np.testing.assert_allclose(out[6 + 0], 1.0, atol=1e-5)

    def test_analyze_blocks(self):
        H = jnp.eye(12)
        H = H.at[0, 0].set(0.01)
        info = degeneracy.analyze_blocks(H, 2, threshold=0.5)
        assert bool(info.degenerate[0]) and not bool(info.degenerate[1])

    def test_spectral_gate_separates_gap_from_uniform_dip(self):
        """The round-5 gate: a gap-separated weak direction freezes; a
        spectrum that dips UNIFORMLY below the absolute ceiling (the
        noiseless-turning-course regime that regressed round 4) does not."""
        # corridor-like: e0 far below e1 (gap), both below ceiling
        corridor = jnp.diag(jnp.array([80., 400., 500., 600., 700., 800.]))
        # turning-like: whole spectrum dips together, no gap
        turning = jnp.diag(jnp.array([90., 120., 140., 150., 160., 170.]))
        for H6, want_frozen in ((corridor, 1), (turning, 0)):
            P, vals = degeneracy.block_projector(
                H6, threshold=175.0, max_freeze=1, rel_gap=0.25)
            frozen = 6.0 - jnp.trace(P[0])
            assert round(float(frozen)) == want_frozen, (H6, frozen)

    def test_spectral_gate_absolute_ceiling_still_bounds(self):
        """A gap-separated direction ABOVE the ceiling never freezes (a
        strong anisotropic scene is not degeneracy)."""
        H6 = jnp.diag(jnp.array([200., 900., 1e3, 1e3, 1e3, 1e3]))
        P, _ = degeneracy.block_projector(H6, threshold=175.0,
                                          max_freeze=1, rel_gap=0.25)
        np.testing.assert_allclose(np.asarray(P[0]), np.eye(6), atol=1e-5)

    def test_snap_purity_purifies_frozen_direction(self):
        """A frozen eigvector with small off-axis impurity snaps to the
        canonical axis it dominates — the projector then zeroes ONLY that
        axis (round-4: the raw ~0.3 z-impurity coupled frozen-x error
        into observable z)."""
        # weak direction = mostly x-translation with z impurity
        v = jnp.array([0.95, 0.0, 0.0, 0.0, 0.0, 0.312])
        v = v / jnp.linalg.norm(v)
        # complete an orthonormal basis via QR
        M = jnp.concatenate([v[:, None], jnp.eye(6)[:, :5]], axis=1)
        Q, _ = jnp.linalg.qr(M)
        vals = jnp.array([50., 400., 500., 600., 700., 800.])
        H6 = (Q * vals[None, :]) @ Q.T
        P, _ = degeneracy.block_projector(H6, threshold=175.0, max_freeze=1,
                                          rel_gap=0.25, snap_purity=0.8)
        want = np.eye(6)
        want[0, 0] = 0.0   # pure x frozen, z untouched
        np.testing.assert_allclose(np.asarray(P[0]), want, atol=1e-4)

    def test_snap_purity_respects_bound(self):
        """A genuinely mixed frozen direction (no dominant axis) is NOT
        snapped — snapping there would freeze the wrong axis."""
        v = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 1.0]) / jnp.sqrt(2.0)
        M = jnp.concatenate([v[:, None], jnp.eye(6)[:, :5]], axis=1)
        Q, _ = jnp.linalg.qr(M)
        vals = jnp.array([50., 400., 500., 600., 700., 800.])
        H6 = (Q * vals[None, :]) @ Q.T
        P, _ = degeneracy.block_projector(H6, threshold=175.0, max_freeze=1,
                                          rel_gap=0.25, snap_purity=0.8)
        want = np.eye(6) - np.outer(np.asarray(v), np.asarray(v))
        np.testing.assert_allclose(np.asarray(P[0]), want, atol=1e-4)


class TestScanMatching:
    def test_plane_match_recovers_plane(self):
        # target: flat grid on z=0 across 3 rings; query: points above
        xs = jnp.linspace(-2, 2, 10)
        pts, rings = [], []
        for r, y in enumerate([-0.2, 0.0, 0.2]):
            for x in xs:
                pts.append([x, y, 0.0])
                rings.append(r)
        target = make_feat(jnp.array(pts), ring=jnp.array(rings))
        q = make_feat(jnp.array([[0.3, 0.0, 0.25]]), ring=jnp.array([1]))
        corr = factors.match_scan_plane(q, q.xyz, target)
        assert corr.w[0] > 0
        np.testing.assert_allclose(jnp.abs(corr.normal[0, 2]), 1.0, atol=1e-5)
        r = factors.plane_residual(q.xyz, corr)
        np.testing.assert_allclose(jnp.abs(r[0]), 0.25, atol=1e-5)

    def test_edge_match_needs_two_rings(self):
        # vertical edge: points stacked in z across rings
        target = make_feat(
            jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.3], [1.0, 0.0, 0.6]]),
            ring=jnp.array([0, 1, 2]),
        )
        q = make_feat(jnp.array([[1.1, 0.05, 0.3]]), ring=jnp.array([1]))
        corr = factors.match_scan_edge(q, q.xyz, target)
        assert corr.w[0] > 0
        r = factors.edge_residual(q.xyz, corr)
        # distance to the vertical line x=1,y=0 is ~sqrt(0.1^2+0.05^2)
        np.testing.assert_allclose(
            jnp.linalg.norm(r[0]), np.hypot(0.1, 0.05), atol=1e-3
        )

    def test_map_plane_fit(self):
        key = jax.random.PRNGKey(3)
        pts = jax.random.uniform(key, (50, 3), minval=-1, maxval=1)
        pts = pts.at[:, 2].set(0.5)  # plane z=0.5
        q = make_feat(jnp.array([[0.0, 0.0, 0.8]]))
        corr = factors.match_map_plane(q, q.xyz, pts, jnp.ones(50, bool))
        assert corr.w[0] > 0
        r = factors.plane_residual(q.xyz, corr)
        np.testing.assert_allclose(jnp.abs(r[0]), 0.3, atol=1e-2)

    def test_map_edge_eigenline(self):
        t = jnp.linspace(-1, 1, 30)
        line = jnp.stack([jnp.full(30, 2.0), jnp.full(30, 1.0), t], -1)
        q = make_feat(jnp.array([[2.1, 1.0, 0.0]]))
        corr = factors.match_map_edge(q, q.xyz, line, jnp.ones(30, bool))
        assert corr.w[0] > 0
        r = factors.edge_residual(q.xyz, corr)
        np.testing.assert_allclose(jnp.linalg.norm(r[0]), 0.1, atol=1e-3)

    def test_map_edge_rejects_isotropic_planar_patch(self):
        # symmetric in-plane cross: lambda_max == lambda_mid, not a line.
        # (NB the lambda_max > 3*lambda_mid criterion — same as the
        # reference's — is noisy on small random samples; only a clearly
        # non-linear neighborhood is guaranteed rejected.)
        pts = jnp.array(
            [[0.2, 0.0, 0.0], [-0.2, 0.0, 0.0], [0.0, 0.2, 0.0],
             [0.0, -0.2, 0.0], [0.0, 0.0, 0.0]]
        )
        q = make_feat(jnp.array([[0.0, 0.0, 0.1]]))
        corr = factors.match_map_edge(q, q.xyz, pts, jnp.ones(5, bool))
        assert corr.w[0] == 0


class TestAnalyticPointJacobians:
    """Closed-form point Jacobians (factors.{plane,edge}_point_jacobian) vs
    autodiff through the same residual — these back the analytic window
    linearization (estimator.optimize_window(analytic=True))."""

    def _rand_pose(self, key):
        xi = jax.random.uniform(key, (6,), minval=-0.5, maxval=0.5)
        return se3.exp(xi)

    def test_plane_point_jacobian(self):
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        n = 17
        nrm = jax.random.normal(k1, (n, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        corr = factors.PlaneCorr(
            p=jax.random.uniform(k2, (n, 3), minval=-5, maxval=5),
            s=jnp.zeros(n),
            normal=nrm,
            d=jax.random.normal(k3, (n,)),
            w=jnp.ones(n),
        )
        T = self._rand_pose(jax.random.PRNGKey(7))
        J = factors.plane_point_jacobian(
            jnp.broadcast_to(T.q, (n, 4)), corr
        )

        def res(dx):
            Td = se3.boxplus(T, dx)
            return factors.plane_residual(
                se3.transform_points(Td, corr.p), corr
            )

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                   rtol=1e-4, atol=1e-5)

    def test_edge_point_jacobian(self):
        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        n = 13
        corr = factors.EdgeCorr(
            p=jax.random.uniform(k1, (n, 3), minval=-5, maxval=5),
            s=jnp.zeros(n),
            pa=jax.random.uniform(k2, (n, 3), minval=-5, maxval=5),
            pb=jax.random.uniform(k3, (n, 3), minval=-5, maxval=5),
            w=jnp.ones(n),
        )
        T = self._rand_pose(jax.random.PRNGKey(13))
        J = factors.edge_point_jacobian(jnp.broadcast_to(T.q, (n, 4)), corr)

        def res(dx):
            Td = se3.boxplus(T, dx)
            return factors.edge_residual(
                se3.transform_points(Td, corr.p), corr
            )

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                   rtol=1e-4, atol=1e-5)
