"""Analytic window linearization (optimize_window(analytic=True)) must match
the autodiff path exactly: same normal equations along the same solve
trajectory, hence the same poses, Hessian, gradient, and cost.

This is the window-level counterpart of the per-factor CHECK_JACOBIAN
self-tests (reference lidar_scan_factor.hpp:64-118): the analytic path
re-derives the reference's hand-written Ceres Jacobians in batched closed
form, and the autodiff path is the previously-validated oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu import config as cfg_mod
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.odometry import estimator as E

CAP_C, CAP_S = 64, 128


def _world_geometry(key):
    """Corner points on vertical lines + surf points on planes."""
    kc, ks = jax.random.split(key)
    # 8 vertical lines on a circle of radius 8
    ang = jnp.arange(8) / 8 * 2 * jnp.pi
    centers = jnp.stack([8 * jnp.cos(ang), 8 * jnp.sin(ang)], -1)
    z = jax.random.uniform(kc, (8, CAP_C // 8), minval=-2, maxval=2)
    corner = jnp.concatenate(
        [
            jnp.broadcast_to(centers[:, None, :], (8, CAP_C // 8, 2)),
            z[..., None],
        ],
        -1,
    ).reshape(-1, 3)
    # floor plane z=-1.5 and wall plane y=10
    u = jax.random.uniform(ks, (CAP_S, 2), minval=-9, maxval=9)
    floor = jnp.stack([u[: CAP_S // 2, 0], u[: CAP_S // 2, 1],
                       jnp.full((CAP_S // 2,), -1.5)], -1)
    wall = jnp.stack([u[CAP_S // 2:, 0], jnp.full((CAP_S // 2,), 10.0),
                      u[CAP_S // 2:, 1]], -1)
    surf = jnp.concatenate([floor, wall])
    return corner, surf


def _feat(xyz):
    n = xyz.shape[0]
    return FeatCloud(
        xyz=xyz.astype(jnp.float32),
        mask=jnp.ones((n,), bool),
        time=jnp.zeros((n,), jnp.float32),
        ring=jnp.zeros((n,), jnp.int32),
    )


def _make_window(cfg, n_lidars=1, key=jax.random.PRNGKey(0)):
    corner_w, surf_w = _world_geometry(key)
    state = E.init_window(cfg, CAP_C, CAP_S)
    ext = Pose.identity((n_lidars,))
    if n_lidars > 1:
        # second lidar offset by a small known extrinsic
        e1 = se3.exp(jnp.array([0.3, -0.2, 0.1, 0.05, 0.0, 0.1]))
        ext = Pose(ext.q.at[1].set(e1.q), ext.t.at[1].set(e1.t))
    state = E.set_extrinsics(state, ext)
    s = cfg.odometry.window_size + 1
    kn = jax.random.split(jax.random.PRNGKey(42), s)
    for i in range(s):
        # forward motion with slight turn; small noise so residuals != 0
        gt = se3.exp(
            jnp.array([0.4 * i, 0.02 * i, 0.0, 0.0, 0.0, 0.03 * i])
        )
        noisy = se3.boxplus(
            gt, 0.01 * jax.random.normal(kn[i], (6,))
        )
        Tinv = se3.inverse(gt)

        def in_frame(pts, l):
            Tl = se3.compose(se3.inverse(Pose(ext.q[l], ext.t[l])), Tinv)
            return se3.transform_points(Tl, pts)

        corner = jax.tree.map(
            lambda x: jnp.stack([x] * n_lidars),
            _feat(in_frame(corner_w, 0)),
        )
        surf = jax.tree.map(
            lambda x: jnp.stack([x] * n_lidars),
            _feat(in_frame(surf_w, 0)),
        )
        if n_lidars > 1:
            corner = jax.tree.map(
                lambda a, b: a.at[1].set(b),
                corner, _feat(in_frame(corner_w, 1)),
            )
            surf = jax.tree.map(
                lambda a, b: a.at[1].set(b),
                surf, _feat(in_frame(surf_w, 1)),
            )
        state = E.push_frame(state, noisy, corner, surf, cfg)
    return state


def _small_cfg(n_lidars=1):
    cfg = cfg_mod.MloamConfig()
    odo = dataclasses.replace(
        cfg.odometry, window_size=3, opt_window_size=2,
        # ONE GN step: the property under test is linearization equality
        # (analytic == autodiff normal equations). Round 5 disarmed the
        # default degeneracy remap; without its freeze of the window's
        # weakest direction, a second LM step amplifies the paths'
        # ~1e-6 linearization differences chaotically through that
        # near-singular direction (measured 0.02 divergence at 2 steps —
        # equally in round 4 whenever the remap was off), which is solve
        # conditioning, not a Jacobian bug.
        gn_iters=1,
        cap_frame_corner=CAP_C, cap_frame_surf=CAP_S,
    )
    rig = dataclasses.replace(
        cfg.rig, models=tuple(cfg_mod.LidarModel() for _ in range(n_lidars))
    )
    return cfg.replace(odometry=odo, rig=rig)


class TestAnalyticWindowLinearize:
    def _compare(self, calibrate_ext, n_lidars):
        cfg = _small_cfg(n_lidars)
        state = _make_window(cfg, n_lidars)
        if calibrate_ext:
            state = E.reset_prior(state, cfg, calibrate_ext=True)
        run = jax.jit(
            E.optimize_window,
            static_argnames=("cfg", "calibrate_ext", "analytic"),
        )
        st_a, solve_a = run(state, cfg=cfg, calibrate_ext=calibrate_ext,
                            analytic=True)
        st_b, solve_b = run(state, cfg=cfg, calibrate_ext=calibrate_ext,
                            analytic=False)
        assert int(solve_a.n_surf) > 30 and int(solve_a.n_corner) > 5
        np.testing.assert_allclose(
            np.asarray(st_a.poses.t), np.asarray(st_b.poses.t), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(st_a.poses.q), np.asarray(st_b.poses.q), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_a.ext.q), np.asarray(st_b.ext.q), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(solve_a.cost), np.asarray(solve_b.cost), rtol=1e-4
        )
        # normal equations at the final iterate
        scale = np.abs(np.asarray(solve_b.H)).max()
        np.testing.assert_allclose(
            np.asarray(solve_a.H) / scale, np.asarray(solve_b.H) / scale,
            atol=2e-4,
        )
        gs = max(np.abs(np.asarray(solve_b.g)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(solve_a.g) / gs, np.asarray(solve_b.g) / gs, atol=2e-3
        )

    def test_pure_odometry_single_lidar(self):
        self._compare(calibrate_ext=False, n_lidars=1)

    def test_calibration_mode_dual_lidar(self):
        self._compare(calibrate_ext=True, n_lidars=2)


class TestLocalMapPrecompaction:
    """build_local_map's sort-free precompaction must be exact whenever the
    valid stacked points fit the bound (the steady case)."""

    def _maps_as_sets(self, out):
        c_ds, c_dm, s_ds, s_dm = out
        c = np.asarray(c_ds)[np.asarray(c_dm)]
        s = np.asarray(s_ds)[np.asarray(s_dm)]
        return (c[np.lexsort(c.T)], s[np.lexsort(s.T)])

    def test_precap_exact_when_fits(self):
        cfg = _small_cfg()
        # mask out half the points so the valid count fits the bound
        state = _make_window(cfg)
        state = state._replace(
            corner=state.corner._replace(
                mask=state.corner.mask.at[:, :, CAP_C // 2:].set(False)),
            surf=state.surf._replace(
                mask=state.surf.mask.at[:, :, CAP_S // 2:].set(False)),
        )
        n_slots = cfg.odometry.window_size + 1
        pre_c = n_slots * CAP_C // 2   # >= valid corners, < stack rows
        pre_s = n_slots * CAP_S // 2
        cfg_pre = cfg.replace(odometry=dataclasses.replace(
            cfg.odometry, localmap_precap_corner=pre_c,
            localmap_precap_surf=pre_s))
        cfg_off = cfg.replace(odometry=dataclasses.replace(
            cfg.odometry, localmap_precap_corner=None,
            localmap_precap_surf=None))
        got_c, got_s = self._maps_as_sets(E.build_local_map(state, cfg_pre))
        exp_c, exp_s = self._maps_as_sets(E.build_local_map(state, cfg_off))
        np.testing.assert_allclose(got_c, exp_c, atol=1e-6)
        np.testing.assert_allclose(got_s, exp_s, atol=1e-6)


class TestMarginalization:
    """The marginal prior must carry RELATIVE information only: the per-solve
    gauge anchor (and calib extrinsic priors) are re-added fresh each frame,
    so re-baking them into the prior would double-count absolute-pose
    information without bound (the reference marginalizes only factor blocks
    in the drop set, marginalization_factor.cpp:105-144)."""

    def _prior_after_marg(self, cfg):
        state = _make_window(cfg, 1)
        state, solve = E.optimize_window(state, cfg)
        state2 = E.marginalize_pivot(state, solve, cfg)
        return state, state2

    def test_prior_has_no_absolute_information(self):
        cfg = _small_cfg(1)
        state, state2 = self._prior_after_marg(cfg)
        Hp = np.asarray(state2.prior.H)
        O = cfg.odometry.opt_window_size
        s = cfg.odometry.window_size + 1
        pivot = s - 1 - O
        scale = float(np.trace(Hp))

        def gauge_quad(tang):
            """v^T Hp v for a global left-shift of every kept pose."""
            shift = se3.exp(jnp.asarray(tang))
            v = []
            for i in range(O):  # kept block i <-> window slot pivot+1+i
                T = Pose(state2.prior_poses.q[pivot + 1 + i],
                         state2.prior_poses.t[pivot + 1 + i])
                v.append(se3.boxminus(se3.compose(shift, T), T))
            v.append(jnp.zeros(6))  # the new-pose block is empty
            v = jnp.concatenate(v)
            vn = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            return float(vn @ jnp.asarray(Hp) @ vn)

        # global translation and global rotation are exact gauge freedoms
        assert gauge_quad([0.1, 0, 0, 0, 0, 0]) < 1e-4 * scale
        assert gauge_quad([0, 0, 0.1, 0, 0, 0]) < 1e-4 * scale
        assert gauge_quad([0, 0, 0, 0, 0, 0.05]) < 1e-4 * scale
        # ... but a RELATIVE perturbation (moving one kept pose alone) is
        # penalized: the prior did retain the factor information
        dim = (O + 1) * 6
        v1 = np.zeros(dim)
        v1[0] = 1.0
        assert float(v1 @ Hp @ v1) > 1e-3 * scale

    def test_anchor_fields_consistent(self):
        cfg = _small_cfg(1)
        state = _make_window(cfg, 1)
        _, solve = E.optimize_window(state, cfg)
        # the anchor contribution is PSD and much smaller than the factor H
        Ha = np.asarray(solve.H_anchor)
        vals = np.linalg.eigvalsh(0.5 * (Ha + Ha.T))
        assert vals.min() > -1e-3
        assert np.trace(Ha) < np.trace(np.asarray(solve.H))


class TestWindowGoodFeatures:
    """odometry.gf_ratio must actually subset the window correspondences
    (reference goodFeatureMatching inside optimizeMap, estimator.cpp:
    1347-1517) while keeping the solution close to the full solve."""

    def test_gf_ratio_subsets_and_tracks_full_solution(self):
        cfg = _small_cfg(1)
        state = _make_window(cfg, 1)
        st_full, solve_full = E.optimize_window(state, cfg)
        cfg_gf = cfg.replace(odometry=dataclasses.replace(
            cfg.odometry, gf_ratio=0.5))
        st_gf, solve_gf = E.optimize_window(state, cfg_gf)
        n_full = int(solve_full.n_corner + solve_full.n_surf)
        n_gf = int(solve_gf.n_corner + solve_gf.n_surf)
        assert 0.3 * n_full < n_gf < 0.7 * n_full
        # informative subset: solution within 2 cm / strong rotation agreement
        dt = np.abs(np.asarray(st_full.poses.t) - np.asarray(st_gf.poses.t))
        assert dt.max() < 0.02
