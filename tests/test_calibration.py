"""Hand-eye extrinsic initialization: recovery on synthetic motion pairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.odometry import initializer as I


def make_buffer(key, X: Pose, n=60, rot_scale=0.2, noise=0.0,
                axes="all") -> I.MotionBuffer:
    """Motion pairs: A_k (ref frame), B_k = X^-1 A_k X (+ noise)."""
    buf = I.MotionBuffer.empty(128)
    keys = jax.random.split(key, n)
    for k in keys:
        k1, k2, k3 = jax.random.split(k, 3)
        phi = rot_scale * jax.random.normal(k1, (3,))
        if axes == "yaw_only":
            phi = phi.at[:2].set(0.0)
        xi = jnp.concatenate([0.3 * jax.random.normal(k2, (3,)), phi])
        A = se3.exp(xi)
        B = se3.compose(se3.compose(se3.inverse(X), A), X)
        if noise > 0:
            B = se3.boxplus(B, noise * jax.random.normal(k3, (6,)))
        buf = I.add_pair(buf, A, B)
    return buf


class TestHandEye:
    def test_exact_recovery(self):
        X = se3.exp(jnp.array([0.5, -0.3, 0.2, 0.3, -0.2, 0.9]))
        buf = make_buffer(jax.random.PRNGKey(0), X)
        est, rsol = I.calibrate(buf)
        assert bool(rsol.converged)
        err = se3.boxminus(est, X)
        assert float(jnp.linalg.norm(err)) < 1e-3

    def test_noisy_recovery(self):
        X = se3.exp(jnp.array([0.5, -0.3, 0.2, 0.3, -0.2, 0.9]))
        buf = make_buffer(jax.random.PRNGKey(1), X, n=100, noise=0.005)
        est, rsol = I.calibrate(buf)
        assert bool(rsol.converged)
        err = se3.boxminus(est, X)
        assert float(jnp.linalg.norm(err)) < 0.05

    def test_yaw_only_motion_does_not_converge(self):
        # planar yaw-only motion leaves roll/pitch of the extrinsic
        # unobservable: sigma2 gate must reject (reference's planar-motion
        # degeneracy, initial_extrinsics.cpp:205-241)
        X = se3.exp(jnp.array([0.5, -0.3, 0.0, 0.0, 0.0, 0.9]))
        buf = make_buffer(jax.random.PRNGKey(2), X, axes="yaw_only")
        _, rsol = I.calibrate(buf)
        assert not bool(rsol.converged)

    def test_planar_variant_recovers_xy_yaw(self):
        X = se3.exp(jnp.array([0.5, -0.3, 0.0, 0.0, 0.0, 0.9]))
        buf = make_buffer(jax.random.PRNGKey(3), X, axes="yaw_only")
        est, _ = I.calibrate(buf, planar=True)
        # xy and yaw should match; z unobservable
        np.testing.assert_allclose(est.t[:2], X.t[:2], atol=0.02)
        yaw_est = rot.so3_log(est.q)[2]
        yaw_gt = rot.so3_log(X.q)[2]
        np.testing.assert_allclose(yaw_est, yaw_gt, atol=0.02)

    def test_screw_filter_rejects_inconsistent(self):
        A = se3.exp(jnp.array([0.3, 0, 0, 0.2, 0, 0]))
        B_bad = se3.exp(jnp.array([0.3, 0, 0, 0.5, 0, 0]))  # wrong angle
        assert not bool(I.screw_consistent(A, B_bad))
        X = se3.exp(jnp.array([0.1, 0.2, 0.3, 0.1, 0.2, 0.3]))
        B_good = se3.compose(se3.compose(se3.inverse(X), A), X)
        assert bool(I.screw_consistent(A, B_good))

    def test_buffer_ring_overwrite(self):
        buf = I.MotionBuffer.empty(4)
        A = se3.exp(jnp.array([0.1, 0, 0, 0.3, 0, 0]))
        for i in range(6):
            buf = I.add_pair(buf, A, A)
        assert int(buf.head) == 6
        assert bool(buf.mask.all())


class TestOnlineCalibration:
    """Mode-1 refinement on a simulated dual-lidar rig (trimmed for CI)."""

    def test_window_refinement_reduces_extrinsic_error(self):
        import dataclasses

        from mloam_tpu.core.rangeimage import RangeImage
        from mloam_tpu.models import platforms
        from mloam_tpu.models.pipeline import OdometryPipeline
        from mloam_tpu.odometry import estimator as E
        from mloam_tpu.sim import world as W

        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=1)
        cfg = dataclasses.replace(
            cfg, calib=dataclasses.replace(cfg.calib, n_calib_samples=1000)
        )
        w = W.make_world(jax.random.PRNGKey(0))
        traj = W.make_trajectory(jax.random.PRNGKey(1), wobble=0.1)
        model = cfg.rig.models[0]
        X_gt = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))
        n = 12
        imgs0, _ = W.render_sequence(w, traj, model, n)
        imgs1, _ = W.render_sequence(w, traj, model, n, extrinsic=X_gt)
        pipe = OdometryPipeline(cfg)
        pipe.ext_mode = 1
        X0 = se3.boxplus(X_gt, jnp.array([0.05, -0.03, 0.02, 0.02, -0.01, 0.03]))
        err0 = float(jnp.linalg.norm(se3.boxminus(X0, X_gt)))
        ext = Pose(jnp.stack([Pose.identity().q, X0.q]),
                   jnp.stack([Pose.identity().t, X0.t]))
        pipe.window = E.set_extrinsics(pipe.window, ext)
        pipe.window = E.reset_prior(pipe.window, cfg, calibrate_ext=True)
        for i in range(n):
            img0 = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs0])
            img1 = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs1])
            out = pipe.process([img0, img1])
        ext1 = Pose(out.extrinsics.q[1], out.extrinsics.t[1])
        err = float(jnp.linalg.norm(se3.boxminus(ext1, X_gt)))
        assert err < 0.6 * err0, f"refinement did not converge: {err0} -> {err}"
        assert err < 0.05


class TestModeTransitionBuffers:
    def test_reset_prior_does_not_alias_live_buffers(self):
        """At a calibration mode transition, reset_prior must deep-copy the
        linearization points: if prior_poses/prior_ext alias poses/ext, the
        window pytree carries the same device buffer in two leaves and the
        next donated fused-step dispatch (jit donate_argnums=(0,)) fails
        with 'attempt to donate the same buffer twice' (regression: the
        2->1->0 lifecycle crashed on entering the steady fused path)."""
        from mloam_tpu.models import platforms
        from mloam_tpu.odometry import estimator as E

        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=1)
        w = E.init_window(
            cfg, cfg.odometry.cap_frame_corner, cfg.odometry.cap_frame_surf
        )
        for calibrate_ext in (True, False):
            r = E.reset_prior(w, cfg, calibrate_ext=calibrate_ext)
            for a, b in [(r.prior_poses.q, r.poses.q),
                         (r.prior_poses.t, r.poses.t),
                         (r.prior_ext.q, r.ext.q),
                         (r.prior_ext.t, r.ext.t)]:
                assert (a.unsafe_buffer_pointer()
                        != b.unsafe_buffer_pointer()), \
                    "prior linearization point aliases the live buffer"


class TestCalibMapLidarRestriction:
    def test_calib_map_excludes_nonref_lidar(self):
        """In calibration mode the local map is formed by the REFERENCE
        lidar only (buildCalibMap, estimator.cpp:1067-1156): if the target
        lidar's own points enter the map, its calib factors match them
        against themselves — self-consistent at any extrinsic — and the
        refinement never moves (regression: hand-eye's noisy 0.3 m
        translation seed survived all of mode 1; with the restriction the
        lifecycle converges to ~4 mm / 1.5 mrad)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mloam_tpu.frontend.features import FeatCloud
        from mloam_tpu.models import platforms
        from mloam_tpu.odometry import estimator as E

        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=1)
        nc, ns = cfg.odometry.cap_frame_corner, cfg.odometry.cap_frame_surf
        w = E.init_window(cfg, nc, ns)

        def cloud(n, base):
            # lidar 0 points near base, lidar 1 points far away (z = +100)
            xyz0 = base + jax.random.uniform(
                jax.random.PRNGKey(int(base[0])), (n, 3), minval=-5, maxval=5)
            xyz1 = xyz0 + jnp.array([0.0, 0.0, 100.0])
            return FeatCloud(
                xyz=jnp.stack([xyz0, xyz1]),
                mask=jnp.ones((2, n), bool),
                time=jnp.zeros((2, n)),
                ring=jnp.zeros((2, n), jnp.int32),
            )

        from mloam_tpu.core.se3 import Pose
        for i in range(cfg.odometry.window_size + 1):
            base = jnp.array([float(i), 0.0, 0.0])
            w = E.push_frame(
                w, Pose(jnp.array([1.0, 0, 0, 0]), base),
                cloud(nc, base), cloud(ns, base), cfg,
            )

        c_map, c_m, s_map, s_m = E.build_local_map(w, cfg, map_lidars=(0,))
        for xyz, m in [(c_map, c_m), (s_map, s_m)]:
            z = np.asarray(xyz[..., 2])[np.asarray(m)]
            assert z.size > 0
            assert z.max() < 50.0, "non-ref lidar points leaked into calib map"

        # default (pure odometry): both lidars form the map
        c_map, c_m, _, _ = E.build_local_map(w, cfg)
        z = np.asarray(c_map[..., 2])[np.asarray(c_m)]
        assert z.max() > 50.0
