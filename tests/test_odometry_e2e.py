"""End-to-end odometry integration: simulated sequence -> ATE gate.

The counterpart of the reference's dataset-replay testing (SR bags with
/base_odom_gt, rosNodeSR.cpp:164-192) as a deterministic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.utils import evaluation

N_FRAMES = 16


@pytest.fixture(scope="module")
def trajectory_run():
    cfg = platforms.synthetic(n_lidars=1)
    imgs, gt_poses = render(cfg, N_FRAMES)
    pipe = OdometryPipeline(cfg)
    est_t, est_q = [], []
    for i in range(N_FRAMES):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        est_t.append(np.asarray(out.pose.t))
        est_q.append(np.asarray(out.pose.q))
    return np.stack(est_t), np.stack(est_q), gt_poses


class TestOdometryE2E:
    def test_ate_within_bounds(self, trajectory_run):
        est_t, _, gt = trajectory_run
        ate = evaluation.ate_rmse(est_t, np.asarray(gt.t[:N_FRAMES]))
        assert ate < 0.05, f"ATE {ate*100:.1f} cm exceeds 5 cm gate"

    def test_no_nans_in_trajectory(self, trajectory_run):
        est_t, est_q, _ = trajectory_run
        assert np.isfinite(est_t).all() and np.isfinite(est_q).all()

    def test_relative_motion_tracks_gt(self, trajectory_run):
        est_t, est_q, gt = trajectory_run
        # per-step translation magnitude should match ground truth closely
        d_est = np.linalg.norm(np.diff(est_t, axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(np.asarray(gt.t[:N_FRAMES]), axis=0), axis=1)
        np.testing.assert_allclose(d_est[2:], d_gt[2:], atol=0.02)


class TestMultiLidarFusedE2E:
    """The steady multi-lidar pure-odometry fast path (one dispatch per
    sweep): dual rig with known extrinsics, ATE gate (the reference's
    post-calibration NUM_OF_LASER path, estimator.cpp:789-848)."""

    def test_dual_lidar_fused_ate(self):
        from mloam_tpu.core.se3 import Pose
        from mloam_tpu.odometry import estimator as E
        from mloam_tpu.sim import world as W

        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
        w = W.make_world(jax.random.PRNGKey(0))
        traj = W.make_trajectory(jax.random.PRNGKey(1))
        model = cfg.rig.models[0]
        X = Pose(
            jnp.asarray([0.9659258, 0.0, 0.0, 0.258819], jnp.float32),
            jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
        )
        imgs0, gt = W.render_sequence(w, traj, model, N_FRAMES)
        imgs1, _ = W.render_sequence(w, traj, model, N_FRAMES, extrinsic=X)
        pipe = OdometryPipeline(cfg)
        ext = Pose(jnp.stack([Pose.identity().q, X.q]),
                   jnp.stack([Pose.identity().t, X.t]))
        pipe.window = E.set_extrinsics(pipe.window, ext)
        est = []
        for i in range(N_FRAMES):
            f0 = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs0])
            f1 = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs1])
            out = pipe.process([f0, f1])
            est.append(np.asarray(out.pose.t))
        # the fused multi-lidar program must actually be in use
        assert pipe._fused_multi is not None and pipe.ext_mode == 0
        ate = evaluation.ate_rmse(np.stack(est), np.asarray(gt.t[:N_FRAMES]))
        assert ate < 0.05, f"dual-lidar fused ATE {ate*100:.1f} cm"

    def test_batched_frontend_matches_unrolled(self):
        """The vmapped (uniform-rig) frontend path must produce the same
        trajectory as the per-lidar unrolled path: same programs, batched
        over the lidar axis (estimator.cpp:249's OpenMP loop counterpart)."""
        import os

        from mloam_tpu.core.se3 import Pose
        from mloam_tpu.odometry import estimator as E
        from mloam_tpu.sim import world as W

        n = 10
        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
        w = W.make_world(jax.random.PRNGKey(2))
        traj = W.make_trajectory(jax.random.PRNGKey(3))
        model = cfg.rig.models[0]
        X = Pose(
            jnp.asarray([0.9659258, 0.0, 0.0, 0.258819], jnp.float32),
            jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
        )
        imgs0, gt = W.render_sequence(w, traj, model, n)
        imgs1, _ = W.render_sequence(w, traj, model, n, extrinsic=X)
        ext = Pose(jnp.stack([Pose.identity().q, X.q]),
                   jnp.stack([Pose.identity().t, X.t]))

        def run(batch: str):
            os.environ["MLOAM_BATCH_FE"] = batch
            try:
                pipe = OdometryPipeline(cfg)
            finally:
                os.environ.pop("MLOAM_BATCH_FE", None)
            pipe.window = E.set_extrinsics(pipe.window, ext)
            est = []
            for i in range(n):
                f0 = RangeImage(*[jax.tree.map(lambda x: x[i], f)
                                  for f in imgs0])
                f1 = RangeImage(*[jax.tree.map(lambda x: x[i], f)
                                  for f in imgs1])
                out = pipe.process([f0, f1])
                est.append(np.asarray(out.pose.t))
            return pipe, np.stack(est)

        pipe_b, est_b = run("1")
        pipe_u, est_u = run("0")
        assert pipe_b._uniform_rig and not pipe_u._uniform_rig
        np.testing.assert_allclose(est_b, est_u, atol=1e-5)


class TestHerculesL4E2E:
    """Hercules-class rig (L=4, the reference's 4/5-lidar vehicle sync,
    rosNodeRVHercules.cpp:262-272): the fused steady path over four lidars
    and the calibration-phase mechanics with THREE non-reference lidars."""

    EXTS = [
        jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]),
        jnp.array([-0.2, 0.15, -0.05, -0.04, 0.06, -0.4]),
        jnp.array([0.1, 0.3, 0.02, 0.03, -0.05, 1.0]),
    ]

    def _render_rig(self, cfg, n, seed=0, wobble=0.05):
        from mloam_tpu.core.se3 import Pose
        from mloam_tpu.sim import world as W

        w = W.make_world(jax.random.PRNGKey(seed))
        traj = W.make_trajectory(jax.random.PRNGKey(seed + 1), wobble=wobble)
        model = cfg.rig.models[0]
        X = [se3.exp(x) for x in self.EXTS]
        seqs = [W.render_sequence(w, traj, model, n)] + [
            W.render_sequence(w, traj, model, n, extrinsic=x) for x in X
        ]
        ext = Pose(
            jnp.stack([Pose.identity().q] + [x.q for x in X]),
            jnp.stack([Pose.identity().t] + [x.t for x in X]),
        )
        return seqs, ext, seqs[0][1]

    def test_l4_fused_steady_ate(self):
        from mloam_tpu.odometry import estimator as E

        n = 12
        cfg = platforms.synthetic(n_lidars=4, extrinsic_mode=0)
        seqs, ext, gt = self._render_rig(cfg, n)
        pipe = OdometryPipeline(cfg)
        pipe.window = E.set_extrinsics(pipe.window, ext)
        est = []
        for i in range(n):
            frames = [
                RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
                for imgs, _ in seqs
            ]
            out = pipe.process(frames)
            est.append(np.asarray(out.pose.t))
        assert pipe._fused_multi is not None and pipe.ext_mode == 0
        ate = evaluation.ate_rmse(np.stack(est), np.asarray(gt.t[:n]))
        assert ate < 0.05, f"L=4 fused ATE {ate*100:.1f} cm"

    def test_l4_calib_phase_mechanics(self):
        """Mode-2 start with three unknown extrinsics: every non-ref lidar
        is tracked independently and its screw-consistent pairs accumulate
        in its own hand-eye buffer (the full 2->1->0 lifecycle at L=4 runs
        in `experiments calib --lidars 4` — 90+ frames, artifact-gated)."""
        n = 8
        cfg = platforms.synthetic(n_lidars=4, extrinsic_mode=2)
        # rotation-rich motion: the screw filter needs orientation excitation
        seqs, _, _ = self._render_rig(cfg, n, wobble=0.25)
        pipe = OdometryPipeline(cfg)
        for i in range(n):
            frames = [
                RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
                for imgs, _ in seqs
            ]
            out = pipe.process(frames)
            assert np.isfinite(np.asarray(out.pose.t)).all()
        assert pipe.ext_mode == 2
        for l in (1, 2, 3):
            assert int(pipe.calib_buffers[l].head) > 0, (
                f"lidar {l} accumulated no hand-eye pairs"
            )
