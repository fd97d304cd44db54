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
