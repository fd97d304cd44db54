"""Long-sequence stability regression (the round-1 latent risk probe).

200 frames with range noise through the window odometry. Guards the two
failure modes found on the first 500-frame run:
  * marginal-prior indefiniteness compounding through the recursive Schur
    (min eigenvalue drifted -0.2 -> -13 over 300 frames, then the solve
    rode the negative-curvature directions into 28 m of divergence) — now
    PSD-projected in schur_marginalize_quad;
  * drift-lock (estimate pinned near a stale attractor while ground truth
    moves on) — caught by the per-frame drift gate, not just final ATE.
"""

import jax
import numpy as np
import pytest

from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

N = 200


@pytest.fixture(scope="module")
def long_run():
    cfg = platforms.synthetic(n_lidars=1)
    w = W.make_world(jax.random.PRNGKey(0))
    traj = W.make_trajectory(jax.random.PRNGKey(1), wobble=0.05)
    model = cfg.rig.models[0]
    imgs, gt = W.render_sequence(w, traj, model, N, noise_std=0.02,
                                 noise_seed=1000)
    # gt in the estimate's frame (the trajectory does not start at origin)
    g0 = Pose(gt.q[0], gt.t[0])
    gt_rel = np.stack([
        np.asarray(se3.compose(se3.inverse(g0),
                               Pose(gt.q[i], gt.t[i])).t) for i in range(N)
    ])
    pipe = OdometryPipeline(cfg)
    est, prior_min_eig = [], []
    for i in range(N):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        est.append(np.asarray(out.pose.t))
        if i % 25 == 24:
            pr = pipe.window.prior
            if bool(np.asarray(pr.valid)):
                prior_min_eig.append(
                    float(np.linalg.eigvalsh(np.asarray(pr.H))[0]))
    return np.stack(est), gt_rel, prior_min_eig


class TestLongRunStability:
    def test_drift_stays_bounded_every_frame(self, long_run):
        """Measured healthy envelope on this exact sequence at round-3
        HEAD: max |err| 0.89 m at frame 194, steady drift ~5.7 mm/frame
        after frame 80 (~1% of path — odometry-only, noise 0.02 m; the
        translation error is lever-arm x accumulated yaw error, present
        even noiseless/undistorted, i.e. characteristic unclosed-odometry
        random walk, not a defect — mapping absorbs it: the 500-frame full
        pipeline lands at 2 cm ATE). Gates are the envelope with margin:
        divergence (the pre-PSD-fix run grew 28 m over 500 frames,
        >50 mm/frame late) and drift-lock blow through both."""
        est, gt_rel, _ = long_run
        err = np.linalg.norm(est - gt_rel, axis=1)
        assert float(err.max()) < 1.5, (
            f"drift {err.max():.2f} m at frame {int(err.argmax())}")
        # trailing drift RATE: least-squares slope over the last 100 frames
        # (healthy ~6 mm/frame; divergence shows 10x that)
        n = err.shape[0]
        A = np.vstack([np.arange(n - 100, n), np.ones(100)]).T
        rate = np.linalg.lstsq(A, err[n - 100:], rcond=None)[0][0]
        assert rate < 0.017, f"drift rate {rate*1e3:.1f} mm/frame"

    def test_prior_stays_psd(self, long_run):
        _, _, prior_min_eig = long_run
        assert prior_min_eig, "prior never became valid"
        assert min(prior_min_eig) > -1e-2, (
            f"marginal prior went indefinite: min eig {min(prior_min_eig)}")

    def test_no_nans(self, long_run):
        est, _, _ = long_run
        assert np.isfinite(est).all()
