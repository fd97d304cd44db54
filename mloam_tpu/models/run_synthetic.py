"""End-to-end odometry on a simulated sequence with ATE report.

Usage: python -m mloam_tpu.models.run_synthetic [n_frames]
(The verify skill's surface #4; also used by tests and bench.)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation, timing


def render(cfg, n_frames: int, seed: int = 0):
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1))
    model = cfg.rig.models[0]
    imgs, poses = W.render_sequence(w, traj, model, n_frames)
    return imgs, poses


def run(n_frames: int = 40, seed: int = 0, verbose: bool = True):
    cfg = platforms.synthetic(n_lidars=1)
    imgs, gt_poses = render(cfg, n_frames, seed)
    pipe = OdometryPipeline(cfg)

    est_t, est_q = [], []
    t_start = time.perf_counter()
    for i in range(n_frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        with timing.timer("odom_process"):
            out = pipe.process([img])
            jax.block_until_ready(out.pose)
        est_t.append(np.asarray(out.pose.t))
        est_q.append(np.asarray(out.pose.q))
    wall = time.perf_counter() - t_start

    est_t = np.stack(est_t)
    gt_t = np.asarray(gt_poses.t[:n_frames])
    ate = evaluation.ate_rmse(est_t, gt_t)
    # drop the first 2 compile-heavy frames from the fps statistic
    per_frame = [s for s in timing._registry["odom_process"][3:]]
    fps = 1.0 / np.mean(per_frame) if per_frame else 0.0
    if verbose:
        print(timing.report())
        print(f"frames={n_frames} wall={wall:.1f}s steady-state fps={fps:.2f}")
        print(f"ATE RMSE = {ate*100:.2f} cm over "
              f"{np.linalg.norm(np.diff(gt_t, axis=0), axis=1).sum():.1f} m path")
    return {"ate_m": ate, "fps": float(fps), "n_frames": n_frames}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    run(n)
