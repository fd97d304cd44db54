"""Measure the SUPPORT CONCENTRATION of weak-direction curvature:
n_eff = (Σa)²/Σa², a_i = w_i (J_i·v0)², per course. The round-5 gate
candidate after every Hessian-eigenvalue statistic failed to separate
regimes (magnitude/eigengap/persistence/consistency/purity all overlap —
demos/probe_eig_gap.py, probe_persistence.py, probe_innovation.py):
spurious corridor information is CONCENTRATED in a handful of
companion/noise returns, genuine sparse-geometry information is spread
over hundreds of features."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

THR = 175.0


def run(name, w, traj, cfg, model, frames=90, noise=0.0, start=12,
        companions=None, comp_period=None, mount=None):
    imgs, gt = W.render_sequence(
        w, traj, model, frames, noise_std=noise, noise_seed=7,
        extrinsic=mount,
        companions=companions,
        companion_frames=(15, frames) if companions is not None else None,
        companion_period=comp_period)
    pipe = OdometryPipeline(cfg)
    neffs, neffs_all = [], []
    for i in range(frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        if i >= start and out.win_support_neff is not None:
            ne = float(np.asarray(out.win_support_neff))
            e0 = float(np.asarray(out.win_eig_shared)[0])
            neffs_all.append(ne)
            if e0 < THR:
                neffs.append(ne)
    neffs = np.array(neffs) if neffs else np.array([np.nan])
    print(f"{name:18s} sub-thr n_eff: min {np.min(neffs):7.1f} "
          f"p10 {np.percentile(neffs,10):7.1f} med {np.median(neffs):7.1f} "
          f"p90 {np.percentile(neffs,90):7.1f}  ({len(neffs)} frames)",
          flush=True)


base = platforms.synthetic(n_lidars=1)
# arm the diagnostics (the product default ships disarmed) but never let
# the remap engage — an engaged freeze would distort the measurement
base = dataclasses.replace(base, odometry=dataclasses.replace(
    base.odometry, eig_threshold=175.0, eig_persist_k=10**6))

w = W.make_world(jax.random.PRNGKey(3), extent=30.0, n_walls=20, n_poles=10)
traj = W.make_loop_trajectory(radius=6.0, period_s=10.0)
run("loop-noiseless", w, traj, base, base.rig.models[0], frames=100)

model = base.rig.models[0]._replace(max_range=20.0)
ccfg = dataclasses.replace(base, rig=dataclasses.replace(
    base.rig, models=(model,)),
    tracker=dataclasses.replace(base.tracker, skip_steady=True))
cw = W.make_corridor_world(wall_height=3.0, ceiling=True)
ctraj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
mount = Pose(jax.numpy.asarray(np.array([1.0, 0, 0, 0], np.float32)),
             jax.numpy.asarray(np.array([0, 0, 1.2], np.float32)))
run("corridor-0.01", cw, ctraj, ccfg, model, noise=0.01, start=15,
    mount=mount)

comp = np.array([[5.0, 0.8, 0.12]], np.float32)
run("companion-burst", cw, ctraj, ccfg, model, noise=0.01, start=15,
    companions=jax.numpy.asarray(comp), comp_period=(3, 10), mount=mount)
