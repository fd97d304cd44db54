"""Measure the degeneracy-eigenvalue floors that calibrate eig thresholds.

Runs three regimes on CPU and prints per-regime percentiles of (a) the
tracker solve's smallest measurement eigenvalue and (b) the window solve's
smallest non-pivot block eigenvalue:
  rich      — the bench's feature-rich random world
  corridor  — the featureless corridor (interior frames only)
  companion — corridor + a co-moving object (the spurious-information case)

The thresholds must sit ABOVE the corridor/companion floors (so the remap
engages where geometry is degenerate) and BELOW the rich floor (silent on
well-observed scenes) — the reference tunes eig_thre_ per platform config
the same way (estimator.cpp:1598-1680, config yamls).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mloam_tpu.core.se3 import Pose
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

FRAMES = 60
NOISE = float(__import__("os").environ.get("EIG_NOISE", "0.02"))


def run(name, w, traj, cfg, model, companions=None, start=20):
    imgs, gt = W.render_sequence(
        w, traj, model, FRAMES, noise_std=NOISE, noise_seed=7,
        companions=companions,
        companion_frames=(15, FRAMES) if companions is not None else None)
    pipe = OdometryPipeline(cfg)
    trk, win = [], []
    for i in range(FRAMES):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        if i >= start:
            if out.trk_eig is not None:
                trk.append(float(np.asarray(out.trk_eig)[0]))
            if out.win_eig is not None:
                win.append(np.asarray(out.win_eig)[1:])  # [n-1, 6] non-pivot
    trk = np.array(trk)
    win = np.concatenate(win) if win else np.zeros((0, 6))
    e0, e1 = win[:, 0], win[:, 1]
    print(f"{name:10s} trk e0: min {trk.min():7.1f} med {np.median(trk):7.1f}"
          f" | win e0: min {e0.min():7.1f} p10 {np.percentile(e0,10):7.1f}"
          f" med {np.median(e0):7.1f}"
          f" | win e1: min {e1.min():7.1f} p10 {np.percentile(e1,10):7.1f}"
          f" med {np.median(e1):7.1f}")


base = platforms.synthetic(n_lidars=1)
base = dataclasses.replace(base, tracker=dataclasses.replace(
    base.tracker, eig_threshold=1e-6))

# rich world (bench configuration)
w = W.make_world(jax.random.PRNGKey(7))
traj = W.make_trajectory(jax.random.PRNGKey(8))
run("rich", w, traj, base, base.rig.models[0])

# corridor
model = base.rig.models[0]._replace(max_range=20.0)
ccfg = dataclasses.replace(base, rig=dataclasses.replace(
    base.rig, models=(model,)))
w = W.make_corridor_world()
traj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
run("corridor", w, traj, ccfg, model)

# corridor + companion (pillar-sized object keeping pace 4 m ahead)
comp = np.array([[4.0, 0.8, 0.25]], np.float32)
run("companion", w, traj, ccfg, model, companions=jax.numpy.asarray(comp))
