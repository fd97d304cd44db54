"""Probe e0 vs e1 (the eigengap) across regimes to design the RELATIVE
degeneracy gate (round-5: an absolute eigenvalue threshold cannot separate
"corridor at noise 0.01" from "noiseless turning course" — VERDICT r4 #3).

Prints per-regime percentiles of the window solve's non-pivot block spectra:
e0, e1, and the ratio e0/e1. A workable relative gate needs the corridor's
ratio band to sit clearly BELOW every observable course's ratio band.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W


THR = 175.0
REL = 0.25


def run(name, w, traj, cfg, model, frames=60, noise=0.0, start=15,
        companions=None):
    imgs, gt = W.render_sequence(
        w, traj, model, frames, noise_std=noise, noise_seed=7,
        companions=companions,
        companion_frames=(15, frames) if companions is not None else None)
    pipe = OdometryPipeline(cfg)
    sh = []
    for i in range(frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        if i >= start and out.win_eig_shared is not None:
            sh.append(np.asarray(out.win_eig_shared))   # [6] shared spectrum
    sh = np.stack(sh)
    e0, e1 = sh[:, 0], sh[:, 1]
    r = e0 / np.maximum(e1, 1e-6)
    # would-fire rates under candidate gates (freeze dir 0 only)
    abs_fire = float(np.mean(e0 < THR))
    rel_fire = float(np.mean((e0 < THR) & (e0 < REL * e1)))
    print(f"{name:16s} sh-e0: min {e0.min():7.1f} p10 "
          f"{np.percentile(e0,10):7.1f} med {np.median(e0):7.1f}"
          f" | sh-e1: min {e1.min():7.1f} med {np.median(e1):7.1f}"
          f" | e0/e1: min {r.min():.3f} p10 {np.percentile(r,10):.3f}"
          f" med {np.median(r):.3f}"
          f" | fire abs<{THR:.0f}: {abs_fire:.2f}"
          f" rel{REL}: {rel_fire:.2f}", flush=True)
    return sh


base = platforms.synthetic(n_lidars=1)
base = dataclasses.replace(
    base,
    tracker=dataclasses.replace(base.tracker, eig_threshold=0.0),
    odometry=dataclasses.replace(base.odometry, eig_threshold=0.0),
    mapping=dataclasses.replace(base.mapping, eig_threshold=0.0))

# 1. the failing SLAM test's exact noiseless turning course
w = W.make_world(jax.random.PRNGKey(3), extent=30.0, n_walls=20, n_poles=10)
traj = W.make_loop_trajectory(radius=6.0, period_s=10.0)
run("loop-noiseless", w, traj, base, base.rig.models[0], frames=80)

# 2. the bench's rich world, noiseless and noisy
w = W.make_world(jax.random.PRNGKey(7))
traj = W.make_trajectory(jax.random.PRNGKey(8))
run("rich-0.00", w, traj, base, base.rig.models[0])
run("rich-0.02", w, traj, base, base.rig.models[0], noise=0.02)

# 3. corridor at noise 0.01 (the engagement regime)
model = base.rig.models[0]._replace(max_range=20.0)
ccfg = dataclasses.replace(base, rig=dataclasses.replace(
    base.rig, models=(model,)))
w = W.make_corridor_world()
traj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
run("corridor-0.01", w, traj, ccfg, model, noise=0.01, start=20)

# 4. corridor + co-moving companion (spurious information)
comp = np.array([[4.0, 0.8, 0.25]], np.float32)
run("companion-0.01", w, traj, ccfg, model, noise=0.01, start=20,
    companions=jax.numpy.asarray(comp))
