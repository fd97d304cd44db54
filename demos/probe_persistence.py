"""Measure the TEMPORAL structure of sub-threshold moments: run lengths of
e0_shared < THR and frame-to-frame consistency of the weak direction, on
the corridor (sustained degeneracy) vs the noiseless turning loop course
(transient dips). This decides the persistence-gate constants (round-5:
neither absolute thresholds nor per-frame eigengaps separate the regimes —
the separation is temporal)."""
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
CONS = 0.9


def run(name, w, traj, cfg, model, frames=80, noise=0.0, start=10,
        companions=None):
    imgs, gt = W.render_sequence(
        w, traj, model, frames, noise_std=noise, noise_seed=7,
        companions=companions,
        companion_frames=(15, frames) if companions is not None else None)
    pipe = OdometryPipeline(cfg)
    e0s, dirs = [], []
    for i in range(frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        if i >= start and out.win_eig_shared is not None:
            e0s.append(float(np.asarray(out.win_eig_shared)[0]))
            dirs.append(np.asarray(out.win_weak_dir))
    e0s = np.array(e0s)
    dirs = np.stack(dirs)
    below = e0s < THR
    cons = np.abs(np.sum(dirs[1:] * dirs[:-1], axis=1))
    # persistent-fire condition: below AND consistent with previous frame
    fire = below.copy()
    fire[1:] &= below[:-1] & (cons > CONS)
    fire[0] = False
    # run lengths of the raw below condition and the joint condition
    def runs(mask):
        out, c = [], 0
        for m in mask:
            if m:
                c += 1
            elif c:
                out.append(c)
                c = 0
        if c:
            out.append(c)
        return out or [0]
    # count of frames that would fire under "below & consistent for >= K"
    for K in (2, 3, 5, 8):
        cnt = 0
        streak = 0
        for t in range(len(e0s)):
            ok = below[t] and (t == 0 or cons[t - 1] > CONS)
            streak = streak + 1 if ok else 0
            if below[t] and streak >= K:
                cnt += 1
        print(f"  {name:16s} K={K}: fires {cnt}/{len(e0s)}", flush=True)
    rb = runs(below)
    print(f"{name:16s} below-rate {below.mean():.2f} "
          f"run-lens max {max(rb)} mean {np.mean(rb):.1f} "
          f"| cons med {np.median(cons):.3f} p10 "
          f"{np.percentile(cons,10):.3f}", flush=True)


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
    base.rig, models=(model,)))
w = W.make_corridor_world()
traj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
run("corridor-0.01", w, traj, ccfg, model, noise=0.01, start=15)

comp = np.array([[4.0, 0.8, 0.25]], np.float32)
run("companion-0.01", w, traj, ccfg, model, noise=0.01, start=15,
    companions=jax.numpy.asarray(comp))
