"""Measure (a) the COMPOSITION of the weak direction and (b) the
constant-velocity innovation along it, per course. Candidate gate: engage
the remap only when sub-threshold persistence coincides with a BIASED
innovation stream (spurious information pulls one way; genuine sparse
information corrects the CV prediction in a way that tracks real motion).

Innovation here = boxminus(pose_t, pose_{t-1} ∘ (pose_{t-2}⁻¹ ∘ pose_{t-1}))
— the update the solve applied relative to the constant-velocity
extrapolation of its own trajectory, projected on the weak direction."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

THR = 175.0
AXES = ["tx", "ty", "tz", "rx", "ry", "rz"]


def run(name, w, traj, cfg, model, frames=90, noise=0.0, start=10,
        companions=None, comp_period=None):
    imgs, gt = W.render_sequence(
        w, traj, model, frames, noise_std=noise, noise_seed=7,
        companions=companions,
        companion_frames=(15, frames) if companions is not None else None,
        companion_period=comp_period)
    pipe = OdometryPipeline(cfg)
    poses, e0s, dirs = [], [], []
    for i in range(frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        poses.append(Pose(np.asarray(out.pose.q), np.asarray(out.pose.t)))
        if out.win_eig_shared is not None:
            e0s.append(float(np.asarray(out.win_eig_shared)[0]))
            dirs.append(np.asarray(out.win_weak_dir))
        else:
            e0s.append(1e9)
            dirs.append(np.zeros(6))
    e0s = np.array(e0s)
    dirs = np.stack(dirs)
    # CV innovation per frame
    inn = np.zeros((frames, 6))
    for t in range(2, frames):
        pm1 = Pose(*map(jax.numpy.asarray, (poses[t - 1].q, poses[t - 1].t)))
        pm2 = Pose(*map(jax.numpy.asarray, (poses[t - 2].q, poses[t - 2].t)))
        pt = Pose(*map(jax.numpy.asarray, (poses[t].q, poses[t].t)))
        motion = se3.compose(se3.inverse(pm2), pm1)
        pred = se3.compose(pm1, motion)
        inn[t] = np.asarray(se3.boxminus(pt, pred))
    below = e0s < THR
    sel = below.copy()
    sel[:start] = False
    # weak-dir composition (mean absolute components over below frames)
    comp = np.abs(dirs[sel]).mean(0) if sel.any() else np.zeros(6)
    dom = AXES[int(np.argmax(comp))] if sel.any() else "-"
    # innovation along the weak dir, signed, on below frames
    ia = np.array([np.dot(inn[t], dirs[t]) for t in range(frames)])
    ia_sel = ia[sel]
    # bias measure: |mean| vs std over a sliding window of 8
    win = 8
    ema = []
    for t in range(start, frames):
        lo = max(t - win + 1, 0)
        if below[lo:t + 1].all() and t - lo + 1 == win:
            ema.append(abs(np.mean(ia[lo:t + 1])))
    ema = np.array(ema) if ema else np.array([0.0])
    print(f"{name:18s} below {below[start:].mean():.2f} dom={dom} "
          f"comp={np.round(comp, 2)}", flush=True)
    if sel.any():
        print(f"{'':18s} innov: mean {ia_sel.mean()*100:7.2f} cm  "
              f"std {ia_sel.std()*100:6.2f}  |mean8|: med "
              f"{np.median(ema)*100:6.2f} p90 "
              f"{np.percentile(ema, 90)*100:6.2f} max {ema.max()*100:6.2f}",
              flush=True)


base = platforms.synthetic(n_lidars=1)
# measurement run: keep diagnostics armed but never let the remap engage
# (an engaged freeze would zero the innovations being measured)
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
cw = W.make_corridor_world(wall_height=3.0, ceiling=True)
ctraj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
run("corridor-0.01", cw, ctraj, ccfg, model, noise=0.01, start=15)

comp = np.array([[5.0, 0.8, 0.12]], np.float32)
run("companion-burst", cw, ctraj, ccfg, model, noise=0.01, start=15,
    companions=jax.numpy.asarray(comp), comp_period=(3, 10))


def purity_stats(name, w, traj, cfg, model, frames=90, noise=0.0, start=10,
                 companions=None, comp_period=None):
    imgs, gt = W.render_sequence(
        w, traj, model, frames, noise_std=noise, noise_seed=7,
        companions=companions,
        companion_frames=(15, frames) if companions is not None else None,
        companion_period=comp_period)
    pipe = OdometryPipeline(cfg)
    e0s, pur = [], []
    for i in range(frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        if i >= start and out.win_eig_shared is not None:
            e0 = float(np.asarray(out.win_eig_shared)[0])
            if e0 < THR:
                pur.append(np.max(np.abs(np.asarray(out.win_weak_dir))))
    pur = np.array(pur) if pur else np.array([0.0])
    print(f"{name:18s} sub-thr frames {len(pur)}: purity min {pur.min():.3f}"
          f" p10 {np.percentile(pur,10):.3f} med {np.median(pur):.3f}"
          f" p90 {np.percentile(pur,90):.3f}"
          f" | frac>=0.8: {np.mean(pur>=0.8):.2f}"
          f" frac>=0.9: {np.mean(pur>=0.9):.2f}", flush=True)


if os.environ.get("PURITY"):
    w2 = W.make_world(jax.random.PRNGKey(3), extent=30.0, n_walls=20,
                      n_poles=10)
    t2 = W.make_loop_trajectory(radius=6.0, period_s=10.0)
    purity_stats("loop-noiseless", w2, t2, base, base.rig.models[0],
                 frames=100)
    purity_stats("corridor-0.01", cw, ctraj, ccfg, model, noise=0.01,
                 start=15)
    purity_stats("companion-burst", cw, ctraj, ccfg, model, noise=0.01,
                 start=15, companions=jax.numpy.asarray(comp),
                 comp_period=(3, 10))
