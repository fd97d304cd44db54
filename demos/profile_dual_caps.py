"""On-chip A/B for the dual-lidar fused steady path: full per-lidar feature
caps (1024 corner / 2048 surf — the single-lidar budget PER LIDAR) vs
rig-normalized caps (the same TOTAL budget split across lidars).

Rationale: the window solve cost scales with the total per-sweep feature
count (matching + per-point Jacobians + Gram blocks). Two overlapping-FOV
lidars don't see twice the unique structure — the local map density is
bounded by the voxel leaves either way — so splitting one sweep budget
across the rig should buy back the single-lidar step time without hurting
accuracy. This experiment decides the multi-rig preset defaults.

Interleaved passes over disjoint sequences (A B A B) cancel tunnel drift.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.odometry import estimator as E
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation

N = 28
N_PASSES = 3
X = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))


def make_seq(cfg, n, seed):
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1), wobble=0.05)
    model = cfg.rig.models[0]
    s0, gt = W.render_sequence(w, traj, model, n)
    s1, _ = W.render_sequence(w, traj, model, n, extrinsic=X)
    to_np = lambda s: jax.tree.map(np.asarray, s)
    s0, s1 = to_np(s0), to_np(s1)
    packed = []
    for i in range(n):
        f0 = RI.pack_frame(RangeImage(*[x[i] for x in s0]))
        f1 = RI.pack_frame(RangeImage(*[x[i] for x in s1]))
        packed.append((jax.tree.map(np.asarray, f0),
                       jax.tree.map(np.asarray, f1)))
    return packed, np.asarray(gt.t[:n])


def make_pipe(cfg):
    pipe = OdometryPipeline(cfg)
    ext = Pose(jnp.stack([Pose.identity().q, X.q]),
               jnp.stack([Pose.identity().t, X.t]))
    pipe.window = E.set_extrinsics(pipe.window, ext)
    orig = pipe.reset

    def reset():
        orig()
        pipe.window = E.set_extrinsics(pipe.window, ext)

    pipe.reset = reset
    return pipe


def run_pass(pipe, seq):
    pipe.reset()
    est_t = []
    t_steady = None
    n_steady = 0
    for i, (f0, f1) in enumerate(seq):
        imgs = [RI.PackedFrame(*[jnp.asarray(x) for x in f0]),
                RI.PackedFrame(*[jnp.asarray(x) for x in f1])]
        out = pipe.process(imgs)
        est_t.append(out.pose.t)
        if i == 9:
            jax.block_until_ready(out.pose)
            t_steady = time.perf_counter()
        if i > 9:
            n_steady += 1
    jax.block_until_ready(out.pose)
    dt = (time.perf_counter() - t_steady) / n_steady
    return dt, np.asarray(jnp.stack(est_t))


def main():
    print("platform:", jax.devices()[0].platform)
    cfg_full = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
    cfg_half = dataclasses.replace(
        cfg_full,
        odometry=dataclasses.replace(
            cfg_full.odometry,
            cap_frame_corner=512, cap_frame_surf=1024,
            localmap_precap_corner=1024, localmap_precap_surf=5120,
        ),
    )

    seqs = [make_seq(cfg_full, N, seed) for seed in (0, 7, 11, 13)]
    pipes = {"full_caps": make_pipe(cfg_full), "half_caps": make_pipe(cfg_half)}

    for pipe in pipes.values():  # warm compiles
        run_pass(pipe, seqs[0][0])

    res = {k: [] for k in pipes}
    for p in range(N_PASSES):
        seq, gt = seqs[1 + p]
        for name, pipe in pipes.items():
            dt, est = run_pass(pipe, seq)
            ate = evaluation.ate_rmse(est, gt)
            res[name].append((dt, ate))
            print(f"pass {p} {name:10s} {dt*1e3:7.2f} ms/frame "
                  f"ate={ate*100:.2f} cm")
    for name, rs in res.items():
        dts = [r[0] for r in rs]
        ates = [r[1] for r in rs]
        print(f"{name:10s} median {np.median(dts)*1e3:.2f} ms "
              f"({1.0/np.median(dts):.1f} fps)  ate max {max(ates)*100:.2f} cm")


if __name__ == "__main__":
    main()
