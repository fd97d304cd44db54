"""On-chip A/B of the dual-lidar fused steady path: vmapped (batched)
frontends vs per-lidar unrolled frontends.

Both variants run interleaved (A B A B ...) over disjoint rendered
sequences so tunnel load drift cancels; timing is the chained throughput of
the fused multi step (pipeline state carries the data dependency).
"""

from __future__ import annotations

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


def make_seq(cfg, X, n, seed):
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


def make_pipe(cfg, X):
    pipe = OdometryPipeline(cfg)
    ext = Pose(jnp.stack([Pose.identity().q, X.q]),
               jnp.stack([Pose.identity().t, X.t]))
    pipe.window = E.set_extrinsics(pipe.window, ext)
    return pipe


def run_pass(pipe, seq):
    pipe.reset()
    # reset clears extrinsics too; reinstall
    L = pipe.cfg.rig.n_lidars
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
    X = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))

    cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
    seqs = [make_seq(cfg, X, N, seed) for seed in (0, 7, 11, 13)]

    os.environ["MLOAM_BATCH_FE"] = "1"
    pipe_b = make_pipe(cfg, X)
    os.environ["MLOAM_BATCH_FE"] = "0"
    pipe_u = make_pipe(cfg, X)
    assert pipe_b._uniform_rig and not pipe_u._uniform_rig

    # extrinsics must be reinstalled after reset inside run_pass
    orig_reset_b, orig_reset_u = pipe_b.reset, pipe_u.reset
    ext = Pose(jnp.stack([Pose.identity().q, X.q]),
               jnp.stack([Pose.identity().t, X.t]))

    def wrap(pipe, orig):
        def r():
            orig()
            pipe.window = E.set_extrinsics(pipe.window, ext)
        return r

    pipe_b.reset = wrap(pipe_b, orig_reset_b)
    pipe_u.reset = wrap(pipe_u, orig_reset_u)

    # warm both compiled paths
    run_pass(pipe_b, seqs[0][0])
    run_pass(pipe_u, seqs[0][0])

    res = {"batched": [], "unrolled": []}
    for p in range(N_PASSES):
        seq, gt = seqs[1 + p]
        for name, pipe in (("batched", pipe_b), ("unrolled", pipe_u)):
            dt, est = run_pass(pipe, seq)
            ate = evaluation.ate_rmse(est, gt)
            res[name].append((dt, ate))
            print(f"pass {p} {name:9s} {dt*1e3:7.2f} ms/frame "
                  f"ate={ate*100:.2f} cm")

    for name in ("batched", "unrolled"):
        dts = [r[0] for r in res[name]]
        print(f"{name:9s} median {np.median(dts)*1e3:.2f} ms "
              f"({1.0/np.median(dts):.1f} fps)")


if __name__ == "__main__":
    main()
