"""Chained on-chip attribution of the DUAL-lidar fused step.

Same methodology as profile_stages2 (every timed loop carries a device-side
data dependency): fused step, frontend (x2 lidars), tracker, and the window
decomposition localmap -> match -> full window solve.
"""

from __future__ import annotations

import functools
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
from mloam_tpu.solver import factors

N = 24


def main():
    print("platform:", jax.devices()[0].platform)
    X = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))
    cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
    import dataclasses as _dc
    if os.environ.get("DUAL_CAPS") == "third":
        cfg = _dc.replace(cfg, odometry=_dc.replace(
            cfg.odometry, cap_frame_corner=384, cap_frame_surf=768,
            localmap_precap_corner=768, localmap_precap_surf=3840))
    n_total = N + 10
    w = W.make_world(jax.random.PRNGKey(0))
    traj = W.make_trajectory(jax.random.PRNGKey(1), wobble=0.05)
    model = cfg.rig.models[0]
    s0, _ = W.render_sequence(w, traj, model, n_total)
    s1, _ = W.render_sequence(w, traj, model, n_total, extrinsic=X)
    s0 = jax.tree.map(np.asarray, s0)
    s1 = jax.tree.map(np.asarray, s1)

    pipe = OdometryPipeline(cfg)
    ext = Pose(jnp.stack([Pose.identity().q, X.q]),
               jnp.stack([Pose.identity().t, X.t]))
    pipe.window = E.set_extrinsics(pipe.window, ext)

    def frame(seq, i):
        return RangeImage(*[jnp.asarray(x[i]) for x in seq])

    # wire-format frames (the deployment input; an f32 RangeImage is
    # 0.72 MB/sweep over the ~30-50 MB/s tunnel = 15-25 ms h2d — measuring
    # the fused step with raw images attributes transfer, not compute)
    def wire(seq, i):
        pf = RI.pack_frame(RangeImage(*[np.asarray(x[i]) for x in seq]))
        return RI.PackedFrame(*[jnp.asarray(np.asarray(x)) for x in pf])

    # warm to steady state
    for i in range(min(10, n_total)):
        out = pipe.process([wire(s0, i), wire(s1, i)])
    jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    for i in range(10, 10 + N):
        out = pipe.process([wire(s0, i % n_total), wire(s1, i % n_total)])
    jax.block_until_ready(out.pose)
    print(f"{'fused dual':12s} {(time.perf_counter()-t0)/N*1e3:7.2f} ms")

    # frontend x2, chained INSIDE jit (an eager add between submissions
    # costs ~40 ms on the tunnel and poisons the loop)
    @jax.jit
    def fe_pair(ia, ib, carry):
        _, ca, _, _ = pipe._frontend_impl(ia._replace(rng=ia.rng + carry))
        dep = 0.0 * ca.xyz[0, 0]  # serialize the two frontends
        _, cb, _, _ = pipe._frontend_impl(ib._replace(rng=ib.rng + dep))
        return dep + 0.0 * cb.xyz[0, 0]
    frames0 = [frame(s0, i % n_total) for i in range(N)]
    frames1 = [frame(s1, i % n_total) for i in range(N)]
    jax.block_until_ready((frames0, frames1))
    carry = jnp.zeros((), jnp.float32)
    carry = fe_pair(frames0[0], frames1[0], carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(N):
        carry = fe_pair(frames0[i], frames1[i], carry)
    jax.block_until_ready(carry)
    print(f"{'frontend x2':12s} {(time.perf_counter()-t0)/N*1e3:7.2f} ms")

    # tracker (ref lidar only), chained through motion
    fe = jax.jit(functools.partial(pipe._frontend_impl, model_idx=0))
    ffs = [fe(frame(s0, i % n_total))[0] for i in range(N + 1)]
    jax.block_until_ready(ffs)
    res, _ = pipe._track(ffs[0], ffs[1], Pose.identity())
    jax.block_until_ready(res.pose)
    t0 = time.perf_counter()
    for i in range(N):
        res, _ = pipe._track(ffs[i], ffs[i + 1], res.pose)
    jax.block_until_ready(res.pose)
    print(f"{'tracker':12s} {(time.perf_counter()-t0)/N*1e3:7.2f} ms")

    # window decomposition (chained through the window state)
    outs0 = [fe(frame(s0, i % n_total)) for i in range(N)]
    outs1 = [fe(frame(s1, i % n_total)) for i in range(N)]
    jax.block_until_ready((outs0, outs1))
    window = pipe.window
    world = pipe.world_pose
    mot = pipe.motions[0]

    def chain_localmap(wd, c0, s0_, c1, s1_):
        stk = lambda a, b: jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)
        w2 = E.push_frame(wd, se3.compose(world, mot),
                          stk(c0, c1), stk(s0_, s1_), cfg)
        maps = E.build_local_map(w2, cfg)
        return w2, maps

    def chain_match(wd, c0, s0_, c1, s1_):
        w2, (cm, cmm, sm, smm) = chain_localmap(wd, c0, s0_, c1, s1_)
        piv = Pose(w2.poses.q[-2], w2.poses.t[-2])
        tot = jnp.zeros(())
        for l in range(2):
            qc = jax.tree.map(lambda x: x[-1, l], w2.corner)
            qs = jax.tree.map(lambda x: x[-1, l], w2.surf)
            pc = se3.transform_points(piv, qc.xyz)
            ps = se3.transform_points(piv, qs.xyz)
            ec = factors.match_map_edge(qc, pc, cm, cmm, 1.0)
            sc = factors.match_map_plane(qs, ps, sm, smm, 1.0)
            tot = tot + ec.w.sum() + sc.w.sum()
        return w2, tot

    def chain_window(wd, c0, s0_, c1, s1_):
        w2, solve, pred, refined = pipe._window_all(
            wd, world, mot, (mot, mot), (c0, c1), (s0_, s1_), mode2=False)
        return w2, refined

    for label, fn in [("localmap", jax.jit(chain_localmap)),
                      ("match", jax.jit(chain_match)),
                      ("window", chain_window)]:
        wd = window
        wd, aux = fn(wd, outs0[0][1], outs0[0][2], outs1[0][1], outs1[0][2])
        jax.block_until_ready(aux)
        t0 = time.perf_counter()
        for i in range(N):
            wd, aux = fn(wd, outs0[i][1], outs0[i][2],
                         outs1[i][1], outs1[i][2])
        jax.block_until_ready(aux)
        print(f"{label:12s} {(time.perf_counter()-t0)/N*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
