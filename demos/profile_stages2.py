"""Honest (state-chained) on-chip attribution of the fused odometry step.

Every timed loop carries a data dependency from call i to call i+1, so the
tunnel cannot overlap or fan out submissions. Decomposes the window step:

  localmap  = build_local_map alone (projection + packed voxel sort)
  match     = localmap + batched correspondence construction (2 kNN)
  window    = full optimize_window + marginalize (the product program)

window - match  ~= GN iterations + prior/marginalization
match - localmap ~= kNN + fit cost
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

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.odometry import estimator as E
from mloam_tpu.solver import factors

N = 24


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    n_total = N + 10
    imgs, _ = render(cfg, n_total)
    imgs_np = jax.tree.map(np.asarray, imgs)
    pipe = OdometryPipeline(cfg)

    def frame(i):
        return RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])

    # warm the pipeline into steady state (fused path)
    for i in range(min(10, n_total)):
        out = pipe.process([frame(i)])
    jax.block_until_ready(out.pose)

    # ---- full fused step, chained by construction
    t0 = time.perf_counter()
    for i in range(10, 10 + N):
        out = pipe.process([frame(i % n_total)])
    jax.block_until_ready(out.pose)
    t_fused = (time.perf_counter() - t0) / N
    print(f"{'fused step':12s} {t_fused*1e3:7.2f} ms")

    # ---- frontend, chained via a scalar carry folded into the image
    fe = pipe._frontends[0]
    carry = jnp.zeros((), jnp.float32)
    ff0, c0, s0, _o0 = fe(frame(0))
    jax.block_until_ready(c0)
    t0 = time.perf_counter()
    for i in range(N):
        img = frame(i % n_total)
        ff, c, s, _o = fe(img._replace(rng=img.rng + carry))
        carry = 0.0 * c.xyz[0, 0]
    jax.block_until_ready(c)
    t_fe = (time.perf_counter() - t0) / N
    print(f"{'frontend':12s} {t_fe*1e3:7.2f} ms")

    # ---- tracker, chained through the motion estimate (natural)
    ffs = [fe(frame(i % n_total))[0] for i in range(N + 1)]
    jax.block_until_ready(ffs)
    motion = Pose.identity()
    res, _ = pipe._track(ffs[0], ffs[1], motion)
    jax.block_until_ready(res.pose)
    t0 = time.perf_counter()
    for i in range(N):
        res, _ = pipe._track(ffs[i], ffs[i + 1], res.pose)
    jax.block_until_ready(res.pose)
    t_tr = (time.perf_counter() - t0) / N
    print(f"{'tracker':12s} {t_tr*1e3:7.2f} ms")

    # ---- window decomposition (chained through the window state)
    outs = [fe(frame(i % n_total)) for i in range(N)]
    jax.block_until_ready(outs)
    window = pipe.window
    world = pipe.world_pose
    mot = pipe.motions[0]

    lm = jax.jit(functools.partial(E.build_local_map, cfg=cfg))

    def chain_localmap(w, c, s):
        w2 = E.push_frame(w, se3.compose(world, mot),
                          jax.tree.map(lambda x: x[None], c),
                          jax.tree.map(lambda x: x[None], s), cfg)
        maps = E.build_local_map(w2, cfg)
        return w2, maps

    def chain_match(w, c, s):
        w2, (cm, cmm, sm, smm) = chain_localmap(w, c, s)
        piv = Pose(w2.poses.q[-2], w2.poses.t[-2])
        qc = jax.tree.map(lambda x: x[-1, 0], w2.corner)
        qs = jax.tree.map(lambda x: x[-1, 0], w2.surf)
        pc = se3.transform_points(piv, qc.xyz)
        ps = se3.transform_points(piv, qs.xyz)
        ec = factors.match_map_edge(qc, pc, cm, cmm, 1.0)
        sc = factors.match_map_plane(qs, ps, sm, smm, 1.0)
        return w2, (ec.w.sum(), sc.w.sum())

    def chain_window(w, c, s):
        w2, solve, pred, refined = pipe._window_ref(
            w, world, mot, (mot,), (c,), (s,), mode2=False)
        return w2, refined

    for label, fn in [("localmap", jax.jit(chain_localmap)),
                      ("match", jax.jit(chain_match)),
                      ("window", chain_window)]:
        w = window
        w, aux = fn(w, outs[0][1], outs[0][2])
        jax.block_until_ready(aux)
        t0 = time.perf_counter()
        for i in range(N):
            w, aux = fn(w, outs[i][1], outs[i][2])
        jax.block_until_ready(aux)
        dt = (time.perf_counter() - t0) / N
        print(f"{label:12s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
