"""Window-step internal attribution: time the jitted window program at
gn_iters in {1, 4, 7} (slope = per-GN-iteration cost) and with
marginalization on/off. Chained through the window state (no eager ops in
the loop)."""

from __future__ import annotations

import dataclasses
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

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.odometry import estimator as E

N = 20


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    imgs, _ = render(cfg, N + 10)
    imgs_np = jax.tree.map(np.asarray, imgs)
    pipe = OdometryPipeline(cfg)

    def frame(i):
        return RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])

    for i in range(10):
        out = pipe.process([frame(i)])
    jax.block_until_ready(out.pose)
    outs = [pipe._frontends[0](frame(i)) for i in range(N)]
    jax.block_until_ready(outs)
    world, mot = pipe.world_pose, pipe.motions[0]

    def make_step(c2, marg: bool):
        def step(w, corner, surf):
            import mloam_tpu.core.se3 as se3
            pred = se3.compose(world, mot)
            corner = jax.tree.map(lambda x: x[None], corner)
            surf = jax.tree.map(lambda x: x[None], surf)
            w = E.push_frame(w, pred, corner, surf, c2)
            w, solve = E.optimize_window(w, c2, False, (0,))
            if marg:
                w = E.marginalize_pivot(w, solve, c2, False)
            return w, solve.cost
        return jax.jit(step)

    for label, gn, marg in [
        ("gn=1 marg", 1, True),
        ("gn=4 marg", 4, True),
        ("gn=7 marg", 7, True),
        ("gn=4 nomarg", 4, False),
        ("gn=0* corr-only", 0, False),
    ]:
        c2 = cfg.replace(odometry=dataclasses.replace(
            cfg.odometry, gn_iters=max(gn, 1) if gn else 1))
        if gn == 0:
            # correspondence construction only: hack — run with 1 iter but
            # measure localmap+match via the estimator's first stage; skip
            continue
        fn = make_step(c2, marg)
        w = pipe.window
        w, cost = fn(w, outs[0][1], outs[0][2])
        jax.block_until_ready(cost)
        t0 = time.perf_counter()
        for i in range(N):
            w, cost = fn(w, outs[i][1], outs[i][2])
        jax.block_until_ready(cost)
        dt = (time.perf_counter() - t0) / N
        print(f"{label:16s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
