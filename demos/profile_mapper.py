"""On-chip mapper_step attribution (chained through MapperState): full step
vs surround-map assembly alone, at the default 50-keyframe surround."""

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

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.mapping import mapper as MP
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import FullPipeline
from mloam_tpu.models.run_synthetic import render

N = 20


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    imgs, _ = render(cfg, N + 12)
    imgs_np = jax.tree.map(np.asarray, imgs)
    pipe = FullPipeline(cfg)

    def frame(i):
        return RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])

    for i in range(12):
        out = pipe.process([frame(i)])
    jax.block_until_ready(out.map_pose)

    # captured inputs for isolated mapper calls
    corner_b, surf_b = pipe._merge(
        pipe.odom.window.ext, pipe.odom.window.corner, pipe.odom.window.surf
    )
    outlier_b = pipe._merge_outlier(
        pipe.odom.window.ext, tuple(pipe.odom.last_outlier)
    )
    jax.block_until_ready(surf_b.xyz)
    pose = pipe.odom.world_pose

    step = pipe._mapper_step

    # eps breaks submission identity (the tunnel memoizes bit-identical
    # submissions) without moving far enough to trigger cache rebuilds
    def chain_step(st, p, eps):
        p = Pose(p.q, p.t + eps)
        st2, out = step(st, p, corner_b, surf_b, outlier=outlier_b)
        return st2, out.pose

    chain_step = jax.jit(chain_step)
    st = pipe.mapper_state
    st, p = chain_step(st, pose, jnp.float32(0.0))
    jax.block_until_ready(p.t)
    t0 = time.perf_counter()
    for i in range(N):
        st, p = chain_step(st, p, jnp.float32(1e-4 * (i + 1)))
    jax.block_until_ready(p.t)
    print(f"mapper_step     {(time.perf_counter()-t0)/N*1e3:7.2f} ms")

    @jax.jit
    def chain_asm(st, center, eps):
        c_xyz, c_cov, c_m, s_xyz, s_cov, s_m = MP._assemble_map(
            st, center + eps, cfg=cfg
        )
        return s_xyz[0] + center * 0.0

    st = pipe.mapper_state
    c = chain_asm(st, pose.t, jnp.float32(0.0))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for i in range(N):
        c = chain_asm(st, c, jnp.float32(1e-4 * (i + 1)))
    jax.block_until_ready(c)
    print(f"assemble_map    {(time.perf_counter()-t0)/N*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
