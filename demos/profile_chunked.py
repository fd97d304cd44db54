"""Does per-submission overhead dominate the fused per-frame step?

Compares the per-frame fused program (one dispatch per sweep, chained)
against a lax.scan over K sweeps inside ONE program (identical per-frame
math, 1/K-th the dispatches). If the scan wins big, the tunnel's dispatch
gap — not device time — is the throughput ceiling."""

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

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render

K = 8
N_CHUNKS = 5


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    n_total = K * N_CHUNKS + 10
    imgs, _ = render(cfg, n_total)
    imgs_np = jax.tree.map(np.asarray, imgs)
    pipe = OdometryPipeline(cfg)

    def frame(i):
        return RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])

    # warm the per-frame fused path
    for i in range(10):
        out = pipe.process([frame(i)])
    jax.block_until_ready(out.pose)

    # ---- per-frame dispatch (chained, steady)
    t0 = time.perf_counter()
    for i in range(10, 10 + K * N_CHUNKS):
        out = pipe.process([frame(i)])
    jax.block_until_ready(out.pose)
    per_frame = (time.perf_counter() - t0) / (K * N_CHUNKS)
    print(f"per-frame dispatch: {per_frame*1e3:7.2f} ms/frame "
          f"({1/per_frame:.1f} fps)")

    # ---- scan over K frames in one dispatch
    def scan_step(carry, img):
        window, world, motion, prev = carry
        (window, refined, mot, desk, pred, solve,
         outlier, _) = pipe._fused_step_impl(window, world, motion, prev, img)
        return (window, refined, mot, desk), (refined.t, solve.cost)

    @jax.jit
    def chunk(carry, imgs_k):
        return jax.lax.scan(scan_step, carry, imgs_k)

    carry = (pipe.window, pipe.world_pose, pipe.motions[0],
             pipe.prev_feats[0])
    stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[frame(10 + i) for i in range(K)]
    )
    carry, _ = chunk(carry, stack)   # compile
    jax.block_until_ready(carry[1].t)
    t0 = time.perf_counter()
    for c in range(N_CHUNKS):
        stack = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[frame(10 + c * K + i) for i in range(K)],
        )
        carry, outs = chunk(carry, stack)
    jax.block_until_ready(carry[1].t)
    per_frame2 = (time.perf_counter() - t0) / (K * N_CHUNKS)
    print(f"scan-of-{K} dispatch: {per_frame2*1e3:7.2f} ms/frame "
          f"({1/per_frame2:.1f} fps)")


if __name__ == "__main__":
    main()
