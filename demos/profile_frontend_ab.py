"""Within-run A/B of the frontend: sliding-window reductions vs the old
roll-loop formulation (monkeypatched in), both jitted in the same process so
tunnel drift cancels. Chained via a scalar carry folded into the image."""

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
from mloam_tpu.frontend import features as F
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render

N = 30


def old_curvature(img, valid, half=5):
    xyz = img.xyz
    acc = -2.0 * half * xyz
    win_ok = valid
    for d in range(1, half + 1):
        acc = acc + jnp.roll(xyz, d, 1) + jnp.roll(xyz, -d, 1)
        win_ok = win_ok & jnp.roll(valid, d, 1) & jnp.roll(valid, -d, 1)
    return jnp.sum(acc * acc, -1), win_ok


def old_local_extreme(curv, usable, radius, mode):
    sign = 1.0 if mode == "max" else -1.0
    v = jnp.where(usable, sign * curv, -jnp.inf)
    best = v
    for d in range(1, radius + 1):
        best = jnp.maximum(best, jnp.roll(v, d, 1))
        best = jnp.maximum(best, jnp.roll(v, -d, 1))
    return usable & (v >= best) & jnp.isfinite(v)


def old_reliability(img, valid, half=5, occl_jump=0.3, parallel_frac=0.02):
    d = img.rng
    nxt_v = jnp.roll(valid, -1, 1)
    prv_v = jnp.roll(valid, 1, 1)
    d_nxt = jnp.roll(d, -1, 1)
    d_prv = jnp.roll(d, 1, 1)
    jump_right = valid & nxt_v & (d - d_nxt > occl_jump)
    jump_left = valid & prv_v & (d - d_prv > occl_jump)
    occl = jnp.zeros_like(valid)
    for s in range(0, half + 1):
        occl = occl | jnp.roll(jump_right, -s, 1) | jnp.roll(jump_left, s, 1)
    parallel = valid & (jnp.abs(d_nxt - d) > parallel_frac * d) & (
        jnp.abs(d_prv - d) > parallel_frac * d
    )
    return valid & ~occl & ~parallel


def measure(fe, frames, carry0):
    carry = carry0
    out = fe(frames[0])
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for i in range(N):
        img = frames[i]
        out = fe(img._replace(rng=img.rng + carry))
        carry = 0.0 * out[1].xyz[0, 0]
    jax.block_until_ready(out[1])
    return (time.perf_counter() - t0) / N * 1e3


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    imgs, _ = render(cfg, N)
    imgs_np = jax.tree.map(np.asarray, imgs)
    frames = [RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])
              for i in range(N)]
    pipe = OdometryPipeline(cfg)

    fe_new = jax.jit(functools.partial(pipe._frontend_impl, model_idx=0))
    saved = (F.curvature, F._local_extreme, F.reliability_mask)
    F.curvature, F._local_extreme, F.reliability_mask = (
        old_curvature, old_local_extreme, old_reliability)
    fe_old = jax.jit(lambda img: pipe._frontend_impl(img, 0))
    # note: _frontend_impl reads module attrs at trace time; trace old now
    o = fe_old(frames[0])
    jax.block_until_ready(o[1])
    F.curvature, F._local_extreme, F.reliability_mask = saved
    n = fe_new(frames[0])
    jax.block_until_ready(n[1])

    carry0 = jnp.zeros((), jnp.float32)
    for r in range(3):
        t_new = measure(fe_new, frames, carry0)
        t_old = measure(fe_old, frames, carry0)
        print(f"round {r}: new={t_new:6.2f} ms  old={t_old:6.2f} ms")


if __name__ == "__main__":
    main()
