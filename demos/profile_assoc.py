"""Micro-benchmark the DD-BA association kernel variants on the chip:
materialized [K, M] argmin vs streaming M-tile scan, across row-batching
strategies. Isolates the shard cost dominator (round-5 verdict #6)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.utils import compile_cache

compile_cache.setup(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_tpu_cache"))

from mloam_tpu.core import rotations as rot
from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel import dd_pgo as DD

ROWS, K, M = 121, 1024, 4096
REPS = int(os.environ.get("REPS", "10"))


def make_inputs():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (ROWS, 1))
    t = jax.random.normal(ks[0], (ROWS, 3))
    pts = 2.0 * jax.random.normal(ks[1], (ROWS, K, 3))
    anchors = 30.0 * jax.random.normal(ks[2], (ROWS, M, 3))
    nrm = jax.random.normal(ks[3], (ROWS, M, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    w = jnp.ones((ROWS, K))
    valid = jnp.ones((ROWS, M))
    return q, t, pts, anchors, nrm, w, valid


def assoc_materialized(pose: Pose, ms_pts, ms_anchor, ms_n, ms_w, ms_valid,
                       max_dist=1.0):
    """The round-4 form: full [K, M] sqdist + argmin."""
    R = rot.quat_to_matrix(pose.q)
    pw = jnp.einsum("ij,kj->ki", R, ms_pts) + pose.t
    d2 = (jnp.sum(pw * pw, -1)[:, None]
          + jnp.sum(ms_anchor * ms_anchor, -1)[None, :]
          - 2.0 * pw @ ms_anchor.T)
    d2 = jnp.where(ms_valid[None, :] > 0, d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
    n = ms_n[j]
    a = ms_anchor[j]
    d = -jnp.einsum("ki,ki->k", n, a)
    w = jnp.where(jnp.isfinite(best) & (best < max_dist * max_dist),
                  ms_w, 0.0)
    return DD.point_block(pose, ms_pts, n, d, w)


def bench(label, fn, chunk):
    q, t, pts, anchors, nrm, w, valid = make_inputs()

    def one(qq, tt, p, a, nn, ww, vv):
        return fn(Pose(qq, tt), p, a, nn, ww, vv)

    def mapped(*xs):
        if chunk is None:
            return jax.vmap(one)(*xs)
        return jax.lax.map(lambda z: one(*z), xs, batch_size=chunk)

    @jax.jit
    def chain(tt):
        def step(c, _):
            H, g, cost = jax.tree.map(
                lambda x: jnp.sum(x, 0), mapped(q, c, pts, anchors, nrm, w,
                                                valid))
            return c + 1e-9 * jnp.tanh(g[None, :3]), cost

        return jax.lax.scan(step, tt, None, length=REPS)

    out = chain(t)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = chain(t + 1e-6)
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:36s} {dt*1e3:8.2f} ms/iter "
          f"({ROWS}x{K}x{M})", flush=True)
    return dt


def main():
    print(f"platform={jax.devices()[0].platform}")
    for chunk in (8, 32, None):
        bench(f"materialized chunk={chunk}", assoc_materialized, chunk)
    for m_tile in (512, 1024, 2048):
        for chunk in (8, 32, None):
            bench(
                f"streaming m_tile={m_tile} chunk={chunk}",
                lambda p, pts, a, n, w, v, mt=m_tile: DD.associate_block(
                    p, pts, a, n, w, v, 1.0, m_tile=mt),
                chunk)


if __name__ == "__main__":
    main()
