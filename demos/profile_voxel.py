"""Chained on-chip microbench: the localmap packed-key voxel sort vs a
hash-scatter alternative, at window-localmap shapes (2048 corner + 10240
surf points). Decides whether replacing the sort is worth pursuing.
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

from mloam_tpu.ops import voxel

N_C, N_S = 2048, 10240
N = 50


def main():
    print("platform:", jax.devices()[0].platform)
    key = jax.random.PRNGKey(0)
    kc, ks = jax.random.split(key)
    cx = jax.random.uniform(kc, (N_C, 3), minval=-40, maxval=40)
    sx = jax.random.uniform(ks, (N_S, 3), minval=-40, maxval=40)
    cm = jnp.ones((N_C,), bool)
    sm = jnp.ones((N_S,), bool)

    @jax.jit
    def sorted_ds(cx, sx, carry):
        cx = cx + carry  # chain INSIDE jit (eager ops poison the tunnel)
        c_ds, c_dm, s_ds, s_dm = voxel.voxel_downsample_two_class(
            cx, cm, 0.2, sx, sm, 0.4
        )
        carry = jnp.sum(c_ds[:1, 0]) * 0.0
        return c_ds, s_ds, carry

    @jax.jit
    def scatter_ds(cx, sx, carry):
        """Hash-scatter centroid: one scatter-add pass, collisions merge."""
        cx = cx + carry
        M = 16384

        def one(x, m, leaf):
            ijk = jnp.floor(x / leaf).astype(jnp.int32)
            h = (ijk[:, 0] * 73856093 ^ ijk[:, 1] * 19349663
                 ^ ijk[:, 2] * 83492791) & (M - 1)
            h = jnp.where(m, h, M)  # invalid -> overflow slot
            acc = jnp.zeros((M + 1, 4), jnp.float32)
            vals = jnp.concatenate(
                [x, jnp.ones((x.shape[0], 1), x.dtype)], -1)
            vals = jnp.where(m[:, None], vals, 0.0)
            acc = acc.at[h].add(vals)
            cnt = acc[:M, 3]
            cen = acc[:M, :3] / jnp.maximum(cnt, 1.0)[:, None]
            return cen, cnt > 0

        cc, cvm = one(cx, cm, 0.2)
        sc, svm = one(sx, sm, 0.4)
        carry = jnp.sum(cc[:1, 0]) * 0.0
        return cc, sc, carry

    for name, fn in (("sorted", sorted_ds), ("scatter", scatter_ds)):
        carry = jnp.zeros((), jnp.float32)
        c, s, carry = fn(cx, sx, carry)
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        for _ in range(N):
            c, s, carry = fn(cx, sx, carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:8s} {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
