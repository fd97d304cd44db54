"""On-chip XLA-vs-Pallas kNN comparison at the pipeline's real shapes."""

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

from mloam_tpu.ops import knn as knn_ops
from mloam_tpu.ops import pallas_knn as PK

N = 24


def timed(label, fn, inputs):
    """Chained pipelined timing: call i+1's query depends on call i's
    output, forcing sequential execution — the tunnel appears to fan
    independent submissions out across a worker pool, which makes
    unchained 'throughput' numbers fantasy for expensive programs."""
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    outs = []
    for (q, r, m) in inputs:
        o = fn(q + carry, r, m)
        carry = 0.0 * o[0][0, 0]
        outs.append(o)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f"{label:28s} {dt*1e3:7.2f} ms/call")
    return outs[0]


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def inputs(nq, nr):
        res = []
        for _ in range(N):
            q = jnp.asarray(rng.uniform(-30, 30, (nq, 3)).astype(np.float32))
            r = jnp.asarray(rng.uniform(-30, 30, (nr, 3)).astype(np.float32))
            res.append((q, r, jnp.ones((nr,), bool)))
        return res

    for (nq, nr, k) in [(2048, 65536, 5), (1024, 32768, 5), (2048, 4096, 8)]:
        ins = inputs(nq, nr)
        o1 = timed(f"xla    [{nq}x{nr}] k={k}",
                   lambda q, r, m: knn_ops.knn_jit(q, r, m, k), ins)
        o2 = timed(f"pallas [{nq}x{nr}] k={k}",
                   lambda q, r, m: PK.knn_pallas(q, r, m, k), ins)
        # sanity: nearest index agreement on the shared first input
        i1 = np.asarray(o1[1][:, 0])
        i2 = np.asarray(o2[1][:, 0])
        d1 = np.asarray(o1[0])
        d2 = np.asarray(o2[0])
        agree = float((i1 == i2).mean())
        dmax = float(np.abs(d1[:, 0] - d2[:, 0]).max())
        print(f"    1-nn agreement {agree:.4f}  |d0 xla-pallas|max {dmax:.2e}"
              f"  kth-d relerr p95 "
              f"{np.percentile(np.abs(d1[:,k-1]-d2[:,k-1])/(d1[:,k-1]+1e-9),95):.3f}")


if __name__ == "__main__":
    main()
