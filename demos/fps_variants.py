"""On-chip fps probe of steady-path variants (pipelined, state-chained).

Interleaved design: every round measures all variants back-to-back, so the
tunnel's slow load drift cancels in the per-round comparison; report the
per-variant median across rounds. Disjoint input sequences per round (the
tunnel memoizes identical submissions)."""

from __future__ import annotations

import dataclasses
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

N = 40
ROUNDS = 5
WARM = 12


def one_pass(pipe, imgs):
    pipe.reset()
    t0 = None
    for i in range(N):
        img = RangeImage(*[jnp.asarray(x[i]) for x in imgs])
        out = pipe.process([img])
        if i == WARM:
            jax.block_until_ready(out.pose)
            t0 = time.perf_counter()
    jax.block_until_ready(out.pose)
    return (N - WARM - 1) / (time.perf_counter() - t0)


def main():
    print("platform:", jax.devices()[0].platform)
    base = platforms.synthetic(n_lidars=1)
    variants = {
        "precap(default)": base,
        "skip": base.replace(tracker=dataclasses.replace(
            base.tracker, skip_steady=True)),
        "gn3": base.replace(odometry=dataclasses.replace(
            base.odometry, gn_iters=3)),
        "skip+gn3": base.replace(
            tracker=dataclasses.replace(base.tracker, skip_steady=True),
            odometry=dataclasses.replace(base.odometry, gn_iters=3)),
        "nopre": base.replace(odometry=dataclasses.replace(
            base.odometry, localmap_precap_corner=None,
            localmap_precap_surf=None)),
    }
    pipes = {k: OdometryPipeline(c) for k, c in variants.items()}
    seqs = []
    for seed in (3, 17, 23, 29, 31):
        im, _ = render(base, N, seed=seed)
        seqs.append(jax.tree.map(np.asarray, im))
    # compile warmup: one full pass each (not timed)
    for k, p in pipes.items():
        one_pass(p, seqs[0])
        print(f"compiled {k}", flush=True)
    results = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k, p in pipes.items():
            results[k].append(one_pass(p, seqs[r]))
        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]:.1f}" for k in variants), flush=True)
    print("--- medians ---")
    for k in variants:
        print(f"{k:18s} {float(np.median(results[k])):7.1f} fps", flush=True)


if __name__ == "__main__":
    main()
