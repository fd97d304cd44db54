"""On-chip stage attribution for the fused odometry step.

The axon tunnel makes per-stage `block_until_ready` timings unreliable
(~30-60 ms polling handshake per sync, BENCH_NOTES.md), so this probe
measures each jitted stage the same way bench.py measures the whole
pipeline: a pipelined loop over DISJOINT inputs (the tunnel memoizes
identical submissions), blocked once at the end. The per-iteration wall
time is then an honest estimate of device time per call.

Stages probed (the fused step is their exact composition):
  frontend  = segmentation + feature extraction + downsample
  tracker   = scan-to-scan GN (incl. scan kNN at 2k x 4k)
  window    = push + local-map assembly + map kNN + windowed GN + marg
  knn_map   = isolated kNN at map scale (2048 queries x 65536 refs, k=5)
  knn_scan  = isolated kNN at scan scale (2048 x 4096, k=8)
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

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.ops import knn as knn_ops

N = 24


def timed(label, fn, inputs):
    """Pipelined loop over disjoint inputs; one block at the end."""
    out = fn(*inputs[0])  # warm/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for args in inputs:
        outs.append(fn(*args))
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f"{label:10s} {dt*1e3:7.2f} ms/call")
    return dt


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = platforms.synthetic(n_lidars=1)
    imgs, _ = render(cfg, N + 10)
    imgs_np = jax.tree.map(np.asarray, imgs)
    pipe = OdometryPipeline(cfg)

    def frame(i):
        return RangeImage(*[jnp.asarray(x[i]) for x in imgs_np])

    # run the non-fused path a few frames to populate window + prev feats
    states = []
    for i in range(8):
        img = frame(i)
        ff, c, s, _o = pipe._frontends[0](img)
        if pipe.prev_feats[0] is None:
            pipe.prev_feats = [ff]
            pipe.window = pipe._push_first(pipe.window, pipe.world_pose,
                                           (c,), (s,))
            continue
        res0, desk0 = pipe._track(pipe.prev_feats[0], ff, pipe.motions[0])
        pipe.motions[0] = res0.pose
        pipe.prev_feats = [desk0]
        args = (pipe.window, pipe.world_pose, res0.pose,
                (pipe.motions[0],), (c,), (s,))
        if i >= cfg.odometry.window_size:
            pipe.window, solve, pred, refined = pipe._window_ref(
                *args, mode2=False)
            pipe.world_pose = refined
            states.append((args, ff))
        else:
            pipe.window, pred = pipe._push_only(*args, mode2=False)
            pipe.world_pose = pred
    jax.block_until_ready(pipe.window)

    # --- frontend over disjoint images
    t_fe = timed("frontend", pipe._frontends[0],
                 [(frame(i),) for i in range(8, 8 + N)])

    # --- tracker over disjoint (prev, curr) pairs: reuse prev_feat, vary curr
    ffs = [pipe._frontends[0](frame(i))[0] for i in range(8, 8 + N)]
    jax.block_until_ready(ffs)
    t_tr = timed("tracker", pipe._track,
                 [(ffs[i], ffs[(i + 1) % N], pipe.motions[0])
                  for i in range(N)])

    # --- window step over disjoint frames (fresh corner/surf per call;
    # window state is reused — contents differ per call via the push)
    outs = [pipe._frontends[0](frame(i)) for i in range(8, 8 + N)]
    jax.block_until_ready(outs)
    base_args = states[-1][0]
    win_inputs = []
    for i in range(N):
        _, c, s, _o = outs[i]
        win_inputs.append((base_args[0], base_args[1], base_args[2],
                           base_args[3], (c,), (s,)))
    t_w = timed("window", lambda *a: pipe._window_ref(*a, mode2=False),
                win_inputs)

    # --- isolated kNN at map and scan scales (disjoint random clouds)
    rng = np.random.default_rng(0)

    def knn_inputs(nq, nr, n):
        res = []
        for _ in range(n):
            q = jnp.asarray(rng.uniform(-30, 30, (nq, 3)).astype(np.float32))
            r = jnp.asarray(rng.uniform(-30, 30, (nr, 3)).astype(np.float32))
            res.append((q, r, jnp.ones((nr,), bool)))
        return res

    t_km = timed("knn_map", lambda q, r, m: knn_ops.knn_jit(q, r, m, 5),
                 knn_inputs(2048, 65536, N))
    t_kc = timed("knn_map_c", lambda q, r, m: knn_ops.knn_jit(q, r, m, 5),
                 knn_inputs(1024, 32768, N))
    t_ks = timed("knn_scan", lambda q, r, m: knn_ops.knn_jit(q, r, m, 8),
                 knn_inputs(2048, 4096, N))

    print(f"\nsum(stages) = {(t_fe + t_tr + t_w)*1e3:.2f} ms "
          f"(fused step measured ~17 ms at 59 fps)")
    print(f"map-scale kNN x2 (corner+surf) ~ {(t_km + t_kc)*1e3:.2f} ms")
    print(f"scan kNN x2 ~ {2*t_ks*1e3:.2f} ms")


if __name__ == "__main__":
    main()
