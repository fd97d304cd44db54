"""Single-chip odometry benchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: steady-state odometry frames/s on the synthetic SR-like sequence
(full pipeline: segmentation + feature extraction + scan-to-scan tracking +
sliding-window GN + marginalization, per sweep).

Baseline: the reference M-LOAM runs the same per-sweep work on CPU in real
time at the SR replay rate — 10 Hz LiDAR x2 replay speed = 20 frames/s
sustained (BASELINE.md: scan_period 0.1, rosbag play -r 2). vs_baseline is
our frames/s divided by that 20 fps envelope; the round target is >= 5.

Variance hardening (the shared axon tunnel drifts ~2x run-to-run): FIVE
throughput passes over DISJOINT sequences (guards against server-side
re-execution caching), each long enough (60 frames) to amortize load
spikes; the reported value is the median and every per-pass number is
persisted to results/bench_passes.json for audit.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 20.0
N_FRAMES = 60
WARMUP = 8
PASS_SEEDS = (7, 11, 13, 17, 19)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from mloam_tpu.core import rangeimage as RI
    from mloam_tpu.core.rangeimage import RangeImage
    from mloam_tpu.models import platforms
    from mloam_tpu.models.pipeline import OdometryPipeline
    from mloam_tpu.models.run_synthetic import render
    from mloam_tpu.utils import evaluation

    cfg = platforms.synthetic(n_lidars=1)

    def to_wire(imgs, n):
        """Host-side frames in the deployment wire format (PackedFrame:
        u16 2mm ranges + u8 intensity, 86 KB/sweep vs 0.72 MB of f32
        RangeImage fields — the tunnel h2d path is bandwidth-bound, and a
        real sensor stream arrives quantized like this anyway)."""
        arr = jax.tree.map(lambda x: np.asarray(x), imgs)
        return [
            RI.pack_frame(RangeImage(*[x[i] for x in arr]))
            for i in range(n)
        ]

    imgs, gt_poses = render(cfg, N_FRAMES)
    imgs = to_wire(imgs, N_FRAMES)
    # disjoint sequences for the throughput passes: guards against any
    # server-side re-execution caching of identical submissions; five passes
    # with a median reduce the large run-to-run drift of the shared tunnel
    # (observed 2x swings between back-to-back runs of identical code).
    tp_seqs = []
    for seed in PASS_SEEDS:
        im, gt2 = render(cfg, N_FRAMES, seed=seed)
        tp_seqs.append((to_wire(im, N_FRAMES), gt2))
    pipe = OdometryPipeline(cfg)

    # warm the tunnel's device->host path outside the timed loop (the axon
    # relay pays a large one-time cost on the first d2h transfer)
    np.asarray(jax.device_put(np.zeros(3, np.float32)))

    # pass 1 — latency: block per frame (also warms every compiled path)
    times = []
    for i in range(N_FRAMES):
        t0 = time.perf_counter()
        img = RI.PackedFrame(*[jnp.asarray(x) for x in imgs[i]])
        out = pipe.process([img])
        jax.block_until_ready(out.pose)
        times.append(time.perf_counter() - t0)
    steady = np.asarray(times[WARMUP:])

    # untimed throughput warm-up pass: the first pipelined pass after the
    # blocking latency pass runs against a cold submission pipeline and
    # reads consistently ~15-20% low — discard it
    pipe.reset()
    for i in range(N_FRAMES):
        img = RI.PackedFrame(*[jnp.asarray(x) for x in imgs[i]])
        out = pipe.process([img])
    jax.block_until_ready(out.pose)

    # pass 2..6 — throughput: pipelined submission (frames chain on device;
    # the host never blocks mid-sequence — the deployment pattern for a
    # 10 Hz sensor stream). Same pipeline instance: compiled programs reused.
    fps_passes = []
    ates = []
    for imgs2, gt_poses2 in tp_seqs:
        pipe.reset()
        est_t = []
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            img = RI.PackedFrame(*[jnp.asarray(x) for x in imgs2[i]])
            out = pipe.process([img])
            est_t.append(out.pose.t)
        jax.block_until_ready(out.pose)
        wall = time.perf_counter() - t0
        fps_passes.append(N_FRAMES / wall)
        ates.append(evaluation.ate_rmse(
            np.asarray(jnp.stack(est_t)), np.asarray(gt_poses2.t[:N_FRAMES])
        ))
    fps = float(np.median(fps_passes))
    ate = float(np.max(ates))
    spread = (max(fps_passes) - min(fps_passes)) / fps

    detail = {
        "frames_per_pass": N_FRAMES,
        "pass_seeds": list(PASS_SEEDS),
        "fps_passes": [round(float(f), 2) for f in fps_passes],
        "fps_median": round(fps, 2),
        "fps_spread_frac": round(float(spread), 3),
        "ate_m_per_pass": [round(float(a), 5) for a in ates],
        "latency_p50_ms": round(float(np.median(steady)) * 1e3, 2),
        "latency_p95_ms": round(float(np.percentile(steady, 95)) * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }
    try:
        os.makedirs("results", exist_ok=True)
        with open("results/bench_passes.json", "w") as f:
            json.dump(detail, f, indent=2)
    except OSError:
        pass
    print(f"# {json.dumps(detail)}", file=sys.stderr)
    print(json.dumps({
        "metric": "odom_frames_per_s",
        "value": round(float(fps), 3),
        "unit": "frames/s",
        "vs_baseline": round(float(fps / BASELINE_FPS), 3),
    }))


if __name__ == "__main__":
    main()
