"""Good-feature-selection trade table: ATE / step-time vs keep ratio.

The reference's goodFeatureMatching exists to SAVE CPU TIME (7 ms budget,
estimator.h:62; 20 ms mapping, lidar_mapper.h:82) at an accuracy cost.
Round 3 gives selection the same payoff on TPU: with gf_compact the
selected correspondences are COMPACTED into ~ratio-sized buffers so the
GN shapes shrink. Two methods trade differently on chip (measured, dual
ladders in BENCH_NOTES): 'gd' (logdet-gain rounds) buys accuracy under
weak geometry but its top_k rounds cost more device time than the rows
they remove; 'stride' (even decimation, the reference's rnd counterpart)
is free and — measured — slightly IMPROVES ATE at 0.6 (fewer aliased
correspondences at equal map density). This table records ATE across ratios/methods for the odometry window
solve and the mapping scan-to-map solve. It deliberately carries NO fps
columns: unchained per-frame submissions fan out across the tunnel's
worker pool and report fantasy rates (BENCH_NOTES methodology findings —
the old table mixed 388 and 27 "fps" for variants whose chained on-chip
delta is ~1 ms). Timing evidence for the tuned operating point lives in
the chained dual ladders (demos/profile_dual_fast.py, BENCH_NOTES) and
bench.py.

Ref: estimator.cpp:1347-1517 (odom), lidar_mapper.h:229-573 (mapping).
"""

from __future__ import annotations

import dataclasses
import json
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
from mloam_tpu.models.pipeline import FullPipeline
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation

N_FRAMES = 40
SEEDS = (0, 3)


def run_one(cfg, seed: int):
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1), wobble=0.05)
    model = cfg.rig.models[0]
    imgs, gt = W.render_sequence(w, traj, model, N_FRAMES, noise_std=0.02,
                                 noise_seed=seed + 1000)
    pipe = FullPipeline(cfg)
    est = []
    for i in range(N_FRAMES):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        est.append(out.map_pose.t)
    jax.block_until_ready(est[-1])
    est = np.stack([np.asarray(t) for t in est])
    ate = evaluation.ate_rmse(est, np.asarray(gt.t[:N_FRAMES]))
    return ate


def main():
    base = platforms.synthetic(n_lidars=1)
    table = {}
    variants = []
    for ratio in (1.0, 0.5, 0.2):
        variants.append((f"odom_gd{ratio}", dataclasses.replace(
            base, odometry=dataclasses.replace(
                base.odometry, gf_ratio=ratio, gf_method="gd",
                gf_compact=ratio < 1.0))))
    for ratio in (0.6, 0.35):
        variants.append((f"odom_stride{ratio}", dataclasses.replace(
            base, odometry=dataclasses.replace(
                base.odometry, gf_ratio=ratio, gf_method="stride",
                gf_compact=True))))
    for ratio in (1.0, 0.5, 0.2):
        variants.append((f"map_gf{ratio}", dataclasses.replace(
            base, mapping=dataclasses.replace(
                base.mapping, gf_ratio=ratio,
                gf_method="full" if ratio >= 1.0 else "gd"))))
    for key, cfg in variants:
        if True:
            ates = [run_one(cfg, s) for s in SEEDS]
            table[key] = {
                "ate_cm_per_seed": [round(a * 100, 2) for a in ates],
                "ate_cm_mean": round(float(np.mean(ates)) * 100, 2),
            }
            print(key, table[key], flush=True)
    os.makedirs("results/gf", exist_ok=True)
    with open("results/gf/summary.json", "w") as f:
        json.dump({"frames": N_FRAMES, "seeds": list(SEEDS),
                   "platform": jax.devices()[0].platform,
                   "fps_note": "no fps columns by design: unchained "
                               "per-frame dispatch rates are not "
                               "trustworthy on the tunnel; see "
                               "BENCH_NOTES dual ladders for chained "
                               "timing of these variants",
                   "table": table}, f, indent=2)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
