"""CPU ATE sweep over window-solver budgets (gentle + aggressive motion).

Decides which GN budget trims are ATE-neutral before they're applied to
the shipped config (the window probe measured ~1 ms per GN iteration on
chip — see BENCH_NOTES)."""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation

N = 30


def run_variant(cfg, speed_scale, seed=0):
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1),
                             speed_scale=speed_scale)
    imgs, gt = W.render_sequence(w, traj, cfg.rig.models[0], N)
    pipe = OdometryPipeline(cfg)
    est = []
    for i in range(N):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        out = pipe.process([img])
        est.append(np.asarray(out.pose.t))
    return evaluation.ate_rmse(np.stack(est), np.asarray(gt.t[:N]))


def main():
    base = platforms.synthetic(n_lidars=1)
    variants = {
        "gn4 (base)": base,
        "gn3": base.replace(odometry=dataclasses.replace(
            base.odometry, gn_iters=3)),
        "gn2": base.replace(odometry=dataclasses.replace(
            base.odometry, gn_iters=2)),
        "gn2 tracker2": base.replace(
            odometry=dataclasses.replace(base.odometry, gn_iters=2),
            tracker=dataclasses.replace(base.tracker, gn_iters=2),
        ),
    }
    for name, cfg in variants.items():
        a_gentle = run_variant(cfg, 1.0)
        a_fast = run_variant(cfg, 2.0, seed=3)
        print(f"{name:14s} gentle {a_gentle*100:6.2f} cm   "
              f"aggressive {a_fast*100:6.2f} cm")


if __name__ == "__main__":
    main()
