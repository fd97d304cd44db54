"""CPU ATE check for the steady-path optimizations: local-map precompaction,
tracker-skip (constant-velocity prediction), and GN budget trims — gentle and
aggressive synthetic motion, two seeds each."""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

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
    no_pre = base.replace(odometry=dataclasses.replace(
        base.odometry, localmap_precap_corner=None, localmap_precap_surf=None))
    skip = base.replace(tracker=dataclasses.replace(
        base.tracker, skip_steady=True))
    gn3 = base.replace(odometry=dataclasses.replace(base.odometry, gn_iters=3))
    combo = base.replace(
        tracker=dataclasses.replace(base.tracker, skip_steady=True),
        odometry=dataclasses.replace(base.odometry, gn_iters=3),
    )
    variants = {
        "base(nopre)": no_pre,
        "precap": base,
        "skip_steady": skip,
        "gn3": gn3,
        "skip+gn3": combo,
    }
    for name, cfg in variants.items():
        for speed, tag in [(1.0, "gentle"), (2.5, "aggressive")]:
            ates = [run_variant(cfg, speed, seed=s) * 100 for s in (0, 5)]
            print(f"{name:14s} {tag:10s} ate_cm={[round(a, 2) for a in ates]}",
                  flush=True)


if __name__ == "__main__":
    main()
