"""On-chip throughput + ATE for EVERY platform preset's sensor shapes.

The round-3 verdict: all chip numbers were measured on 16x1800 VLP-16-like
shapes; KITTI is 64x1800 (config_realvehicle_kitti.yaml:16-17) and Oxford
32x2160 (config_realvehicle_oxford.yaml) — the heaviest sensor configs
were never timed. This demo runs the realtime-tuned steady path per
platform on a synthetic course rendered with that platform's LidarModels:

  sr_dual    2x VLP-16 16x1800   (config_simu_jackal.yaml)
  rhd_dual   2x VLP-16 16x1800   (config_handheld.yaml)
  hercules   4x VLP-16 16x1800   (config_realvehicle_hercules.yaml)
  oxford     2x HDL-32 32x2160   (config_realvehicle_oxford.yaml)
  kitti      1x HDL-64 64x1800   (config_realvehicle_kitti.yaml)

Methodology matches bench.py: PackedFrame wire format, warm pass, then a
pipelined streaming pass chained through the window state, blocked once.
Baseline: each platform's own reference replay rate from the launch
files — SR at 2x real time (mloam_simu_jackal.launch:97, 20 fps), RHD at
0.7x (mloam_handheld.launch:103, 7 fps), the real-vehicle platforms at
1x (10 fps). >= 5x per platform is the BASELINE target.

Writes results/platform_perf/summary.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))

from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.odometry import estimator as EST
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation

WARM = 8
TIMED = int(os.environ.get("PLAT_FRAMES", "40"))
SEED = 11

# base <- lidar mounts for multi-lidar rigs (distinct, non-trivial)
MOUNTS = [
    jnp.zeros(6),
    jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]),
    jnp.array([-0.2, 0.15, 0.05, -0.04, 0.02, -0.5]),
    jnp.array([0.1, 0.3, 0.08, 0.02, 0.05, 3.1]),
]


def build(cfg):
    L = cfg.rig.n_lidars
    exts = [se3.exp(MOUNTS[l]) for l in range(L)]
    ext = Pose(jnp.stack([e.q for e in exts]),
               jnp.stack([e.t for e in exts]))
    w = W.make_world(jax.random.PRNGKey(SEED))
    traj = W.make_trajectory(jax.random.PRNGKey(SEED + 1))
    n = WARM + TIMED
    seqs, gt = [], None
    for l in range(L):
        s, g = W.render_sequence(w, traj, cfg.rig.models[l], n,
                                 extrinsic=exts[l])
        seqs.append(s)
        if l == 0:
            gt = g
    return seqs, gt, ext


def to_wire(imgs, n):
    arr = jax.tree.map(lambda x: np.asarray(x), imgs)
    return [RI.pack_frame(RangeImage(*[x[i] for x in arr]))
            for i in range(n)]


def run_platform(name, cfg):
    n = WARM + TIMED
    t_r = time.perf_counter()
    seqs, gt, ext = build(cfg)
    wires = [to_wire(s, n) for s in seqs]
    print(f"[{name}] rendered in {time.perf_counter()-t_r:.1f}s "
          f"({cfg.rig.n_lidars} lidars, "
          f"{cfg.rig.models[0].n_rings}x{cfg.rig.models[0].n_cols})")

    def dev_frame(packed):
        return RI.PackedFrame(*[jnp.asarray(x) for x in packed])

    pipe = OdometryPipeline(cfg)
    if cfg.rig.n_lidars > 1:
        pipe.window = EST.set_extrinsics(pipe.window, ext)
    t_c = time.perf_counter()
    out = None
    for i in range(WARM):
        out = pipe.process([dev_frame(wq[i]) for wq in wires])
    jax.block_until_ready(out.pose)
    compile_s = time.perf_counter() - t_c
    est_t = []
    t0 = time.perf_counter()
    for i in range(WARM, n):
        out = pipe.process([dev_frame(wq[i]) for wq in wires])
        est_t.append(out.pose.t)
    jax.block_until_ready(out.pose)
    wall = time.perf_counter() - t0
    fps = TIMED / wall
    est = np.asarray(jnp.stack(est_t))
    ate = evaluation.ate_rmse(est, np.asarray(gt.t[WARM:n]))
    print(f"[{name}] {fps:.1f} fps, ate {ate*100:.2f} cm "
          f"(warm+compile {compile_s:.1f}s)")
    return {
        "fps": round(float(fps), 2),
        "ate_m": round(float(ate), 5),
        "n_lidars": cfg.rig.n_lidars,
        "rings_cols": [cfg.rig.models[0].n_rings, cfg.rig.models[0].n_cols],
        "rt_factor_10hz": round(float(fps / 10.0), 2),
    }


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")
    ref_fps = {"sr_dual": 20.0, "rhd_dual": 7.0, "hercules4": 10.0,
               "oxford": 10.0, "kitti": 10.0}
    cases = {
        "sr_dual": platforms.realtime_tuned(
            platforms.simu_jackal(n_lidars=2, extrinsic_mode=0)),
        "rhd_dual": platforms.realtime_tuned(platforms.handheld(
            extrinsic_mode=0)),
        "hercules4": platforms.realtime_tuned(
            platforms.vehicle_hercules(extrinsic_mode=0)),
        "oxford": platforms.realtime_tuned(platforms.oxford()),
        "kitti": platforms.realtime_tuned(platforms.kitti()),
    }
    out = {"platform": dev.platform, "frames_timed": TIMED,
           "method": "streaming steady path, PackedFrame wire, "
                     "pipelined, blocked once", "cases": {}}
    only = os.environ.get("PLAT_ONLY")
    for name, cfg in cases.items():
        if only and name not in only.split(","):
            continue
        row = run_platform(name, cfg)
        row["ref_replay_fps"] = ref_fps[name]
        row["vs_reference"] = round(row["fps"] / ref_fps[name], 2)
        out["cases"][name] = row
    d = os.path.join("results", "platform_perf")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "summary.json")
    if only and os.path.exists(path):
        prev = json.load(open(path))
        prev["cases"].update(out["cases"])
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
