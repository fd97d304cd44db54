"""End-to-end SLAM smoke on the real chip: SlamPipeline over a synthetic
sequence (odometry + mapping + loop graph), prints poses/keyframes/ATE.
(The verify skill's surface #1.)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import SlamPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.utils import evaluation

N = 24

cfg = platforms.synthetic(1)
cfg = dataclasses.replace(
    cfg,
    mapping=dataclasses.replace(cfg.mapping, keyframe_dist=0.05,
                                keyframe_angle_deg=0.5),
    loop=dataclasses.replace(cfg.loop, skip_interval=2, num_exclude_recent=3),
)
imgs, gt = render(cfg, N)
imgs = jax.tree.map(lambda x: np.asarray(x), imgs)
pipe = SlamPipeline(cfg)
t0 = time.perf_counter()
est = []
for i in range(N):
    img = RangeImage(*[jnp.asarray(x[i]) for x in imgs])
    out = pipe.process([img])
    est.append(out.full.map_pose.t)
jax.block_until_ready(est[-1])
wall = time.perf_counter() - t0
ate = evaluation.ate_rmse(np.asarray(jnp.stack(est)), np.asarray(gt.t[:N]))
print(f"platform={jax.devices()[0].platform} frames={N} wall={wall:.1f}s")
print(f"ATE={ate*100:.2f}cm  keyframes={int(pipe.loop_state.count)} "
      f"loops={pipe.n_loops}")
assert ate < 0.05, "SLAM smoke ATE gate failed"
print("SMOKE OK")
