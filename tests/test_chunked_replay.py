"""Scan-chunked replay equivalence (models/pipeline.py process_chunk).

``process_chunk`` claims bit-identical state advancement to K streaming
``process`` calls (same programs, same order). Round-2 verified this
manually but shipped no test — future edits to the fused step or the carry
layout could silently break replay equivalence (ADVICE round-2 item 2).
"""

import jax
import numpy as np
import pytest

from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

N = 16
WARM = 8  # window_size frames to reach the steady fused path


@pytest.fixture(scope="module")
def seq():
    cfg = platforms.synthetic(n_lidars=1)
    w = W.make_world(jax.random.PRNGKey(0))
    traj = W.make_trajectory(jax.random.PRNGKey(1), wobble=0.05)
    imgs, _ = W.render_sequence(w, traj, cfg.rig.models[0], N,
                                noise_std=0.02, noise_seed=55)
    frames = [RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
              for i in range(N)]
    return cfg, frames


def test_chunked_replay_matches_streaming(seq):
    cfg, frames = seq

    pipe_s = OdometryPipeline(cfg)
    est_s = []
    for f in frames:
        out = pipe_s.process([f])
        est_s.append(np.asarray(out.pose.t))

    pipe_c = OdometryPipeline(cfg)
    for f in frames[:WARM]:
        out = pipe_c.process([f])
    assert pipe_c.ext_mode == 0 and pipe_c.frame_idx >= \
        cfg.odometry.window_size, "warmup did not reach the steady phase"
    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                           *frames[WARM:])
    q, t, *_ = pipe_c.process_chunk(stacked)

    est_c = np.asarray(t)
    est_s_tail = np.stack(est_s[WARM:])
    # CPU: identical programs in identical order -> identical trajectories
    np.testing.assert_array_equal(est_c, est_s_tail)
    # carry state advanced identically: one more frame through both paths
    # stays identical
    out_s = pipe_s.process([frames[WARM]])
    out_c = pipe_c.process([frames[WARM]])
    np.testing.assert_array_equal(np.asarray(out_s.pose.t),
                                  np.asarray(out_c.pose.t))
    assert pipe_s.frame_idx == pipe_c.frame_idx
