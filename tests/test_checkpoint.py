"""Checkpoint/resume: exact state round-trip and noisy-sim robustness."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import FullPipeline, OdometryPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.utils import checkpoint as CK


class TestCheckpoint:
    def test_full_pipeline_roundtrip(self):
        cfg = platforms.synthetic(1)
        imgs, gt = render(cfg, 9)
        pipe = FullPipeline(cfg)
        for i in range(9):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            pipe.process([img])
        path = tempfile.mktemp(suffix=".npz")
        CK.save_pipeline(path, pipe)
        pipe2 = FullPipeline(cfg)
        CK.load_pipeline(path, pipe2)
        assert pipe2.odom.frame_idx == pipe.odom.frame_idx
        np.testing.assert_array_equal(
            np.asarray(pipe.odom.window.poses.t),
            np.asarray(pipe2.odom.window.poses.t),
        )
        np.testing.assert_array_equal(
            np.asarray(pipe.mapper_state.db.valid),
            np.asarray(pipe2.mapper_state.db.valid),
        )
        # resumed pipeline keeps processing
        img = RangeImage(*[jax.tree.map(lambda x: x[8], f) for f in imgs])
        out = pipe2.process([img])
        assert bool(jnp.isfinite(out.map_pose.t).all())
        os.remove(path)

    def test_generic_tree_roundtrip(self):
        from mloam_tpu.odometry.initializer import MotionBuffer

        buf = MotionBuffer.empty(8)
        buf = buf._replace(head=jnp.asarray(5, jnp.int32))
        path = tempfile.mktemp(suffix=".npz")
        CK.save_state(path, buf, meta={"note": "x"})
        out, meta = CK.load_state(path, MotionBuffer.empty(8))
        assert int(out.head) == 5
        assert meta["note"] == "x"
        os.remove(path)


class TestNoiseInjection:
    def test_noisy_render_still_tracks(self):
        import dataclasses

        from mloam_tpu.sim import world as W

        cfg = platforms.synthetic(1)
        w = W.make_world(jax.random.PRNGKey(0))
        traj = W.make_trajectory(jax.random.PRNGKey(1))
        model = cfg.rig.models[0]
        imgs, gt = W.render_sequence(w, traj, model, 10, noise_std=0.02)
        pipe = OdometryPipeline(cfg)
        from mloam_tpu.utils import evaluation

        est = []
        for i in range(10):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            out = pipe.process([img])
            est.append(np.asarray(out.pose.t))
        ate = evaluation.ate_rmse(np.stack(est), np.asarray(gt.t[:10]))
        assert ate < 0.10, f"noisy-sim ATE {ate*100:.1f} cm"
