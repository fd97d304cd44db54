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


class TestSlamCheckpointFlush:
    def test_save_captures_post_flush_loop_state(self):
        """save_pipeline must flush() BEFORE capturing state: flush rebinds
        pipe.loop_state (draining the one-sweep-delayed keyframe stage), so
        capture-then-flush saved a loop_state whose keyframe count lagged
        the meta counters — a restored pipeline's next scan-context query
        then pointed at an empty slot (round-4 advisor, high)."""
        import dataclasses
        import tempfile

        from mloam_tpu.models.pipeline import SlamPipeline
        from mloam_tpu.sim import world as W

        cfg = platforms.synthetic(n_lidars=1)
        cfg = dataclasses.replace(
            cfg,
            mapping=dataclasses.replace(cfg.mapping, keyframe_dist=0.3,
                                        skip_frames=1),
            loop=dataclasses.replace(cfg.loop, skip_interval=1, capacity=32),
        )
        w = W.make_world(jax.random.PRNGKey(2), extent=25.0)
        traj = W.make_loop_trajectory(radius=5.0, period_s=8.0)
        n = 12
        imgs, _ = W.render_sequence(w, traj, cfg.rig.models[0], n)
        pipe = SlamPipeline(cfg)
        for i in range(n):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            pipe.process([img])
        # ensure the hazard is live: a keyframe must be in flight at save
        assert pipe._pending_kf is not None or pipe._pending_verify is not None
        path = tempfile.mktemp(suffix=".npz")
        CK.save_pipeline(path, pipe)
        pipe2 = SlamPipeline(cfg)
        CK.load_pipeline(path, pipe2)
        stored = int(jax.device_get(pipe2.loop_state.count))
        assert pipe2.loop_kf_count == stored, (
            f"restored loop_kf_count {pipe2.loop_kf_count} != stored "
            f"keyframe count {stored} (stale pre-flush loop_state saved)")
        assert pipe2.kf_counter == pipe.kf_counter
        # restored pipeline keeps processing and can insert keyframes
        img = RangeImage(*[jax.tree.map(lambda x: x[n - 1], f) for f in imgs])
        out = pipe2.process([img])
        assert bool(jnp.isfinite(out.full.map_pose.t).all())
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
