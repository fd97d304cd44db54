"""Loop closure: scan-context retrieval, registration, pose-graph correction
on a drifting circular trajectory through the simulated world."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.config import LoopConfig
from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.core.rangeimage import LidarModel
from mloam_tpu.frontend import features as F
from mloam_tpu.frontend import segmentation as S
from mloam_tpu.loop import posegraph as PGraph
from mloam_tpu.loop import scancontext as SC
from mloam_tpu.models import platforms
from mloam_tpu.sim import world as W

MODEL = LidarModel(n_rings=16, n_cols=900)
CFG = platforms.synthetic(1)
LCFG = LoopConfig(num_exclude_recent=4, loop_distance_threshold=10.0)
N_KF = 14


def circle_pose(k, n=N_KF, radius=6.0):
    ang = 2 * np.pi * k / n
    yaw = ang + np.pi / 2
    q = rot.so3_exp_quat(jnp.array([0.0, 0.0, float(yaw)]))
    t = jnp.array([radius * np.cos(ang), radius * np.sin(ang), 0.6])
    return Pose(q, t)


@pytest.fixture(scope="module")
def loop_run():
    w = W.make_world(jax.random.PRNGKey(3), extent=30.0, n_walls=20, n_poles=10)
    frontend = jax.jit(
        lambda img: F.extract(
            img, S.segment(img, MODEL, CFG.segmenter).segmented, CFG.features
        )
    )
    state = PGraph.init_state(
        32, CFG.odometry.cap_frame_corner, CFG.odometry.cap_frame_surf, LCFG
    )
    gt_poses = []
    # drift: grows linearly along the run, ~60 cm by the loop's end
    for k in range(N_KF + 1):  # last keyframe revisits the start
        gt = circle_pose(k)
        gt_poses.append(gt)
        img = W.render_scan(w, gt, gt, MODEL)
        ff = frontend(img)
        corner = F.downsample_featcloud(
            ff.less_sharp, CFG.odometry.corner_map_leaf,
            CFG.odometry.cap_frame_corner)
        surf = F.downsample_featcloud(
            ff.less_flat, CFG.odometry.surf_map_leaf,
            CFG.odometry.cap_frame_surf)
        drift = se3.exp(jnp.array([0.04, 0.02, 0.0, 0, 0, 0.008]) * k)
        noisy = se3.compose(gt, drift)
        state = PGraph.add_keyframe(state, noisy, corner, surf, LCFG)
    return state, gt_poses


class TestLoopClosure:
    def test_detects_revisit(self, loop_run):
        state, gt_poses = loop_run
        q_idx = jnp.asarray(N_KF)  # the revisit keyframe
        found, cand, zq, zt, dist, reg = PGraph.try_close_loop(
            state, q_idx, LCFG, CFG
        )
        assert bool(found), f"no loop found (sc dist {float(dist):.3f}, " \
                            f"reg inliers {float(reg.inlier_frac):.2f})"
        assert int(cand) in (0, 1, N_KF - 1 and 0)

    def test_pgo_reduces_drift(self, loop_run):
        state, gt_poses = loop_run
        q_idx = jnp.asarray(N_KF)
        found, cand, zq, zt, dist, reg = PGraph.try_close_loop(
            state, q_idx, LCFG, CFG
        )
        assert bool(found)
        state = PGraph.record_loop(state, found, cand, q_idx, zq, zt)
        before = np.asarray(state.poses.t[: N_KF + 1])
        gt_t = np.stack([np.asarray(p.t) for p in gt_poses])
        err_before = np.linalg.norm(before - gt_t, axis=1)
        state = PGraph.optimize(state, iters=15)
        after = np.asarray(state.poses.t[: N_KF + 1])
        err_after = np.linalg.norm(after - gt_t, axis=1)
        # final keyframe had ~60 cm drift; the loop should cut it sharply
        assert err_after[-1] < 0.5 * err_before[-1], (
            f"PGO did not reduce end drift: {err_before[-1]:.3f} -> "
            f"{err_after[-1]:.3f}"
        )
        assert err_after.mean() < err_before.mean()


class TestScanContext:
    def test_rotated_scene_recovered(self):
        cfg = LoopConfig()
        key = jax.random.PRNGKey(0)

        def scene(k):
            p = jax.random.uniform(k, (2000, 3), minval=-40, maxval=40)
            return p.at[:, 2].set(
                jax.random.uniform(jax.random.fold_in(k, 1), (2000,),
                                   minval=0.0, maxval=5.0)
            )

        pts = scene(key)
        mask = jnp.ones(2000, bool)
        db = SC.empty_db(16, cfg)
        db = SC.add(db, SC.make_descriptor(pts, mask, cfg))
        for i in range(4):
            db = SC.add(
                db, SC.make_descriptor(scene(jax.random.fold_in(key, i + 10)),
                                       mask, cfg)
            )
        phi = 0.7
        Rz = rot.quat_to_matrix(rot.so3_exp_quat(jnp.array([0.0, 0.0, phi])))
        d1 = SC.make_descriptor(pts @ Rz, mask, cfg)
        c = SC.detect(db, d1, cfg, exclude_after=jnp.asarray(100))
        assert bool(c.found) and int(c.index) == 0
        assert abs(float(-c.yaw) - phi) < 0.12

    def test_unrelated_scene_rejected(self):
        cfg = LoopConfig()
        key = jax.random.PRNGKey(0)
        mask = jnp.ones(2000, bool)
        db = SC.empty_db(16, cfg)
        for i in range(5):
            d = jax.random.uniform(jax.random.fold_in(key, i),
                                   (2000, 3), minval=-40, maxval=40)
            db = SC.add(db, SC.make_descriptor(d, mask, cfg))
        q = SC.make_descriptor(
            jax.random.uniform(jax.random.PRNGKey(99), (2000, 3),
                               minval=-40, maxval=40), mask, cfg)
        c = SC.detect(db, q, cfg, exclude_after=jnp.asarray(100))
        assert not bool(c.found)

    def test_recent_excluded(self):
        cfg = LoopConfig()
        pts = jax.random.uniform(jax.random.PRNGKey(0), (1000, 3),
                                 minval=-30, maxval=30)
        mask = jnp.ones(1000, bool)
        d = SC.make_descriptor(pts, mask, cfg)
        db = SC.empty_db(8, cfg)
        db = SC.add(db, d)
        # exclude everything -> nothing found even though identical
        c = SC.detect(db, d, cfg, exclude_after=jnp.asarray(0))
        assert not bool(c.found)


class TestGlobalRegFallback:
    def test_large_drift_loop_recovered_via_global_reg(self):
        """Drift far beyond the pose-seeded registration basin: the
        correlation-registration fallback must still verify the loop."""
        w = W.make_world(jax.random.PRNGKey(3), extent=30.0,
                         n_walls=20, n_poles=10)
        frontend = jax.jit(
            lambda img: F.extract(
                img, S.segment(img, MODEL, CFG.segmenter).segmented,
                CFG.features)
        )
        state = PGraph.init_state(
            32, CFG.odometry.cap_frame_corner, CFG.odometry.cap_frame_surf,
            LCFG)
        for k in range(N_KF + 1):
            gt = circle_pose(k)
            img = W.render_scan(w, gt, gt, MODEL)
            ff = frontend(img)
            corner = F.downsample_featcloud(
                ff.less_sharp, CFG.odometry.corner_map_leaf,
                CFG.odometry.cap_frame_corner)
            surf = F.downsample_featcloud(
                ff.less_flat, CFG.odometry.surf_map_leaf,
                CFG.odometry.cap_frame_surf)
            # ~3 m of drift at the loop end — pose seed lands outside the
            # fine registration's ~1.4 m correspondence gate
            drift = se3.exp(jnp.array([0.18, 0.1, 0.0, 0, 0, 0.01]) * k)
            state = PGraph.add_keyframe(
                state, se3.compose(gt, drift), corner, surf, LCFG)
        q_idx = jnp.asarray(N_KF)
        found_plain, *_ = PGraph.try_close_loop(state, q_idx, LCFG, CFG)
        found_glob, cand, zq, zt, dist, reg = PGraph.try_close_loop(
            state, q_idx, LCFG, CFG, use_global_reg=True)
        assert bool(found_glob), (
            f"global fallback did not verify (plain={bool(found_plain)}, "
            f"inliers={float(reg.inlier_frac):.2f})"
        )
        # the recovered edge must be near the GT relative pose
        Zgt = se3.relative(circle_pose(int(cand)), circle_pose(N_KF))
        err = float(jnp.linalg.norm(se3.boxminus(
            se3.Pose(zq, zt), Zgt)))
        assert err < 0.3, f"loop edge err {err:.2f}"


class TestCapacityOverflow:
    """At capacity, keyframes and loop edges are DROPPED, never corrupted
    (round-1 bug: add_keyframe kept rewriting the final slot when full)."""

    def test_keyframe_overflow_drops_new(self):
        from mloam_tpu.frontend.features import FeatCloud

        lcfg = LoopConfig()
        state = PGraph.init_state(4, 16, 16, lcfg)
        key = jax.random.PRNGKey(0)
        for k in range(6):
            fc = FeatCloud(
                xyz=jax.random.normal(jax.random.fold_in(key, k), (16, 3)),
                mask=jnp.ones(16, bool), time=jnp.zeros(16),
                ring=jnp.zeros(16, jnp.int32),
            )
            pose = Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([float(k), 0, 0]))
            state = PGraph.add_keyframe(state, pose, fc, fc, lcfg)
        assert int(state.count) == 4
        assert bool(state.valid.all())
        # the FIRST four keyframes are intact; 4 and 5 were dropped whole
        np.testing.assert_allclose(
            np.asarray(state.poses.t)[:, 0], [0.0, 1.0, 2.0, 3.0]
        )

    def test_loop_edge_overflow_drops_new(self):
        lcfg = LoopConfig(max_loop_edges=2)
        state = PGraph.init_state(8, 8, 8, lcfg)
        zq = jnp.array([1.0, 0, 0, 0])
        zt = jnp.zeros(3)
        for k in range(4):
            state = PGraph.record_loop(
                state, jnp.asarray(True), jnp.asarray(0, jnp.int32),
                jnp.asarray(k + 1, jnp.int32), zq, zt,
            )
        assert int(state.n_loops) == 2
        np.testing.assert_array_equal(np.asarray(state.loop_j)[:2], [1, 2])
        assert int(state.loop_valid.sum()) == 2
