"""Mapping backend: keyframe DB mechanics + full-pipeline ATE improvement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.mapping import keyframes as KF
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import FullPipeline
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.utils import evaluation


class TestKeyframeDB:
    def test_insert_and_ring(self):
        db = KF.empty_db(4, 8, 8)
        fc = FeatCloud.zeros(8)
        for i in range(6):
            pose = Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([float(i), 0, 0]))
            db = KF.insert(db, pose, jnp.eye(6), fc, fc)
        assert bool(db.valid.all())
        assert int(db.head) == 6
        # ring: slots hold poses 4,5,2,3
        assert set(np.asarray(db.poses.t)[:, 0].tolist()) == {2.0, 3.0, 4.0, 5.0}

    def test_should_insert_gates(self):
        p0 = Pose.identity()
        near = Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0, 0]))
        far = Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([1.5, 0, 0]))
        assert not bool(KF.should_insert(near, p0, 1.0, 1.0))
        assert bool(KF.should_insert(far, p0, 1.0, 1.0))
        rotated = Pose(
            jnp.array([0.9999, 0.0, 0.0, 0.0175]), jnp.zeros(3)
        )  # ~2 deg yaw
        assert bool(KF.should_insert(rotated, p0, 1.0, 1.0))

    def test_surrounding_radius(self):
        db = KF.empty_db(8, 4, 4)
        fc = FeatCloud.zeros(4)
        for i in range(8):
            pose = Pose(jnp.array([1.0, 0, 0, 0]),
                        jnp.array([float(i) * 10, 0, 0]))
            db = KF.insert(db, pose, jnp.eye(6), fc, fc)
        idx, ok = KF.surrounding(db, jnp.array([0.0, 0, 0]), radius=25.0, m=8)
        assert int(ok.sum()) == 3  # keyframes at 0, 10, 20


class TestFullPipeline:
    N = 14

    @pytest.fixture(scope="class")
    def run(self):
        cfg = platforms.synthetic(n_lidars=1)
        imgs, gt = render(cfg, self.N)
        pipe = FullPipeline(cfg)
        est = []
        for i in range(self.N):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            out = pipe.process([img])
            est.append(np.asarray(out.map_pose.t))
        return np.stack(est), gt, pipe

    def test_map_ate_within_bounds(self, run):
        est, gt, _ = run
        ate = evaluation.ate_rmse(est, np.asarray(gt.t[: self.N]))
        assert ate < 0.05, f"map ATE {ate*100:.1f} cm"

    def test_keyframes_inserted(self, run):
        _, _, pipe = run
        assert int(pipe.mapper_state.db.valid.sum()) >= 2

    def test_map_cov_is_positive(self, run):
        _, _, pipe = run
        # last inserted keyframe covariance should be PSD and modest
        cov = np.asarray(pipe.mapper_state.db.cov)
        valid = np.asarray(pipe.mapper_state.db.valid)
        eigs = np.linalg.eigvalsh(cov[valid])
        assert (eigs > -1e-6).all()

    def test_outlier_channel_stored_in_keyframes(self, run):
        """Segmentation rejects ride into keyframes as a third feature
        class (reference /laser_cloud_outlier)."""
        _, _, pipe = run
        db = pipe.mapper_state.db
        valid = np.asarray(db.valid)
        kf_mask = np.asarray(db.outlier.mask)[valid]
        # at least one keyframe carries some outlier points (the synthetic
        # world has small clusters that the segmenter drops)
        assert kf_mask.any()
        # stored outlier points are finite, in-range coordinates
        xyz = np.asarray(db.outlier.xyz)[valid][kf_mask]
        assert np.isfinite(xyz).all()


class TestUncertaintyAwareMapping:
    """The mapper's ext_cov plumbing (the reference's COV_EXT via
    /extrinsics, lidar_mapper_keyframe.cpp:1028-1046)."""

    def test_default_ext_cov_from_config_prior(self):
        import dataclasses

        from mloam_tpu.mapping import mapper as MP

        cfg = platforms.synthetic(n_lidars=2)
        cfg = dataclasses.replace(cfg, mapping=dataclasses.replace(
            cfg.mapping,
            ext_cov_prior_diag=(1e-3,) * 6, uct_ext_ratio=2.0))
        ec = np.asarray(MP.default_ext_cov(cfg))
        assert ec.shape == (2, 6, 6)
        np.testing.assert_allclose(ec[0], 0.0)        # reference lidar exact
        np.testing.assert_allclose(np.diag(ec[1]), 2e-3, rtol=1e-6)

    def test_install_ext_cov_overrides_prior(self):
        cfg = platforms.synthetic(n_lidars=2)
        pipe = FullPipeline(cfg)
        assert float(np.abs(np.asarray(pipe.mapper_state.ext_cov)).max()) == 0
        pipe.odom.ext_cov = 5e-4 * np.eye(6, dtype=np.float32)[None]
        pipe._install_ext_cov()
        ec = np.asarray(pipe.mapper_state.ext_cov)
        np.testing.assert_allclose(ec[0], 0.0)
        np.testing.assert_allclose(np.diag(ec[1]), 5e-4, rtol=1e-6)
        assert pipe._ext_cov_installed

    def test_point_cov_per_lidar_segments(self):
        from mloam_tpu.core.se3 import Pose as _Pose
        from mloam_tpu.mapping.mapper import _point_cov

        n = 8
        xyz = jnp.concatenate([
            jnp.tile(jnp.array([[5.0, 0, 0]]), (n, 1)),
            jnp.tile(jnp.array([[5.0, 0, 0]]), (n, 1)),
        ])
        ext_cov = jnp.stack([jnp.zeros((6, 6)), 1.0 * jnp.eye(6)])
        cov = _point_cov(xyz, _Pose.identity(), jnp.zeros((6, 6)), ext_cov,
                         1e-6 * jnp.eye(3))
        tr = np.asarray(jnp.trace(cov, axis1=-2, axis2=-1))
        # identical points: only the per-lidar extrinsic covariance differs
        assert tr[:n].max() < 1e-4
        assert tr[n:].min() > 1.0  # rotation lever arm at 5 m range


def test_uncertainty_weight_curve():
    """Pin the covariance-driven factor weight to the reference's clamped
    sqrt-info form (lidar_map_factor.hpp:34-42): w = 1 while
    sqrt(1/tr) >= 3 (tr <= 1/9), else 1/(3*sqrt(tr))."""
    import jax.numpy as jnp

    from mloam_tpu.mapping.mapper import uncertainty_sqrt_info

    tr = jnp.array([1e-6, 0.05, 1.0 / 9.0, 0.25, 1.0, 4.0, 10.0])
    w = np.asarray(uncertainty_sqrt_info(tr))
    np.testing.assert_allclose(w[:3], 1.0, rtol=1e-5)      # trusted region
    np.testing.assert_allclose(w[3], 1.0 / (3 * 0.5), rtol=1e-5)
    np.testing.assert_allclose(w[4], 1.0 / 3.0, rtol=1e-5)
    np.testing.assert_allclose(w[5], 1.0 / 6.0, rtol=1e-5)
    assert np.all(np.diff(w) <= 1e-7)                      # monotone decay
    # invalid traces -> ~0 weight, never NaN
    bad = np.asarray(uncertainty_sqrt_info(jnp.array([jnp.nan, jnp.inf])))
    assert np.isfinite(bad).all() and (bad < 1e-2).all()
