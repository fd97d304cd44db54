"""Priorless global registration: FPFH+RANSAC and yaw-sweep correlation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import LidarModel
from mloam_tpu.frontend import features as F
from mloam_tpu.frontend import segmentation as S
from mloam_tpu.loop import global_registration as GR
from mloam_tpu.models import platforms
from mloam_tpu.sim import world as W

MODEL = LidarModel(n_rings=16, n_cols=900)
CFG = platforms.synthetic(1)


def structured_cloud():
    key = jax.random.PRNGKey(0)
    n = 600
    a = jnp.stack([jax.random.uniform(key, (n,)) * 8, jnp.zeros(n),
                   jax.random.uniform(jax.random.PRNGKey(1), (n,)) * 3], -1)
    b = jnp.stack([jnp.zeros(n), jax.random.uniform(jax.random.PRNGKey(2), (n,)) * 8,
                   jax.random.uniform(jax.random.PRNGKey(3), (n,)) * 3], -1)
    g = jnp.stack([jax.random.uniform(jax.random.PRNGKey(4), (n,)) * 8,
                   jax.random.uniform(jax.random.PRNGKey(5), (n,)) * 8,
                   jnp.zeros(n)], -1)
    pts = jnp.concatenate([a, b, g])
    return pts, jnp.ones(pts.shape[0], bool)


class TestFpfhRansac:
    def test_recovers_rigid_transform(self):
        dst, mask = structured_cloud()
        T_gt = se3.exp(jnp.array([2.0, -1.0, 0.5, 0.2, 0.1, 0.8]))
        src = se3.transform_points(se3.inverse(T_gt), dst)
        res = GR.register_global(src, mask, dst, mask, jax.random.PRNGKey(7))
        assert bool(res.ok)
        # coarse stage: the LOAM fine registration follows; 15 cm-rad is
        # comfortably inside its convergence basin
        assert float(jnp.linalg.norm(se3.boxminus(res.pose, T_gt))) < 0.15

    def test_fpfh_is_rotation_invariant(self):
        dst, mask = structured_cloud()
        f0 = GR.fpfh(dst, mask, 12)
        R = rot.so3_exp_quat(jnp.array([0.2, -0.4, 0.9]))
        f1 = GR.fpfh(rot.quat_rotate(R[None], dst), mask, 12)
        # histograms should match closely (binning edge effects aside)
        diff = jnp.linalg.norm(f0 - f1, axis=-1) / (
            jnp.linalg.norm(f0, axis=-1) + 1e-6
        )
        assert float(jnp.median(diff)) < 0.2


@pytest.fixture(scope="module")
def sim_world():
    return W.make_world(jax.random.PRNGKey(3), extent=30.0)


def render_kf(w, pose, cap=8192):
    fcfg = dataclasses.replace(CFG.features, cap_less_flat=cap)
    img = W.render_scan(w, pose, pose, MODEL)
    ff = F.extract(img, S.segment(img, MODEL, CFG.segmenter).segmented, fcfg)
    return F.downsample_featcloud(ff.less_flat, 0.25, cap)


def local_map(w, center_pose):
    xs, ms = [], []
    for dx in ([0, 0, 0], [0.8, 0, 0.15], [0, 0.8, -0.1]):
        p = se3.compose(center_pose, se3.exp(jnp.array(dx + [0, 0, 0.0])))
        c = render_kf(w, p)
        rel = se3.relative(center_pose, p)
        xs.append(se3.transform_points(rel, c.xyz))
        ms.append(c.mask)
    return jnp.concatenate(xs), jnp.concatenate(ms)


class TestCorrelationRegistration:
    def test_large_unknown_offset_on_local_maps(self, sim_world):
        p0 = se3.Pose(rot.so3_exp_quat(jnp.array([0.0, 0.0, 0.3])),
                      jnp.array([2.0, 1.0, 0.6]))
        T_gt = se3.exp(jnp.array([3.0, -2.0, 0.0, 0.0, 0.0, 1.2]))
        p1 = se3.compose(p0, T_gt)
        sx, sm = local_map(sim_world, p1)
        dx, dm = local_map(sim_world, p0)
        res = GR.register_correlation(sx, sm, dx, dm)
        assert bool(res.ok)
        assert float(jnp.linalg.norm(res.pose.t[:2] - T_gt.t[:2])) < 0.7
        dyaw = rot.so3_log(
            rot.quat_multiply(rot.quat_conjugate(T_gt.q), res.pose.q)
        )[2]
        assert abs(float(dyaw)) < 0.08

    def test_self_registration_is_identity(self, sim_world):
        p0 = se3.Pose(rot.so3_exp_quat(jnp.array([0.0, 0.0, 0.3])),
                      jnp.array([2.0, 1.0, 0.6]))
        c = render_kf(sim_world, p0)
        res = GR.register_correlation(c.xyz, c.mask, c.xyz, c.mask)
        assert bool(res.ok)
        assert float(jnp.linalg.norm(res.pose.t[:2])) < 0.01
