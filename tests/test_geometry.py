"""Core geometry: quaternion/SO(3)/SE(3) identities and round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose


def rand_quat(key, batch=()):
    q = jax.random.normal(key, batch + (4,))
    return rot.quat_normalize(q)


def rand_pose(key, batch=()):
    k1, k2 = jax.random.split(key)
    return Pose(rand_quat(k1, batch), jax.random.normal(k2, batch + (3,)))


class TestRotations:
    def test_multiply_vs_matrix(self):
        key = jax.random.PRNGKey(0)
        a, b = rand_quat(key), rand_quat(jax.random.PRNGKey(1))
        Rab = rot.quat_to_matrix(rot.quat_multiply(a, b))
        np.testing.assert_allclose(
            Rab, rot.quat_to_matrix(a) @ rot.quat_to_matrix(b), atol=1e-5
        )

    def test_rotate_vs_matrix(self):
        key = jax.random.PRNGKey(2)
        q = rand_quat(key, (7,))
        v = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
        out = rot.quat_rotate(q, v)
        ref = jnp.einsum("bij,bj->bi", rot.quat_to_matrix(q), v)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        # exercise all four Shepperd branches with rotations near each axis
        for i, phi in enumerate(
            [
                [0.01, 0, 0],
                [3.1, 0, 0],
                [0, 3.1, 0],
                [0, 0, 3.1],
                [1.0, -2.0, 0.5],
            ]
        ):
            q = rot.so3_exp_quat(jnp.array(phi, jnp.float32))
            q2 = rot.matrix_to_quat(rot.quat_to_matrix(q))
            np.testing.assert_allclose(
                jnp.abs(jnp.dot(q, q2)), 1.0, atol=1e-5, err_msg=f"case {i}"
            )

    def test_exp_log_roundtrip(self):
        phi = jnp.array([[0.0, 0.0, 0.0], [1e-5, 0, 0], [0.3, -0.7, 1.1], [2.9, 0.1, 0.1]])
        out = rot.so3_log(rot.so3_exp_quat(phi))
        np.testing.assert_allclose(out, phi, atol=1e-5)

    def test_slerp_endpoints_and_midpoint(self):
        q0 = rot.so3_exp_quat(jnp.array([0.0, 0.0, 0.0]))
        q1 = rot.so3_exp_quat(jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(rot.quat_slerp(q0, q1, 0.0), q0, atol=1e-6)
        np.testing.assert_allclose(
            jnp.abs(jnp.dot(rot.quat_slerp(q0, q1, 1.0), q1)), 1.0, atol=1e-6
        )
        mid = rot.quat_slerp(q0, q1, 0.5)
        np.testing.assert_allclose(
            rot.so3_log(mid), jnp.array([0.0, 0.0, 0.5]), atol=1e-5
        )

    def test_left_jacobian_inverse(self):
        phi = jnp.array([[0.4, -0.2, 0.9], [1e-6, 0, 0]])
        J = rot.so3_left_jacobian(phi)
        Jinv = rot.so3_left_jacobian_inv(phi)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-5)


class TestSE3:
    def test_compose_inverse(self):
        a = rand_pose(jax.random.PRNGKey(4))
        b = rand_pose(jax.random.PRNGKey(5))
        ab = se3.compose(a, b)
        np.testing.assert_allclose(
            ab.matrix(), a.matrix() @ b.matrix(), atol=1e-5
        )
        ident = se3.compose(a, se3.inverse(a))
        np.testing.assert_allclose(ident.t, jnp.zeros(3), atol=1e-5)
        np.testing.assert_allclose(jnp.abs(ident.q[0]), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = jnp.array([[0.5, -1.0, 0.2, 0.3, -0.1, 0.8], [0, 0, 0, 0, 0, 0]])
        out = se3.log(se3.exp(xi))
        np.testing.assert_allclose(out, xi, atol=1e-5)

    def test_boxplus_boxminus(self):
        p = rand_pose(jax.random.PRNGKey(6))
        xi = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (6,))
        q = se3.boxplus(p, xi)
        np.testing.assert_allclose(se3.boxminus(q, p), xi, atol=1e-5)

    def test_transform_points_matches_matrix(self):
        p = rand_pose(jax.random.PRNGKey(8))
        pts = jax.random.normal(jax.random.PRNGKey(9), (11, 3))
        out = se3.transform_points(p, pts)
        T = p.matrix()
        ref = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_adjoint_identity(self):
        # Ad_T xi == log(T Exp(xi) T^-1) for small xi
        p = rand_pose(jax.random.PRNGKey(10))
        xi = 1e-3 * jax.random.normal(jax.random.PRNGKey(11), (6,))
        lhs = se3.adjoint(p) @ xi
        rhs = se3.log(se3.compose(se3.compose(p, se3.exp(xi)), se3.inverse(p)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_mean_pose(self):
        base = rand_pose(jax.random.PRNGKey(12))
        xi = 0.05 * jax.random.normal(jax.random.PRNGKey(13), (20, 6))
        poses = jax.vmap(lambda x: se3.boxplus(base, x))(xi)
        mu = se3.mean_pose(poses)
        resid = se3.boxminus(mu, base) - jnp.mean(xi, axis=0)
        assert jnp.linalg.norm(resid) < 1e-3

    def test_interpolate_midpoint(self):
        p0 = Pose.identity()
        p1 = se3.exp(jnp.array([1.0, 0, 0, 0, 0, 0.6]))
        mid = se3.interpolate(p0, p1, 0.5)
        np.testing.assert_allclose(
            rot.so3_log(mid.q), jnp.array([0, 0, 0.3]), atol=1e-5
        )
        np.testing.assert_allclose(mid.t, p1.t / 2, atol=1e-6)


class TestUncertainty:
    def test_compound_second_order_matches_monte_carlo(self):
        from mloam_tpu.core import uncertainty as uct

        p1 = rand_pose(jax.random.PRNGKey(14))
        p2 = rand_pose(jax.random.PRNGKey(15))
        cov1 = 1e-4 * jnp.eye(6)
        cov2 = 2e-4 * jnp.eye(6)
        _, cov = uct.compound_pose_cov(p1, cov1, p2, cov2, fourth_order=False)
        # sampled check: x = log((p1 Exp(e1))(p2 Exp(e2)) (p1 p2)^-1)
        n = 4000
        k1, k2 = jax.random.split(jax.random.PRNGKey(16))
        e1 = jax.random.multivariate_normal(k1, jnp.zeros(6), cov1, (n,))
        e2 = jax.random.multivariate_normal(k2, jnp.zeros(6), cov2, (n,))
        mean = se3.compose(p1, p2)

        def sample(a, b):
            # left perturbations: (Exp(a) T1)(Exp(b) T2) — Barfoot's convention
            s = se3.compose(se3.compose(se3.exp(a), p1), se3.compose(se3.exp(b), p2))
            return se3.log(se3.compose(s, se3.inverse(mean)))

        xs = jax.vmap(sample)(e1, e2)
        emp = jnp.cov(xs.T)
        np.testing.assert_allclose(emp, cov, atol=5e-5)

    def test_fourth_order_close_to_second_for_small_cov(self):
        from mloam_tpu.core import uncertainty as uct

        p1 = rand_pose(jax.random.PRNGKey(17))
        p2 = rand_pose(jax.random.PRNGKey(18))
        cov1 = 1e-6 * jnp.eye(6)
        cov2 = 1e-6 * jnp.eye(6)
        _, c2 = uct.compound_pose_cov(p1, cov1, p2, cov2, fourth_order=False)
        _, c4 = uct.compound_pose_cov(p1, cov1, p2, cov2, fourth_order=True)
        np.testing.assert_allclose(c2, c4, rtol=1e-2, atol=1e-10)

    def test_point_cov_pushforward_monte_carlo(self):
        from mloam_tpu.core import uncertainty as uct

        pose = rand_pose(jax.random.PRNGKey(19))
        cov_pose = 1e-4 * jnp.eye(6)
        cov_meas = 1e-4 * jnp.eye(3)
        pts = jnp.array([[1.0, 2.0, -0.5]])
        cov = uct.point_cov_pushforward(pts, pose, cov_pose, cov_meas)[0]

        n = 5000
        k1, k2 = jax.random.split(jax.random.PRNGKey(20))
        e = jax.random.multivariate_normal(k1, jnp.zeros(6), cov_pose, (n,))
        z = jax.random.multivariate_normal(k2, jnp.zeros(3), cov_meas, (n,))

        def sample(ei, zi):
            # left perturbation: T' = Exp(e) T  (Barfoot convention)
            pp = se3.compose(se3.exp(ei), pose)
            return se3.transform_points(pp, (pts[0] + zi)[None])[0]

        ys = jax.vmap(sample)(e, z)
        emp = jnp.cov((ys - jnp.mean(ys, 0)).T)
        np.testing.assert_allclose(emp, cov, atol=5e-5)


class TestDeskew:
    def test_deskew_zero_motion_is_identity(self):
        from mloam_tpu.core import cloud as cl

        pts = jax.random.normal(jax.random.PRNGKey(21), (9, 3))
        s = jnp.linspace(0, 1, 9)
        out = cl.deskew(pts, s, Pose.identity())
        np.testing.assert_allclose(out, pts, atol=1e-6)

    def test_deskew_full_time_applies_full_motion(self):
        from mloam_tpu.core import cloud as cl

        motion = se3.exp(jnp.array([0.2, 0.1, 0.0, 0.0, 0.0, 0.3]))
        pts = jnp.array([[1.0, 0.0, 0.0]])
        out = cl.deskew(pts, jnp.array([1.0]), motion)
        ref = se3.transform_points(motion, pts)
        np.testing.assert_allclose(out, ref, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestGps:
    def test_enu_roundtrip_small_offsets(self):
        from mloam_tpu.utils import gps

        ref = (22.3364, 114.2654, 10.0)  # HK
        # ~111 m north, ~103 m east at this latitude
        enu = gps.lla_to_enu(
            [22.3364 + 0.001, 22.3364], [114.2654, 114.2654 + 0.001],
            [10.0, 10.0], ref,
        )
        assert abs(enu[0, 1] - 110.6) < 1.0   # north
        assert abs(enu[1, 0] - 102.6) < 1.0   # east
        assert abs(enu[0, 0]) < 1.0 and abs(enu[1, 1]) < 1.0
