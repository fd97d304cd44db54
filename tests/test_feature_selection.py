"""Good-feature selection: Jacobian blocks vs autodiff, logdet dominance of
the greedy method over random, FPS spread."""

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.solver import factors
from mloam_tpu.solver import feature_selection as FS


def rand_plane_corr(key, n):
    k1, k2, k3 = jax.random.split(key, 3)
    normal = jax.random.normal(k1, (n, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return factors.PlaneCorr(
        p=jax.random.uniform(k2, (n, 3), minval=-10, maxval=10),
        s=jnp.zeros((n,)),
        normal=normal,
        d=jax.random.normal(k3, (n,)),
        w=jnp.ones((n,)),
    )


def rand_edge_corr(key, n):
    k1, k2, k3 = jax.random.split(key, 3)
    pa = jax.random.uniform(k1, (n, 3), minval=-10, maxval=10)
    return factors.EdgeCorr(
        p=jax.random.uniform(k2, (n, 3), minval=-10, maxval=10),
        s=jnp.zeros((n,)),
        pa=pa,
        pb=pa + jax.random.normal(k3, (n, 3)),
        w=jnp.ones((n,)),
    )


class TestJacobianBlocks:
    def test_plane_matches_autodiff(self):
        corr = rand_plane_corr(jax.random.PRNGKey(0), 16)
        pose = se3.exp(jnp.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.3]))

        def res(dx):
            T = se3.boxplus(pose, dx)
            return factors.plane_residual(
                se3.transform_points(T, corr.p), corr
            )

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        J_an = FS.plane_jacobian_blocks(corr, pose)
        np.testing.assert_allclose(J_an, J_ad, atol=1e-4)

    def test_edge_matches_autodiff(self):
        corr = rand_edge_corr(jax.random.PRNGKey(1), 8)
        pose = se3.exp(jnp.array([-0.1, 0.4, 0.2, -0.2, 0.1, 0.3]))

        def res(dx):
            T = se3.boxplus(pose, dx)
            return factors.edge_residual(
                se3.transform_points(T, corr.p), corr
            ).reshape(-1)

        J_ad = jax.jacfwd(res)(jnp.zeros(6)).reshape(8, 3, 6)
        J_an = FS.edge_jacobian_blocks(corr, pose)
        np.testing.assert_allclose(J_an, J_ad, atol=1e-4)


class TestSelection:
    def _logdet(self, Jp, keep_p, Je, keep_e):
        H = 1e-3 * jnp.eye(6)
        H = H + jnp.einsum("n,ni,nj->ij", keep_p.astype(jnp.float32), Jp, Jp)
        H = H + jnp.einsum("n,nai,naj->ij", keep_e.astype(jnp.float32), Je, Je)
        return float(jnp.linalg.slogdet(H)[1])

    def test_gd_beats_random(self):
        key = jax.random.PRNGKey(2)
        plane = rand_plane_corr(key, 400)
        edge = rand_edge_corr(jax.random.PRNGKey(3), 100)
        pose = Pose.identity()
        Jp = FS.plane_jacobian_blocks(plane, pose)
        Je = FS.edge_jacobian_blocks(edge, pose)
        keep_p, keep_e = FS.logdet_gain_select(Jp, plane.w, Je, edge.w, 0.2)
        n_sel = int(keep_p.sum()) + int(keep_e.sum())
        assert 0 < n_sel <= int(0.25 * 500) + 8
        ld_gd = self._logdet(Jp, keep_p, Je, keep_e)
        lds_rnd = []
        for i in range(5):
            kp = FS.random_select(plane.w, n_sel / 500, jax.random.PRNGKey(10 + i))
            ke = FS.random_select(edge.w, n_sel / 500, jax.random.PRNGKey(50 + i))
            lds_rnd.append(self._logdet(Jp, kp, Je, ke))
        assert ld_gd > np.mean(lds_rnd), (ld_gd, lds_rnd)

    def test_fps_spreads(self):
        key = jax.random.PRNGKey(4)
        # two clusters; fps must take from both
        a = jax.random.normal(key, (50, 3)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(5), (50, 3)) * 0.1 + 20.0
        xyz = jnp.concatenate([a, b])
        keep = FS.fps_select(xyz, jnp.ones(100), 10)
        assert int(keep.sum()) == 10
        assert keep[:50].any() and keep[50:].any()

    def test_apply_selection_full_is_identity(self):
        plane = rand_plane_corr(jax.random.PRNGKey(6), 32)
        edge = rand_edge_corr(jax.random.PRNGKey(7), 16)
        p2, e2 = FS.apply_selection(plane, edge, Pose.identity(), "full", 1.0)
        np.testing.assert_array_equal(p2.w, plane.w)


def test_no_underselection_at_scale():
    """Round-2 weak finding: the fixed 512 top-k width silently capped each
    round's admissions, so >4096 candidates at gf_ratio 0.5 kept far fewer
    than requested. The width now follows max_ratio * n / rounds."""
    import jax

    key = jax.random.PRNGKey(5)
    kp, ke = jax.random.split(key)
    plane = rand_plane_corr(kp, 6000)
    edge = rand_edge_corr(ke, 600)
    pose = Pose.identity()
    Jp = FS.plane_jacobian_blocks(plane, pose)
    Je = FS.edge_jacobian_blocks(edge, pose)
    ratio = 0.5
    keep_p, keep_e = FS.logdet_gain_select(Jp, plane.w, Je, edge.w, ratio,
                                           max_ratio=ratio)
    n_valid = int(jnp.sum(plane.w > 0)) + int(jnp.sum(edge.w > 0))
    kept = int(jnp.sum(keep_p)) + int(jnp.sum(keep_e))
    target = int(np.ceil(ratio * n_valid))
    # quota rounding loses at most (rounds - 1)
    assert kept >= target - 8, (kept, target)
    assert kept <= target + 8
