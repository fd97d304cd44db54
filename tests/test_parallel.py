"""Distributed PGO: mesh-sharded vs single-device equivalence, 4-DoF mode,
and the dryrun contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel import mesh as M
from mloam_tpu.parallel import sharded_pgo as PG


def ring_graph(n=24, noise=0.02, seed=0):
    key = jax.random.PRNGKey(seed)
    step = se3.exp(jnp.array([0.5, 0, 0, 0, 0, 2 * np.pi / n]))
    gt = [Pose.identity()]
    for _ in range(n - 1):
        gt.append(se3.compose(gt[-1], step))
    est = [gt[0]]
    for i in range(1, n):
        d = se3.exp(noise * jax.random.normal(jax.random.fold_in(key, i), (6,)))
        est.append(se3.compose(est[-1], se3.compose(step, d)))
    ei = list(range(n - 1)) + [n - 1]
    ej = list(range(1, n)) + [0]
    rels = [se3.relative(gt[a], gt[b]) for a, b in zip(ei, ej)]
    w = [jnp.ones(6)] * (n - 1) + [10 * jnp.ones(6)]
    edges = PG.PoseGraphEdges(
        i=jnp.array(ei, jnp.int32), j=jnp.array(ej, jnp.int32),
        z_q=jnp.stack([r.q for r in rels]),
        z_t=jnp.stack([r.t for r in rels]),
        weight=jnp.stack(w),
    )
    poses = Pose(jnp.stack([p.q for p in est]), jnp.stack([p.t for p in est]))
    gt_p = Pose(jnp.stack([p.q for p in gt]), jnp.stack([p.t for p in gt]))
    return poses, edges, gt_p


class TestShardedPGO:
    def test_converges(self):
        poses, edges, gt = ring_graph()
        out = PG.optimize_pose_graph(poses, edges, iters=15)
        err = jnp.linalg.norm(out.t - gt.t, axis=1)
        assert float(err.mean()) < 0.01

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_mesh_matches_single_device(self, n_dev):
        poses, edges, gt = ring_graph()
        single = PG.optimize_pose_graph(poses, edges, iters=10)
        mesh = M.make_mesh(n_dev)
        sharded = PG.optimize_pose_graph(poses, edges, iters=10, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(single.t), np.asarray(sharded.t), atol=1e-3
        )

    def test_edge_padding_is_neutral(self):
        # 2 devices with an odd edge count exercises zero-weight padding
        poses, edges, gt = ring_graph(n=11)
        mesh = M.make_mesh(2)
        out = PG.optimize_pose_graph(poses, edges, iters=10, mesh=mesh)
        err = jnp.linalg.norm(out.t - gt.t, axis=1)
        assert float(err.mean()) < 0.02

    @staticmethod
    def _euler_roll_pitch(q):
        """(roll, pitch) of a wxyz quaternion under the zyx convention —
        the quantities the 4-DoF parameterization must hold fixed."""
        w, x, y, z = [float(v) for v in np.asarray(q)]
        roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
        return np.array([roll, pitch])

    def test_dof4_keeps_roll_pitch(self):
        poses, edges, gt = ring_graph(noise=0.03, seed=3)
        out = PG.optimize_pose_graph(poses, edges, iters=10, dof4=True)
        # world-frame euler roll/pitch of every pose must be unchanged
        # (the 4-DoF update is a world-z yaw rotation: R' = Rz(dyaw) R,
        # exactly the reference's yaw-angle parameterization)
        for k in (0, 5, 11):
            np.testing.assert_allclose(
                self._euler_roll_pitch(out.q[k]),
                self._euler_roll_pitch(poses.q[k]), atol=1e-5,
            )

    def test_dof4_converges_on_yaw_drift(self):
        # pure yaw+translation drift is exactly correctable in 4-DoF mode:
        # the 4-row residual must drive the graph to the ground truth
        poses, edges, gt = ring_graph(noise=0.0, seed=0)
        key = jax.random.PRNGKey(5)
        d = 0.05 * jax.random.normal(key, (poses.q.shape[0], 6))
        d = d.at[0].set(0.0)  # pose 0 is the PGO anchor — leave it true
        drift = jax.vmap(
            lambda q, t, dd: PG.boxplus_dof4(Pose(q, t), dd)
        )(poses.q, poses.t, d)
        out = PG.optimize_pose_graph(drift, edges, iters=15, dof4=True)
        err = jnp.linalg.norm(out.t - gt.t, axis=1)
        assert float(err.mean()) < 0.02

    def test_dryrun_contract(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestShardedMap:
    def test_matches_single_device_assembly(self):
        import jax.numpy as jnp
        from mloam_tpu.core import se3 as _se3
        from mloam_tpu.core.se3 import Pose as _Pose
        from mloam_tpu.frontend.features import FeatCloud
        from mloam_tpu.mapping import keyframes as KF
        from mloam_tpu.parallel import sharded_map as SM

        key = jax.random.PRNGKey(0)
        k_cap, n_pts = 16, 64
        db = KF.empty_db(k_cap, n_pts, n_pts)
        for i in range(12):
            pose = _Pose(
                jnp.array([1.0, 0, 0, 0]),
                jnp.array([float(i) * 3.0, 0.0, 0.0]),
            )
            pts = jax.random.normal(jax.random.fold_in(key, i), (n_pts, 3))
            fc = FeatCloud(
                xyz=pts, mask=jnp.ones(n_pts, bool),
                time=jnp.zeros(n_pts), ring=jnp.zeros(n_pts, jnp.int32),
            )
            db = KF.insert(db, pose, 1e-4 * jnp.eye(6), fc, fc)

        center = jnp.array([10.0, 0.0, 0.0])
        ext_cov = jnp.zeros((6, 6))
        cov_meas = 1e-4 * jnp.eye(3)

        mesh = M.make_mesh(4, axis="map")
        db_sh = SM.shard_db(db, mesh)
        xyz_s, cov_s, m_s = SM.sharded_surround_map(
            db_sh, center, radius=10.0, m_per_shard=4,
            ext_cov=ext_cov, cov_meas=cov_meas, mesh=mesh,
        )
        # single-device truth: which keyframes are in radius, their points
        d = np.linalg.norm(np.asarray(db.poses.t) - np.asarray(center), axis=1)
        want_kf = set(np.nonzero((d < 10.0) & np.asarray(db.valid))[0])
        got_pts = np.asarray(xyz_s)[np.asarray(m_s)]
        want_pts = []
        for kf_i in want_kf:
            p = _Pose(db.poses.q[kf_i], db.poses.t[kf_i])
            want_pts.append(np.asarray(_se3.transform_points(p, db.surf.xyz[kf_i])))
        want_pts = np.concatenate(want_pts)
        assert got_pts.shape[0] == want_pts.shape[0]
        # same point sets (order-insensitive)
        got_sorted = got_pts[np.lexsort(got_pts.T)]
        want_sorted = want_pts[np.lexsort(want_pts.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)


class TestBlockSparseCG:
    """Matrix-free PCG solver (pgo_step_cg) vs the dense Cholesky path."""

    def test_cg_matches_dense(self):
        poses, edges, gt = ring_graph()
        dense = PG.optimize_pose_graph(poses, edges, iters=12,
                                       solver="dense")
        cg = PG.optimize_pose_graph(poses, edges, iters=12, solver="cg",
                                    cg_iters=64)
        np.testing.assert_allclose(np.asarray(cg.t), np.asarray(dense.t),
                                   atol=2e-3)

    def test_cg_converges_on_ring(self):
        poses, edges, gt = ring_graph(n=48, noise=0.03, seed=5)
        out = PG.optimize_pose_graph(poses, edges, iters=15, solver="cg")
        dense = PG.optimize_pose_graph(poses, edges, iters=15,
                                       solver="dense")
        # the PCG solve must not degrade GN convergence vs dense Cholesky
        err_cg = float(jnp.linalg.norm(out.t - gt.t, axis=1).mean())
        err_d = float(jnp.linalg.norm(dense.t - gt.t, axis=1).mean())
        assert err_cg < err_d * 1.2 + 1e-4  # small truncated-CG inexactness ok

    def test_cg_sharded_matches_unsharded(self):
        poses, edges, gt = ring_graph(n=32)
        single = PG.optimize_pose_graph(poses, edges, iters=8, solver="cg")
        mesh = M.make_mesh(4)
        sharded = PG.optimize_pose_graph(poses, edges, iters=8, solver="cg",
                                         mesh=mesh)
        np.testing.assert_allclose(np.asarray(single.t),
                                   np.asarray(sharded.t), atol=1e-3)

    def test_cg_large_graph_matches_dense(self):
        # beyond the dense path's comfortable size: 600 poses, auto -> cg.
        # The property under test is solve fidelity (CG == Cholesky per GN
        # step), not global convergence of a heavily-drifted ring (which
        # is damping-limited identically for both solvers).
        poses, edges, gt = ring_graph(n=600, noise=0.01, seed=7)
        out = PG.optimize_pose_graph(poses, edges, iters=3)  # auto -> cg
        dense = PG.optimize_pose_graph(poses, edges, iters=3,
                                       solver="dense")
        assert bool(jnp.isfinite(out.t).all())
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(dense.t),
                                   atol=2e-3)

    def test_cg_dof4_keeps_roll_pitch(self):
        poses, edges, gt = ring_graph(noise=0.03, seed=3)
        out = PG.optimize_pose_graph(poses, edges, iters=8, dof4=True,
                                     solver="cg")
        for k in (0, 5, 11):
            np.testing.assert_allclose(
                TestShardedPGO._euler_roll_pitch(out.q[k]),
                TestShardedPGO._euler_roll_pitch(poses.q[k]), atol=1e-5,
            )
