"""Nested-dissection distributed PGO/BA (parallel/dd_pgo.py).

The DD step must be algebraically EXACT vs the dense single-device damped
GN step (sharded_pgo.pgo_step) — elimination order must not change the
solution. Verified on the virtual 8-device mesh in 1-D (factor) and 2-D
(host, factor) layouts, with and without per-pose point factors and
in-step map re-association, in 6-DoF and 4-DoF modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import mloam_tpu.core.rotations as rot
from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel import dd_pgo as DD
from mloam_tpu.parallel import scaling_model as SM
from mloam_tpu.parallel import sharded_pgo as PG
from mloam_tpu.parallel.mesh import FACTOR_AXIS, HOST_AXIS

N = 128


@pytest.fixture(scope="module")
def graph():
    return SM.make_survey_graph(N, n_loops=8, noise=0.05)


@pytest.fixture(scope="module")
def meshes():
    devs = jax.devices()
    return (Mesh(np.asarray(devs[:8]), (FACTOR_AXIS,)),
            Mesh(np.asarray(devs[:8]).reshape(2, 4),
                 (HOST_AXIS, FACTOR_AXIS)))


def dense_steps(poses, edges, iters, dof4=False):
    p = poses
    for _ in range(iters):
        p, _ = PG.pgo_step(p, edges, dof4=dof4)
    return p


class TestExactEquivalence:
    def test_1d_mesh_matches_dense(self, graph, meshes):
        poses, edges, gt = graph
        ref = dense_steps(poses, edges, 5)
        out, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[0], iters=5)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                                   atol=1e-4)

    def test_2d_mesh_matches_dense(self, graph, meshes):
        """Two-level nested dissection (host-intra elimination + DCN-only
        global reduction) is still exact."""
        poses, edges, gt = graph
        ref = dense_steps(poses, edges, 5)
        out, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[1], iters=5)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=1e-4)

    def test_dof4_matches_dense(self, graph, meshes):
        poses, edges, gt = graph
        ref = dense_steps(poses, edges, 4, dof4=True)
        out, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[1], iters=4,
                                           dof4=True)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=1e-4)

    def test_dof4_rejects_point_factors(self, graph, meshes):
        """point_block linearizes with the 6-DoF right-perturbation
        Jacobian; combining it with the yaw-only dof4 retraction would be
        an inconsistent linearization and must be refused."""
        poses, edges, _ = graph
        n = poses.q.shape[0]
        ms = DD.MapShard(
            pts=jnp.zeros((n, 4, 3)), anchors=jnp.zeros((n, 4, 3)),
            normals=jnp.zeros((n, 4, 3)), w=jnp.zeros((n, 4)),
            valid=jnp.zeros((n, 4)),
        )
        with pytest.raises(ValueError, match="dof4"):
            DD.optimize_pose_graph_dd(poses, edges, meshes[0], iters=1,
                                      dof4=True, map_shard=ms)

    def test_converges_to_gt(self, graph, meshes):
        poses, edges, gt = graph
        err0 = float(jnp.linalg.norm(poses.t - gt.t, axis=1).mean())
        out, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[0], iters=8)
        err1 = float(jnp.linalg.norm(out.t - gt.t, axis=1).mean())
        assert err1 < 0.1 * err0


class TestPointFactors:
    def _pf(self, gt, K=12):
        pts = jax.random.normal(jax.random.PRNGKey(3), (N, K, 3))
        nrm = jax.random.normal(jax.random.PRNGKey(4), (N, K, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        pw = jax.vmap(lambda q, t, p: jnp.einsum(
            "ij,kj->ki", rot.quat_to_matrix(q), p) + t)(gt.q, gt.t, pts)
        d = -jnp.einsum("nki,nki->nk", nrm, pw)
        return DD.PointFactors(pts=pts, normals=nrm, d=d,
                               w=jnp.ones((N, K)))

    def test_point_block_jacobian_matches_autodiff(self, graph):
        """Analytic right-perturbation J vs jax.jacfwd (the reference's
        factor check() discipline, lidar_scan_factor.hpp:64-118)."""
        from mloam_tpu.core import se3
        poses, _, gt = graph
        pf = self._pf(gt, K=5)
        pose = Pose(poses.q[7], poses.t[7])
        pts, n, d, w = pf.pts[7], pf.normals[7], pf.d[7], pf.w[7]

        def res(xi):
            T = se3.boxplus(pose, xi)
            R = rot.quat_to_matrix(T.q)
            pw = jnp.einsum("ij,kj->ki", R, pts) + T.t
            return w * (jnp.einsum("ki,ki->k", n, pw) + d)

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        H, g, _ = DD.point_block(pose, pts, n, d, w)
        np.testing.assert_allclose(np.asarray(H), np.asarray(J_ad.T @ J_ad),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g),
                                   np.asarray(J_ad.T @ res(jnp.zeros(6))),
                                   atol=1e-4)

    def test_ba_converges_and_layouts_agree(self, graph, meshes):
        """Point-to-plane anchors pull the solution to gt exactly; the two
        mesh layouts (and their different elimination orders + owned-row
        assignments) agree."""
        poses, edges, gt = graph
        pf = self._pf(gt)
        o1, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[0], iters=8,
                                          point_factors=pf)
        o2, _ = DD.optimize_pose_graph_dd(poses, edges, meshes[1], iters=8,
                                          point_factors=pf)
        err1 = float(jnp.linalg.norm(o1.t - gt.t, axis=1).mean())
        assert err1 < 1e-4
        np.testing.assert_allclose(np.asarray(o1.t), np.asarray(o2.t),
                                   atol=1e-4)


class TestMapReassociation:
    def test_in_step_association_recovers_gt(self, graph, meshes):
        """MapShard re-association: scan points that lie exactly on their
        nearest map plane at gt must drive the BA cost to ~0."""
        poses, edges, gt = graph
        M, K = 24, 12
        anc = jax.vmap(lambda q, t, p: jnp.einsum(
            "ij,kj->ki", rot.quat_to_matrix(q), p) + t)(
            gt.q, gt.t, jax.random.normal(jax.random.PRNGKey(7), (N, M, 3)))
        pts_b = jax.vmap(lambda q, t, a: jnp.einsum(
            "ji,kj->ki", rot.quat_to_matrix(q), a - t))(
            gt.q, gt.t, anc[:, :K])
        nrm = jax.random.normal(jax.random.PRNGKey(8), (N, M, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        ms = DD.MapShard(pts=pts_b, anchors=anc, normals=nrm,
                         w=jnp.ones((N, K)), valid=jnp.ones((N, M)))
        out, cost = DD.optimize_pose_graph_dd(
            poses, edges, meshes[1], iters=8, map_shard=ms)
        err = float(jnp.linalg.norm(out.t - gt.t, axis=1).mean())
        assert err < 1e-4
        assert float(cost) < 1e-5

    def test_assoc_chunking_identical(self, graph, meshes):
        """lax.map-chunked association must produce the same program
        output as the vmapped one."""
        poses, edges, gt = graph
        M, K = 16, 8
        anc = jax.random.normal(jax.random.PRNGKey(9), (N, M, 3)) * 5.0
        nrm = jax.random.normal(jax.random.PRNGKey(10), (N, M, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        pts = jax.random.normal(jax.random.PRNGKey(11), (N, K, 3))
        ms = DD.MapShard(pts=pts, anchors=anc, normals=nrm,
                         w=jnp.ones((N, K)), valid=jnp.ones((N, M)))
        o1, c1 = DD.optimize_pose_graph_dd(
            poses, edges, meshes[0], iters=2, map_shard=ms, max_dist=10.0)
        o2, c2 = DD.optimize_pose_graph_dd(
            poses, edges, meshes[0], iters=2, map_shard=ms, max_dist=10.0,
            assoc_chunk=4)
        np.testing.assert_allclose(np.asarray(o1.t), np.asarray(o2.t),
                                   atol=1e-5)


class TestPartition:
    def test_partition_invariants(self, graph):
        _, edges, _ = graph
        for n_shards, n_hosts in ((8, 1), (8, 2), (4, 2)):
            part = DD.build_partition(np.asarray(edges.i),
                                      np.asarray(edges.j), N,
                                      n_shards, n_hosts=n_hosts)
            # every pose appears exactly once: interiors + separators
            ints = part.int_idx[part.int_mask > 0]
            seps = part.sep_idx[part.sep_mask > 0]
            all_ids = np.sort(np.concatenate([ints, seps]))
            np.testing.assert_array_equal(all_ids, np.arange(N))
            # owned separators cover all separators exactly once
            owned = part.own_rows[part.own_mask > 0]
            np.testing.assert_array_equal(np.sort(owned), np.sort(seps))
            # every edge lands in exactly one shard
            assert int(part.e_mask.sum()) == int(edges.i.shape[0])
            # anchor is a global separator
            glob = part.sep_idx[part.n_hosts * part.si:]
            assert 0 in glob.tolist()

    def test_separators_small_for_survey_graph(self):
        """On the reference-shaped graph (skip<=4 + loops) the separator
        set stays ~2*skip*boundaries + 2*loops — the property the whole
        communication design rests on."""
        _, edges, _ = SM.make_survey_graph(1024, n_loops=32)
        part = DD.build_partition(np.asarray(edges.i), np.asarray(edges.j),
                                  1024, 8, n_hosts=1)
        assert part.sg <= 2 * 4 * 7 + 2 * 32 + 1
        part2 = DD.build_partition(np.asarray(edges.i), np.asarray(edges.j),
                                   1024, 16, n_hosts=2)
        # only host-boundary + cross-host loop poses are global
        assert part2.sg < part2.n_hosts * part2.si + part2.sg


class TestScalingModel:
    def test_measured_costs_and_efficiency(self, meshes):
        """The measured-cost model (bytes from compiled HLO, FLOPs from
        XLA cost analysis) on this suite's meshes: collectives are found,
        classified, and the BA-shaped program is compute-dominated."""
        meas = SM.measure_dd_costs(256, meshes[1], n_loops=8,
                                   ba_points=64, ba_map=128)
        assert meas["flops_per_device_per_gn"] > 0
        coll = meas["collectives_per_gn"]
        assert coll["ici"]["bytes"] > 0 and coll["ici"]["count"] >= 1
        assert coll["dcn"]["bytes"] > 0 and coll["dcn"]["count"] >= 1
        # the DCN payload must be the small global system, far below the
        # factor-sharded design's per-CG [N,6] psum stream
        assert coll["dcn"]["bytes"] < 1_000_000
        eff = SM.efficiency_from_measurement(meas)
        assert 0 < eff["predicted_efficiency"] <= 1

    def test_dd_beats_cg_on_comm_per_gn(self, meshes):
        """At 1024 poses the DD reduction per GN iteration is at least 3x
        smaller than the old CG design's modeled 3.3 MB/GN."""
        meas = SM.measure_dd_costs(1024, meshes[0], n_loops=32)
        total = (meas["collectives_per_gn"]["ici"]["bytes"]
                 + meas["collectives_per_gn"]["dcn"]["bytes"])
        assert total < 3_317_764 / 3
