"""Distributed pose-graph optimization: factor-sharded Gauss-Newton.

TPU-native counterpart of the reference's PGO thread (``mloam_loop/src/
pose_graph.cpp:491-653``: Ceres over keyframe (q, t) with sequential
RelativeRTError edges + loop edges) — re-designed as SPMD bundle adjustment:

  * Edges (sequential + loop constraints) are sharded across the device mesh
    on their leading axis.
  * Each device linearizes its edge shard (vmapped analytic-free jacfwd over
    the 12-dim per-edge tangent) and scatter-adds 6x6 blocks into a local
    dense (H, g).
  * One ``psum`` over ICI reduces the normal equations; the damped solve and
    pose update run replicated (identical on all chips).

This is the "distributed BA with psum reductions" north star of
BASELINE.json at its smallest useful granularity; keyframe/map-block
sharding for the mapping backend reuses the same pattern.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel.mesh import FACTOR_AXIS, data_axes


class PoseGraphEdges(NamedTuple):
    """Padded edge set. i -> j measurement Z = T_i^-1 T_j (expected)."""

    i: jnp.ndarray        # [E] int32 source pose index
    j: jnp.ndarray        # [E] int32 target pose index
    z_q: jnp.ndarray      # [E, 4] measured relative rotation
    z_t: jnp.ndarray      # [E, 3] measured relative translation
    weight: jnp.ndarray   # [E, 6] per-tangent-dim sqrt-weights (0 = invalid)


def edge_residual(Ti: Pose, Tj: Pose, z_q, z_t, weight) -> jnp.ndarray:
    """[6] weighted tangent error log(Z^-1 (T_i^-1 T_j))."""
    rel = se3.relative(Ti, Tj)
    err = se3.boxminus(rel, Pose(z_q, z_t))
    return weight * err


def _yaw_of(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw (rotation about world z) of a wxyz quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def boxplus_dof4(T: Pose, d: jnp.ndarray) -> Pose:
    """4-DoF retraction: world-frame translation + yaw about world z.
    Tangent layout [dt(3), _, _, dyaw]; the roll/pitch slots are ignored, so
    those orientations stay EXACTLY at their odometry estimates — the
    reference's 4-DoF parameterization (pose_graph.h:199-289), not a masked
    6-DoF update."""
    zero = jnp.zeros_like(d[5])
    qy = rot.so3_exp_quat(jnp.stack([zero, zero, d[5]], -1))
    return Pose(rot.quat_multiply(qy, T.q), T.t + d[:3])


def edge_residual_dof4(Ti: Pose, Tj: Pose, z_q, z_t, weight) -> jnp.ndarray:
    """[4] 4-DoF edge error: relative translation (in frame i) + relative
    yaw, mirroring the reference's FourDOFError (pose_graph.h:199-242).
    Roll/pitch error is NOT penalized — the estimator cannot correct it, so
    penalizing it would bias the observable directions (the flaw of the
    earlier update-masking variant)."""
    rel = se3.relative(Ti, Tj)
    r_t = weight[:3] * (rel.t - z_t)
    dyaw = _yaw_of(rel.q) - _yaw_of(z_q)
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))  # wrap to [-pi, pi]
    return jnp.concatenate([r_t, (weight[5] * dyaw)[None]])


def _linearize_edges(poses: Pose, edges: PoseGraphEdges, anchor_idx: int,
                     anchor_w: float, dof4: bool = False):
    """Dense (H, g, cost) over the full N*6 tangent from one edge shard."""
    n = poses.q.shape[0]
    dim = n * 6
    res_fn = edge_residual_dof4 if dof4 else edge_residual
    retract = boxplus_dof4 if dof4 else se3.boxplus

    def per_edge(ei, ej, zq, zt, w):
        Ti = Pose(poses.q[ei], poses.t[ei])
        Tj = Pose(poses.q[ej], poses.t[ej])

        def res(xi):
            return res_fn(
                retract(Ti, xi[:6]), retract(Tj, xi[6:]), zq, zt, w
            )

        r = res(jnp.zeros(12))
        J = jax.jacfwd(res)(jnp.zeros(12))  # [R, 12]
        return r, J

    r, J = jax.vmap(per_edge)(edges.i, edges.j, edges.z_q, edges.z_t, edges.weight)
    Ji = J[:, :, :6]
    Jj = J[:, :, 6:]

    # block scatter-add into dense H
    H = jnp.zeros((dim, dim))
    g = jnp.zeros((dim,))

    def blk(ii):  # [E] -> [E, 6] flat tangent indices
        base = ii[:, None] * 6 + jnp.arange(6)[None, :]
        return base

    bi, bj = blk(edges.i), blk(edges.j)
    JiTJi = jnp.einsum("eai,eaj->eij", Ji, Ji)
    JjTJj = jnp.einsum("eai,eaj->eij", Jj, Jj)
    JiTJj = jnp.einsum("eai,eaj->eij", Ji, Jj)
    H = H.at[bi[:, :, None], bi[:, None, :]].add(JiTJi)
    H = H.at[bj[:, :, None], bj[:, None, :]].add(JjTJj)
    H = H.at[bi[:, :, None], bj[:, None, :]].add(JiTJj)
    H = H.at[bj[:, :, None], bi[:, None, :]].add(
        jnp.swapaxes(JiTJj, -1, -2)
    )
    g = g.at[bi].add(jnp.einsum("eai,ea->ei", Ji, r))
    g = g.at[bj].add(jnp.einsum("eai,ea->ei", Jj, r))
    cost = 0.5 * jnp.sum(r * r)
    return H, g, cost


def pgo_step(poses: Pose, edges: PoseGraphEdges, anchor_idx: int = 0,
             anchor_w: float = 1e3, lm_lambda: float = 1e-3,
             axis_name: str | tuple[str, ...] | None = None,
             dof4: bool = False):
    """One damped GN step over all poses. If ``axis_name`` is set (one mesh
    axis or a tuple — e.g. ('host', 'factor') for multi-host), (H, g,
    cost) are psum-reduced across those axes (edges sharded per device).

    ``dof4``: true 4-DoF mode — (x, y, z, yaw) variables with 4-row edge
    residuals and a yaw-only retraction; roll/pitch stay at their odometry
    estimates and are never penalized (the reference's 4-DoF factor
    variants, pose_graph.h:199-289).
    """
    n = poses.q.shape[0]
    dim = n * 6
    H, g, cost = _linearize_edges(poses, edges, anchor_idx, anchor_w,
                                  dof4=dof4)
    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        g = jax.lax.psum(g, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    # anchor: strong absolute prior on anchor_idx (first looped pose fixed,
    # reference pose_graph.cpp:555-569)
    a0 = anchor_idx * 6
    H = H.at[a0 + jnp.arange(6), a0 + jnp.arange(6)].add(anchor_w)
    damp = lm_lambda * (jnp.diagonal(H) + 1e-3)
    Hd = H + jnp.diag(damp)
    L = jnp.linalg.cholesky(Hd + 1e-8 * jnp.eye(dim))
    dx = -jax.scipy.linalg.cho_solve((L, True), g)
    retract = boxplus_dof4 if dof4 else se3.boxplus

    def upd(q, t, i):
        return retract(Pose(q, t), jax.lax.dynamic_slice(dx, (i * 6,), (6,)))

    new = jax.vmap(lambda q, t, i: upd(q, t, i))(
        poses.q, poses.t, jnp.arange(n)
    )
    return Pose(new.q, new.t), cost


def _linearize_sparse(poses: Pose, edges: PoseGraphEdges,
                      dof4: bool = False):
    """Per-edge residuals + Jacobians, kept in block form (no dense H)."""
    res_fn = edge_residual_dof4 if dof4 else edge_residual
    retract = boxplus_dof4 if dof4 else se3.boxplus

    def per_edge(ei, ej, zq, zt, w):
        Ti = Pose(poses.q[ei], poses.t[ei])
        Tj = Pose(poses.q[ej], poses.t[ej])

        def res(xi):
            return res_fn(
                retract(Ti, xi[:6]), retract(Tj, xi[6:]), zq, zt, w
            )

        r = res(jnp.zeros(12))
        J = jax.jacfwd(res)(jnp.zeros(12))  # [R, 12]
        return r, J

    return jax.vmap(per_edge)(edges.i, edges.j, edges.z_q, edges.z_t,
                              edges.weight)


def pgo_step_cg(poses: Pose, edges: PoseGraphEdges, anchor_idx: int = 0,
                anchor_w: float = 1e3, lm_lambda: float = 1e-3,
                cg_iters: int = 32,
                axis_name: str | tuple[str, ...] | None = None,
                dof4: bool = False):
    """One damped GN step solved matrix-free: block-sparse normal equations
    via preconditioned conjugate gradients.

    The dense path materializes H [N·6, N·6] — 37 MB and an O((N·6)³)
    Cholesky at the 512-keyframe cap, growing quadratically. Here H only
    ever appears as the operator
        H v = Σ_e Jᵉᵀ (Jᵉ v|_e) + λ diag + anchor,
    i.e. per-edge gather → [E,12] small matvec → scatter-add, with a
    block-Jacobi (6×6 per pose) preconditioner. Scales to 10k+ keyframes
    and shards over edges exactly like the dense path (partial Hv / g /
    diag are psum-reduced; v and the CG scalars stay replicated).
    """
    n = poses.q.shape[0]
    r, J = _linearize_sparse(poses, edges, dof4=dof4)
    Ji, Jj = J[:, :, :6], J[:, :, 6:]

    def reduce_(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    # gradient g = Jᵀ r and 6x6 diagonal blocks (for damping + precond)
    g = jnp.zeros((n, 6))
    g = g.at[edges.i].add(jnp.einsum("eai,ea->ei", Ji, r))
    g = g.at[edges.j].add(jnp.einsum("eai,ea->ei", Jj, r))
    diag = jnp.zeros((n, 6, 6))
    diag = diag.at[edges.i].add(jnp.einsum("eai,eaj->eij", Ji, Ji))
    diag = diag.at[edges.j].add(jnp.einsum("eai,eaj->eij", Jj, Jj))
    g = reduce_(g)
    diag = reduce_(diag)
    cost = reduce_(0.5 * jnp.sum(r * r))

    eye6 = jnp.eye(6)
    anchor = anchor_w * jax.nn.one_hot(anchor_idx, n)[:, None, None] * eye6
    d_damp = (
        diag
        + anchor
        + lm_lambda * (diag * eye6 + 1e-3 * eye6)  # Marquardt diag scaling
    )
    # block-Jacobi preconditioner: full damped 6x6 diagonal blocks
    # (replicated; diag already psum-reduced)
    M_inv = jnp.linalg.inv(d_damp + 1e-6 * eye6[None])

    def hv(v):  # [N, 6] -> [N, 6]
        vi = v[edges.i]
        vj = v[edges.j]
        jv = jnp.einsum("eai,ei->ea", Ji, vi) + jnp.einsum(
            "eai,ei->ea", Jj, vj
        )
        out = jnp.zeros((n, 6))
        out = out.at[edges.i].add(jnp.einsum("eai,ea->ei", Ji, jv))
        out = out.at[edges.j].add(jnp.einsum("eai,ea->ei", Jj, jv))
        out = reduce_(out)
        # damping + anchor act on the replicated full vector (added AFTER
        # the psum so they are counted once, not once per shard)
        out = out + jnp.einsum("nij,nj->ni", d_damp - diag, v)
        return out

    b = -g

    def cg_body(_, carry):
        x, res_, p, rz = carry
        hp = hv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-20)
        x = x + alpha * p
        res_ = res_ - alpha * hp
        z = jnp.einsum("nij,nj->ni", M_inv, res_)
        rz_new = jnp.sum(res_ * z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        return x, res_, z + beta * p, rz_new

    x0 = jnp.zeros((n, 6))
    z0 = jnp.einsum("nij,nj->ni", M_inv, b)
    init = (x0, b, z0, jnp.sum(b * z0))
    dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    retract = boxplus_dof4 if dof4 else se3.boxplus

    new = jax.vmap(lambda q, t, d: retract(Pose(q, t), d))(
        poses.q, poses.t, dx
    )
    return Pose(new.q, new.t), cost


def optimize_pose_graph(
    poses: Pose,
    edges: PoseGraphEdges,
    iters: int = 10,
    anchor_idx: int = 0,
    mesh: Mesh | None = None,
    dof4: bool = False,
    solver: str = "auto",
    cg_iters: int | None = None,
):
    """Full PGO: ``iters`` damped GN steps. With a mesh, edges are sharded
    over ALL mesh axes and the normal-equation reduction is a psum across
    them — on a 1-D mesh that's an ICI reduce; on a 2-D
    (host, factor) mesh (mesh.make_multihost_mesh) XLA reduces within each
    host over ICI first, then once across hosts over DCN.

    ``solver``: 'dense' (materialized H + Cholesky), 'cg' (matrix-free
    block-sparse PCG, pgo_step_cg), or 'auto' (cg beyond 128 poses —
    the dense Hessian grows as (N·6)²).

    ``cg_iters``: None (default) auto-sizes to the chain-propagation bound
    n + n/4 — information moves ~1 pose per PCG iteration along a
    sequential-only graph with a block-Jacobi preconditioner. Graphs rich
    in skip/loop edges propagate k poses per iteration across a skip-k
    edge; pass an explicit count to exploit that."""
    n = poses.q.shape[0]
    if solver == "auto":
        # the MXU chews through a dense (N·6)³ Cholesky up to ~512 poses
        # (≤0.5 ms); beyond that the 37+ MB Hessian and cubic solve lose to
        # matrix-free PCG, whose iteration count grows only linearly
        solver = "cg" if n > 512 else "dense"
    cg_eff = (n + n // 4) if cg_iters is None else cg_iters

    def one_step(pp, e, axis_name=None):
        if solver == "cg":
            return pgo_step_cg(pp, e, anchor_idx=anchor_idx,
                               cg_iters=cg_eff, axis_name=axis_name,
                               dof4=dof4)
        return pgo_step(pp, e, anchor_idx=anchor_idx, axis_name=axis_name,
                        dof4=dof4)

    if mesh is None:
        def body(_, p):
            p2, _ = one_step(p, edges)
            return p2

        return jax.lax.fori_loop(0, iters, body, poses)

    axes = data_axes(mesh)
    n_dev = mesh.devices.size
    e = edges.i.shape[0]
    pad = (-e) % n_dev
    # pad with *identity-measurement* zero-weight edges — zero-padding the
    # quaternion would feed log() a zero rotation and NaN-poison the psum
    edges_p = PoseGraphEdges(
        i=jnp.pad(edges.i, (0, pad)),
        j=jnp.pad(edges.j, (0, pad)),
        z_q=jnp.concatenate(
            [edges.z_q, jnp.tile(jnp.array([1.0, 0, 0, 0]), (pad, 1))]
        ),
        z_t=jnp.pad(edges.z_t, ((0, pad), (0, 0))),
        weight=jnp.pad(edges.weight, ((0, pad), (0, 0))),
    )

    shard = P(axes)  # leading edge axis over every mesh axis
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), PoseGraphEdges(shard, shard, shard, shard, shard)),
        out_specs=P(),
    )
    def run(p, e_shard):
        def body(_, pp):
            p2, _ = one_step(pp, e_shard, axis_name=axes)
            return p2

        return jax.lax.fori_loop(0, iters, body, p)

    return run(poses, edges_p)
