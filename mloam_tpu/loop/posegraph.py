"""Loop-closure pose graph: keyframe ring + scan-context detection +
geometric verification + distributed GN optimization.

Counterpart of the reference's ``PoseGraph`` (``mloam_loop/src/
pose_graph.cpp``): per-candidate pipeline detectLoop (:281-328, with the
LOOP_DISTANCE_THRESHOLD gate :311-315) → geometric consistency via local-map
registration (:421-474, ``constructLocalMap`` :364-419) → PGO over all
keyframes with sequential + loop edges (:491-653), drift propagated to
trailing keyframes (:629-641).

The optimization itself is ``parallel.sharded_pgo`` — the same factor-
sharded GN that the multichip dry-run exercises; on a real mesh the edge
set shards across chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.config import LoopConfig, MloamConfig
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.loop import registration as REG
from mloam_tpu.loop import scancontext as SC
from mloam_tpu.parallel import sharded_pgo as PG


class LoopGraphState(NamedTuple):
    """Fixed-capacity keyframe graph (device arrays)."""

    poses: Pose           # [K] current (possibly PGO-corrected) poses
    odom_poses: Pose      # [K] poses as first received (for odom edges)
    corner: FeatCloud     # [K, Nc] keyframe corner clouds (base frame)
    surf: FeatCloud       # [K, Ns]
    sc_db: SC.ScanContextDB
    valid: jnp.ndarray    # [K]
    count: jnp.ndarray    # scalar int32 (== number of keyframes, no ring)
    # loop edges (padded)
    loop_i: jnp.ndarray   # [E]
    loop_j: jnp.ndarray   # [E]
    loop_zq: jnp.ndarray  # [E, 4]
    loop_zt: jnp.ndarray  # [E, 3]
    loop_valid: jnp.ndarray  # [E]
    n_loops: jnp.ndarray  # scalar int32


def init_state(capacity: int, cap_corner: int, cap_surf: int,
               cfg: LoopConfig, max_loops: int | None = None) -> LoopGraphState:
    if max_loops is None:
        max_loops = cfg.max_loop_edges
    return LoopGraphState(
        poses=Pose.identity((capacity,)),
        odom_poses=Pose.identity((capacity,)),
        corner=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (capacity,) + x.shape).copy(),
            FeatCloud.zeros(cap_corner),
        ),
        surf=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (capacity,) + x.shape).copy(),
            FeatCloud.zeros(cap_surf),
        ),
        sc_db=SC.empty_db(capacity, cfg),
        valid=jnp.zeros((capacity,), bool),
        count=jnp.asarray(0, jnp.int32),
        loop_i=jnp.zeros((max_loops,), jnp.int32),
        loop_j=jnp.zeros((max_loops,), jnp.int32),
        loop_zq=jnp.tile(jnp.array([1.0, 0, 0, 0]), (max_loops, 1)),
        loop_zt=jnp.zeros((max_loops, 3)),
        loop_valid=jnp.zeros((max_loops,), bool),
        n_loops=jnp.asarray(0, jnp.int32),
    )


def add_keyframe(state: LoopGraphState, pose: Pose, corner: FeatCloud,
                 surf: FeatCloud, cfg: LoopConfig) -> LoopGraphState:
    """Append a keyframe. At capacity new keyframes are DROPPED whole — no
    slot is overwritten (the reference keeps an unbounded keyframe list,
    pose_graph.cpp:92-328; with fixed device shapes the honest equivalent is
    a hard cap sized to the sequence, surfaced to the host via ``count``).

    Drift propagation (pose_graph.cpp:629-641): ``poses`` holds the
    PGO-corrected trajectory; an incoming pose is still in the odometry
    frame, so it is carried over with the CURRENT drift correction
    T_drift = poses[last] ∘ odom_poses[last]⁻¹ — otherwise every keyframe
    added after a correction re-enters in the uncorrected frame and the
    graph mixes frames until the next optimization."""
    k = state.valid.shape[0]
    ok = state.count < k
    i = jnp.minimum(state.count, k - 1)
    last = jnp.maximum(state.count - 1, 0)
    drift = se3.compose(
        Pose(state.poses.q[last], state.poses.t[last]),
        se3.inverse(Pose(state.odom_poses.q[last], state.odom_poses.t[last])),
    )
    has_prev = state.count > 0
    corr = se3.compose(drift, pose)
    pose_corr = Pose(jnp.where(has_prev, corr.q, pose.q),
                     jnp.where(has_prev, corr.t, pose.t))
    merged = jnp.concatenate([corner.xyz, surf.xyz])
    merged_mask = jnp.concatenate([corner.mask, surf.mask])
    desc = SC.make_descriptor(merged, merged_mask, cfg)
    new = state._replace(
        poses=Pose(state.poses.q.at[i].set(pose_corr.q),
                   state.poses.t.at[i].set(pose_corr.t)),
        odom_poses=Pose(state.odom_poses.q.at[i].set(pose.q),
                        state.odom_poses.t.at[i].set(pose.t)),
        corner=jax.tree.map(lambda a, n: a.at[i].set(n), state.corner, corner),
        surf=jax.tree.map(lambda a, n: a.at[i].set(n), state.surf, surf),
        sc_db=SC.add(state.sc_db, desc),
        valid=state.valid.at[i].set(True),
        count=state.count + 1,
    )
    return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, state)


def _local_map(state: LoopGraphState, center_idx, half: int, n_kf: int,
               cap: int, stack: FeatCloud, into_frame: Pose):
    """Stack +-half neighbor keyframes' clouds into ``into_frame`` coords
    (constructLocalMap, pose_graph.cpp:364-419). Fixed gather size."""
    offs = jnp.arange(-half, half + 1)
    ids = jnp.clip(center_idx + offs, 0, n_kf - 1)
    ok = state.valid[ids]
    inv = se3.inverse(into_frame)

    def per(idx, o):
        pose = Pose(state.poses.q[idx], state.poses.t[idx])
        rel = se3.compose(inv, pose)
        xyz = se3.transform_points(rel, stack.xyz[idx])
        return xyz, stack.mask[idx] & o

    xyz, mask = jax.vmap(per)(ids, ok)
    return xyz.reshape(-1, 3), mask.reshape(-1)


def try_close_loop(state: LoopGraphState, query_idx: jnp.ndarray,
                   lcfg: LoopConfig, cfg: MloamConfig,
                   use_global_reg: bool = False):
    """Detection + geometric verification for one keyframe (device program).

    ``use_global_reg``: additionally seed the fine registration from the
    priorless correlation registration (loop/global_registration) and take
    whichever seed verifies — covers loops whose odometry drift exceeds the
    pose-seeded convergence basin (the reference's FGR role).

    Returns (found, cand_idx, z_q, z_t) where Z = T_cand^-1 T_query.
    """
    k = state.valid.shape[0]
    desc = state.sc_db.desc[query_idx]
    cand = SC.detect(
        state.sc_db, desc, lcfg,
        exclude_after=state.count - lcfg.num_exclude_recent,
    )
    q_pose = Pose(state.poses.q[query_idx], state.poses.t[query_idx])
    c_pose = Pose(state.poses.q[cand.index], state.poses.t[cand.index])
    near = jnp.linalg.norm(q_pose.t - c_pose.t) < lcfg.loop_distance_threshold
    candidate_ok = cand.found & near & (cand.index != query_idx)

    # geometric verification: register the query keyframe against the
    # candidate's local map. The neighborhood is kept small: stacking many
    # neighbors at their *current* (drifted) pose estimates blurs the target
    # and biases the loop edge by the very drift the loop is meant to fix.
    half = min(lcfg.history_search_num, 3)
    tc_xyz, tc_mask = _local_map(
        state, cand.index, half, k, 0, state.corner, c_pose
    )
    ts_xyz, ts_mask = _local_map(
        state, cand.index, half, k, 0, state.surf, c_pose
    )
    q_corner = jax.tree.map(lambda a: a[query_idx], state.corner)
    q_surf = jax.tree.map(lambda a: a[query_idx], state.surf)

    T0 = REG.coarse_align(
        q_surf.xyz, q_surf.mask, ts_xyz, ts_mask, -cand.yaw
    )
    # seed translation from current pose estimates instead when available:
    T_odo = se3.compose(se3.inverse(c_pose), q_pose)
    T_init = Pose(T0.q, T_odo.t)
    reg = REG.fine_register(
        q_corner, q_surf, tc_xyz, tc_mask, ts_xyz, ts_mask, T_init, cfg
    )
    if use_global_reg:
        from mloam_tpu.loop import global_registration as GREG

        qm_xyz, qm_mask = _local_map(
            state, query_idx, half, k, 0, state.surf, q_pose
        )
        gres = GREG.register_correlation(qm_xyz, qm_mask, ts_xyz, ts_mask)
        reg2 = REG.fine_register(
            q_corner, q_surf, tc_xyz, tc_mask, ts_xyz, ts_mask, gres.pose, cfg
        )
        take2 = (reg2.ok & ~reg.ok) | (
            reg2.ok & reg.ok & (reg2.cost < reg.cost)
        )
        reg = jax.tree.map(
            lambda a, b: jnp.where(take2, a, b), reg2, reg
        )
    found = candidate_ok & reg.ok
    return found, cand.index, reg.pose.q, reg.pose.t, cand.dist, reg


def record_loop(state: LoopGraphState, found, i, j, zq, zt) -> LoopGraphState:
    """Append an accepted loop edge (i = candidate/earlier, j = query).
    At capacity new edges are dropped (never overwrite a recorded edge)."""
    e = state.loop_valid.shape[0]
    found = found & (state.n_loops < e)
    s = jnp.minimum(state.n_loops, e - 1)
    upd = lambda a, v: jnp.where(found, a.at[s].set(v), a)
    return state._replace(
        loop_i=upd(state.loop_i, i.astype(jnp.int32)),
        loop_j=upd(state.loop_j, j.astype(jnp.int32)),
        loop_zq=upd(state.loop_zq, zq),
        loop_zt=upd(state.loop_zt, zt),
        loop_valid=jnp.where(found, state.loop_valid.at[s].set(True),
                             state.loop_valid),
        n_loops=jnp.where(found, state.n_loops + 1, state.n_loops),
    )


def build_edges(state: LoopGraphState, seq_weight: float = 1.0,
                loop_weight: float = 5.0) -> PG.PoseGraphEdges:
    """Sequential odometry edges (from received poses) + loop edges."""
    k = state.valid.shape[0]
    seq_i = jnp.arange(k - 1, dtype=jnp.int32)
    seq_j = seq_i + 1
    rel = jax.vmap(
        lambda a, b, c, d: se3.relative(Pose(a, b), Pose(c, d))
    )(state.odom_poses.q[:-1], state.odom_poses.t[:-1],
      state.odom_poses.q[1:], state.odom_poses.t[1:])
    seq_ok = state.valid[:-1] & state.valid[1:]
    e = state.loop_valid.shape[0]
    return PG.PoseGraphEdges(
        i=jnp.concatenate([seq_i, state.loop_i]),
        j=jnp.concatenate([seq_j, state.loop_j]),
        z_q=jnp.concatenate([rel.q, state.loop_zq]),
        z_t=jnp.concatenate([rel.t, state.loop_zt]),
        weight=jnp.concatenate([
            seq_weight * seq_ok[:, None] * jnp.ones((k - 1, 6)),
            loop_weight * state.loop_valid[:, None] * jnp.ones((e, 6)),
        ]),
    )


def optimize(state: LoopGraphState, iters: int = 10,
             mesh=None, dof4: bool = False) -> LoopGraphState:
    """Run PGO over all keyframes; anchor the first."""
    edges = build_edges(state)
    new_poses = PG.optimize_pose_graph(
        state.poses, edges, iters=iters, anchor_idx=0, mesh=mesh, dof4=dof4
    )
    keep = state.valid[:, None]
    return state._replace(
        poses=Pose(
            jnp.where(keep, new_poses.q, state.poses.q),
            jnp.where(keep, new_poses.t, state.poses.t),
        )
    )
