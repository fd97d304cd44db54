"""Sliding-window odometry backend.

Counterpart of the reference ``Estimator`` (``estimator/src/estimator/
estimator.{h,cpp}``): the INITIAL → NON_LINEAR state machine (:499-530),
window feature stacks (:485-496), local-map construction by re-projecting
window sweeps into the pivot frame (``buildLocalMap`` :1159-1271), the
windowed Gauss-Newton over (pivot..newest) poses with degeneracy remapping
(``optimizeMap`` :593-1064, ``evalDegenracy`` :1598-1680), and VINS-style
marginalization of the pivot pose (:871-1063).

TPU design decisions:
  * The window is a fixed-shape pytree (stacked poses + stacked per-frame
    feature tensors); sliding is a roll, pushing a slice write — the whole
    per-sweep step jits once.
  * The local map is rebuilt per step as a voxel reduction over the stacked
    window clouds — no persistent kd-tree, no incremental state.
  * The solve optimizes poses pivot..newest (opt_window + 1 blocks, tangent
    dim (O+1)*6 ≤ 42): normal equations assembled densely from one jacfwd,
    solved directly (no Schur needed at this size).
  * Marginalizing the pivot = dense Schur on the final (H, g); the resulting
    prior (with its linearization poses) rides in the window state and is
    replayed with first-order correction, exactly like MarginalizationFactor.
  * Degeneracy: per-block eigh + solution-remap projection of the update.

Multi-LiDAR: feature stacks carry a lidar axis; all lidars' features are
projected through their extrinsics into the pivot frame (the reference's
NUM_OF_LASER loops, estimator.cpp:789-848).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.config import MloamConfig
from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.ops import select, voxel
from mloam_tpu.solver import degeneracy, factors, robust
from mloam_tpu.solver.gauss_newton import _linearize as GN_linearize
from mloam_tpu.solver.gauss_newton import gauss_newton
from mloam_tpu.solver.marginalization import QuadPrior, schur_marginalize_quad


class WindowState(NamedTuple):
    """Fixed-shape sliding window. S = window_size + 1 slots, L lidars.

    The marginalization prior spans [opt poses | non-ref extrinsics] in
    calibration mode and [opt poses] otherwise; transitions between modes
    re-initialize it (the reference likewise discards the prior when
    calibration converges, estimator.cpp:1709-1732).
    """

    poses: Pose            # [S] world <- base_i
    corner: FeatCloud      # [S, L, Nc] per-slot per-lidar corner features
    surf: FeatCloud       # [S, L, Ns] surf features
    ext: Pose              # [L] base <- lidar
    count: jnp.ndarray     # scalar int32: frames currently in window
    prior: QuadPrior
    prior_poses: Pose      # [S] linearization poses for the prior
    prior_ext: Pose        # [L] linearization extrinsics for the prior
    # degeneracy persistence state (round 5): the weak direction seen by
    # the last solve and the length of the current consistent
    # sub-threshold run — the remap engages only when the run reaches
    # cfg.odometry.eig_persist_k (sustained directional starvation =
    # corridor; transient dips on turning courses never engage)
    deg_dir: jnp.ndarray   # [6]
    deg_count: jnp.ndarray  # scalar int32


def _stack_feat(fs: list[FeatCloud]) -> FeatCloud:
    return FeatCloud(*[jnp.stack(x) for x in zip(*fs)])


def init_window(cfg: MloamConfig, cap_corner: int, cap_surf: int) -> WindowState:
    s = cfg.odometry.window_size + 1
    L = cfg.rig.n_lidars
    empty_c = FeatCloud.zeros(cap_corner)
    empty_s = FeatCloud.zeros(cap_surf)
    corner = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (s, L) + x.shape).copy(), empty_c
    )
    surf = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (s, L) + x.shape).copy(), empty_s
    )
    opt_dim = prior_dim(cfg, calibrate_ext=False)
    return WindowState(
        poses=Pose.identity((s,)),
        corner=corner,
        surf=surf,
        ext=Pose.identity((L,)),
        count=jnp.asarray(0, jnp.int32),
        prior=QuadPrior.empty(opt_dim),
        prior_poses=Pose.identity((s,)),
        prior_ext=Pose.identity((L,)),
        deg_dir=jnp.zeros((6,)),
        deg_count=jnp.asarray(0, jnp.int32),
    )


def prior_dim(cfg: MloamConfig, calibrate_ext: bool) -> int:
    d = (cfg.odometry.opt_window_size + 1) * 6
    if calibrate_ext:
        d += (cfg.rig.n_lidars - 1) * 6
    return d


def reset_prior(state: WindowState, cfg: MloamConfig,
                calibrate_ext: bool) -> WindowState:
    """Re-initialize the prior to the shape of the given mode (used at
    ESTIMATE_EXTRINSIC mode transitions).

    The linearization points are *copies* of the current poses/extrinsics:
    aliasing them to the live buffers makes the window pytree carry the same
    device buffer in two leaves, and the next donated fused-step dispatch
    (jit donate_argnums=(0,)) fails with "attempt to donate the same buffer
    twice". This function runs eagerly at mode transitions, so the copies
    cost two tiny h2d-free device ops, once per lifecycle change."""
    return state._replace(
        prior=QuadPrior.empty(prior_dim(cfg, calibrate_ext)),
        prior_poses=jax.tree.map(jnp.copy, state.poses),
        prior_ext=jax.tree.map(jnp.copy, state.ext),
    )


def set_extrinsics(state: WindowState, ext: Pose) -> WindowState:
    return state._replace(ext=ext)


def push_frame(
    state: WindowState,
    pose: Pose,
    corner: FeatCloud,  # [L, Nc]
    surf: FeatCloud,    # [L, Ns]
    cfg: MloamConfig,
) -> WindowState:
    """Slide the window by one and write the new frame into the last slot."""
    s = cfg.odometry.window_size + 1

    def roll_set(stack, new):
        rolled = jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), stack)
        return jax.tree.map(lambda x, n: x.at[s - 1].set(n), rolled, new)

    return state._replace(
        poses=roll_set(state.poses, pose),
        corner=roll_set(state.corner, corner),
        surf=roll_set(state.surf, surf),
        prior_poses=roll_set(state.prior_poses, pose),
        count=jnp.minimum(state.count + 1, s),
    )


def build_local_map(state: WindowState, cfg: MloamConfig,
                    map_lidars: tuple[int, ...] | None = None):
    """Project window sweeps' features into the pivot frame and voxel-filter
    (buildLocalMap, estimator.cpp:1159-1271).

    ``map_lidars`` restricts which lidars' clouds FORM the map. During
    online calibration it must be the reference lidar only (the reference's
    buildCalibMap, estimator.cpp:1067-1156, projects lidar-0 clouds): if a
    non-reference lidar's own points enter the map, its calib factors match
    them against themselves — self-consistent at ANY extrinsic, so the
    extrinsic translation never refines (observed: hand-eye's noisy 0.3 m
    seed stayed frozen through mode 1). None = all lidars (pure odometry).
    """
    s = cfg.odometry.window_size + 1
    pivot = s - 1 - cfg.odometry.opt_window_size
    piv_pose = Pose(state.poses.q[pivot], state.poses.t[pivot])
    L = cfg.rig.n_lidars
    if map_lidars is None:
        lidar_ok = jnp.ones((L,), bool)
    else:
        lidar_ok = jnp.zeros((L,), bool).at[jnp.array(map_lidars)].set(True)

    def project(stack: FeatCloud):
        def per_frame(q, t, xyz, mask, fresh):
            rel = se3.compose(se3.inverse(piv_pose), Pose(q, t))

            def per_lidar(eq, et, x, m, ok):
                T = se3.compose(rel, Pose(eq, et))
                return se3.transform_points(T, x), m & ok

            return jax.vmap(per_lidar)(
                state.ext.q, state.ext.t, xyz, mask & fresh[:, None],
                lidar_ok,
            )

        s_idx = jnp.arange(s)
        # only slots holding real frames; the NEWEST frame is excluded from
        # its own map (reference buildLocalMap: `if (i == WINDOW_SIZE)
        # continue`, estimator.cpp:1182) so it is never pinned to its
        # prediction by self-matching.
        filled = (s_idx >= (s - state.count)) & (s_idx < s - 1)
        fresh = jnp.broadcast_to(filled[:, None], stack.mask.shape[:2])
        xyz, mask = jax.vmap(per_frame)(
            state.poses.q, state.poses.t, stack.xyz, stack.mask, fresh
        )
        return xyz.reshape(-1, 3), mask.reshape(-1)

    c_xyz, c_mask = project(state.corner)
    s_xyz, s_mask = project(state.surf)
    # sort-free compaction first: the stacks are mostly padding (per-frame
    # caps are worst-case), and the voxel argsort cost scales with row
    # count, not valid count. Exact whenever the valid points fit the bound.
    L = cfg.rig.n_lidars
    pc, ps = cfg.odometry.localmap_precap_corner, cfg.odometry.localmap_precap_surf
    if pc is not None and pc * L < c_xyz.shape[0]:
        c_xyz, c_mask = select.compact_stride(c_xyz, c_mask, pc * L)
    if ps is not None and ps * L < s_xyz.shape[0]:
        s_xyz, s_mask = select.compact_stride(s_xyz, s_mask, ps * L)
    # fused packed single-key sort over both feature classes (the window
    # local map spans well under the 1024-cell grid at these leaves)
    c_ds, c_dm, s_ds, s_dm = voxel.voxel_downsample_two_class(
        c_xyz, c_mask, cfg.odometry.corner_map_leaf,
        s_xyz, s_mask, cfg.odometry.surf_map_leaf,
    )
    return c_ds, c_dm, s_ds, s_dm


class WindowSolveResult(NamedTuple):
    H: jnp.ndarray
    g: jnp.ndarray
    cost: jnp.ndarray
    n_corner: jnp.ndarray
    n_surf: jnp.ndarray
    eig_min: jnp.ndarray  # [O+1] per-opt-pose smallest Hessian eigenvalue
    # contribution of the per-solve gauge anchor (+ calib extrinsic priors)
    # to (H, g) at the final linearization point. These rows are re-added
    # fresh every solve, so they must be EXCLUDED from the marginalized
    # Hessian — the reference marginalizes only factor blocks in the drop
    # set (marginalization_factor.cpp:105-144), and neither its gauge (the
    # prior chain itself) nor its extrinsic PriorFactor touches para_pose[0].
    # Leaving them in re-bakes absolute-pose information into the prior
    # every frame (double counting that grows without bound).
    H_anchor: jnp.ndarray
    g_anchor: jnp.ndarray
    # [n_blocks, 6] full ascending per-block measurement eigenvalues (the
    # reference's calib_eig.txt spectra) — threshold calibration needs the
    # whole spectrum, not just the minimum: the projector freezes EVERY
    # direction below eig_threshold, so the threshold must sit between the
    # degenerate direction and the next (observable) eigenvalue
    eig_blocks: jnp.ndarray | None = None
    # the marginalization prior's (H, g) contribution at the final
    # linearization point — needed to split measurement rows from prior
    # rows for degeneracy-consistent marginalization (see
    # marginalize_pivot)
    H_prior: jnp.ndarray | None = None
    g_prior: jnp.ndarray | None = None
    # [n_blocks] directions ACTUALLY frozen per block (trace deficit of
    # the applied projector) — the true engagement signal; counting raw
    # sub-threshold eigenvalues overstates it (round-4 advisor)
    frozen: jnp.ndarray | None = None
    # [6] the shared-mean block spectrum the gate actually sees
    eig_shared: jnp.ndarray | None = None
    # [6] its weakest eigvector (candidate frozen direction)
    weak_dir: jnp.ndarray | None = None
    # [n, 6, 6] the projector the solve APPLIED (identity when the
    # persistence gate kept the remap disengaged) — marginalize_pivot
    # reuses it directly so the prior projection is exactly consistent
    # with the solve's freezing decision
    remap_P: jnp.ndarray | None = None
    # effective support count of curvature along the weak direction
    support_neff: jnp.ndarray | None = None


def optimize_window(state: WindowState, cfg: MloamConfig,
                    calibrate_ext: bool = False,
                    lidars: tuple[int, ...] | None = None,
                    analytic: bool = True):
    """Backend solve over poses pivot..newest (+ non-ref extrinsics in
    calibration mode) with prior + degeneracy remap.

    ``calibrate_ext`` (static): ESTIMATE_EXTRINSIC==1 — extrinsic blocks of
    lidars 1..L-1 join the tangent, with a weak prior toward their current
    estimates (reference PriorFactor + online-calib factors,
    estimator.cpp:670-788). ``lidars`` restricts which lidars contribute
    correspondences (calib-init phase matches the reference lidar only).

    ``analytic`` (static): assemble the normal equations from closed-form
    point Jacobians chained through a tiny pose-graph jacfwd (the TPU
    counterpart of the reference's hand-written analytic Ceres Jacobians)
    instead of one jacfwd over the full tangent — the point-level work drops
    from D(=dim) forward passes to ~2 residual evaluations. False keeps the
    autodiff path (property-tested equal).

    Returns (state with updated poses/ext, WindowSolveResult).
    """
    oc = cfg.odometry
    s = oc.window_size + 1
    O = oc.opt_window_size
    pivot = s - 1 - O
    L = cfg.rig.n_lidars
    n_opt = O + 1
    n_ext = (L - 1) if calibrate_ext else 0
    dim = (n_opt + n_ext) * 6
    if lidars is None:
        lidars = tuple(range(L))

    # calib mode: the map is formed by the reference lidar only
    # (buildCalibMap semantics — see build_local_map docstring)
    c_map, c_mmask, s_map, s_mmask = build_local_map(
        state, cfg, map_lidars=(0,) if calibrate_ext else None
    )
    pivot_init = Pose(state.poses.q[pivot], state.poses.t[pivot])

    # state under optimization: (poses [S], ext [L])
    def opt_pose(x, i: int) -> Pose:
        poses, _ = x
        return Pose(poses.q[pivot + i], poses.t[pivot + i])

    def ext_of(x, l: int) -> Pose:
        _, ext = x
        return Pose(ext.q[l], ext.t[l])

    q_ids = [(f, l) for f in range(1, n_opt) for l in lidars]

    def gather(stack: FeatCloud) -> list[FeatCloud]:
        return [
            jax.tree.map(lambda a: a[pivot + f, l], stack) for (f, l) in q_ids
        ]

    q_corner = gather(state.corner)
    q_surf = gather(state.surf)

    def chain(x, qi: int) -> Pose:
        """pivot-base (map) frame <- lidar-l frame of opt frame f.

        The pivot pose is an *optimized* parameter — every factor couples
        (pivot, frame, extrinsic) exactly like LidarPureOdomPlaneNormFactor
        (lidar_pure_odom_factor.hpp:27-195), so marginalizing the pivot
        transfers relative-pose information to the retained frames.
        """
        f, l = q_ids[qi]
        Wp = opt_pose(x, 0)
        Wf = opt_pose(x, f)
        E = ext_of(x, l)
        return se3.compose(se3.compose(se3.inverse(Wp), Wf), E)

    def retract(x, dx: jnp.ndarray):
        poses, ext = x
        q, t = poses.q, poses.t
        for i in range(n_opt):
            p = se3.boxplus(Pose(q[pivot + i], t[pivot + i]),
                            dx[i * 6:(i + 1) * 6])
            q = q.at[pivot + i].set(p.q)
            t = t.at[pivot + i].set(p.t)
        eq, et = ext.q, ext.t
        for k in range(n_ext):
            l = k + 1  # lidar 0 is the reference, its extrinsic stays fixed
            base = (n_opt + k) * 6
            p = se3.boxplus(Pose(eq[l], et[l]), dx[base:base + 6])
            eq = eq.at[l].set(p.q)
            et = et.at[l].set(p.t)
        return Pose(q, t), Pose(eq, et)

    def prior_delta(x):
        ds = [
            se3.boxminus(
                opt_pose(x, i),
                Pose(state.prior_poses.q[pivot + i],
                     state.prior_poses.t[pivot + i]),
            )
            for i in range(n_opt)
        ]
        for k in range(n_ext):
            l = k + 1
            ds.append(
                se3.boxminus(
                    ext_of(x, l),
                    Pose(state.prior_ext.q[l], state.prior_ext.t[l]),
                )
            )
        return jnp.concatenate(ds)

    x = (state.poses, state.ext)
    result = None
    edge_corrs = plane_corrs = None
    # persistence-gate state (updated on the first outer iteration's
    # linearization; carried through WindowState)
    deg_P = None
    deg_dir = state.deg_dir
    deg_count = state.deg_count
    support_neff = None

    nq = len(q_ids)
    # all query frames share the same target map, so the per-frame
    # correspondence searches batch into ONE kNN dispatch per feature class
    # (queries concatenated along the point axis, per-point poses applied
    # by repeat in the residual) — 6 matcher calls -> 2
    qc_all = jax.tree.map(lambda *a: jnp.concatenate(a), *q_corner)
    qs_all = jax.tree.map(lambda *a: jnp.concatenate(a), *q_surf)
    n_c = q_corner[0].xyz.shape[0]
    n_s = q_surf[0].xyz.shape[0]

    def point_poses(xx, nc=None, ns=None):
        """Per-point chain poses for the concatenated query sets."""
        nc = n_c if nc is None else nc
        ns = n_s if ns is None else ns
        Ts = [chain(xx, qi) for qi in range(nq)]
        qs = jnp.stack([T.q for T in Ts])
        ts = jnp.stack([T.t for T in Ts])
        return (
            (jnp.repeat(qs, nc, 0), jnp.repeat(ts, nc, 0)),
            (jnp.repeat(qs, ns, 0), jnp.repeat(ts, ns, 0)),
        )

    for _ in range(oc.outer_iters):
        (cq, ct), (sq, st_) = point_poses(x)
        proj_c = rot.quat_rotate(cq, qc_all.xyz) + ct
        proj_s = rot.quat_rotate(sq, qs_all.xyz) + st_
        edge_corrs = factors.match_map_edge(
            qc_all, proj_c, c_map, c_mmask, oc.dist_sq_threshold
        )
        plane_corrs = factors.match_map_plane(
            qs_all, proj_s, s_map, s_mmask, oc.dist_sq_threshold
        )
        if oc.gf_ratio < 1.0 and oc.gf_method == "gd":
            # odometry-side good-feature selection (the reference's
            # goodFeatureMatching inside optimizeMap's pure-odometry branch,
            # estimator.cpp:789-848 + 1347-1517): score every matched
            # correspondence by its logdet gain against the running 6x6
            # information matrix (per-point Jacobians wrt the chain-pose
            # tangent — the counterpart of evaluateFeatJacobian) and keep
            # the top gf_ratio fraction; the rest get zero weight.
            # On-chip cost note: the round-based top_k selection costs more
            # than the GN rows it removes (measured dual rig: 26 ms vs
            # 11 ms plain) — 'gd' buys accuracy in weak geometry, not
            # speed; the speed path is gf_method='stride' (+ gf_compact),
            # whose even decimation is free (the reference's rnd method,
            # lidar_mapper.h:229-573, same purpose).
            from mloam_tpu.solver import feature_selection as FS

            Je = factors.edge_point_jacobian(cq, edge_corrs)
            Jp = factors.plane_point_jacobian(sq, plane_corrs)
            keep_p, keep_e = FS.logdet_gain_select(
                Jp, plane_corrs.w, Je, edge_corrs.w, oc.gf_ratio,
                max_ratio=oc.gf_ratio,
            )
            edge_corrs = edge_corrs._replace(
                w=edge_corrs.w * keep_e.astype(edge_corrs.w.dtype)
            )
            plane_corrs = plane_corrs._replace(
                w=plane_corrs.w * keep_p.astype(plane_corrs.w.dtype)
            )

        if oc.gf_ratio < 1.0 and oc.gf_compact:
            # the payoff path: selection COMPACTS the correspondence sets
            # into ~ratio-sized buffers so every GN iteration's residual/
            # Gram work shrinks proportionally (the reference's gf exists
            # to buy solver time, estimator.cpp:1347-1517 — zero-weighting
            # rows inside fixed shapes can never do that). 1.25x slack per
            # frame-group absorbs uneven selection across groups; beyond it
            # the gather strides evenly over the kept rows.
            cap_c = min(n_c, max(int(np.ceil(n_c * oc.gf_ratio * 1.25)), 32))
            cap_s = min(n_s, max(int(np.ceil(n_s * oc.gf_ratio * 1.25)), 32))

            def compact_group(tree, n_per, cap):
                w = tree.w.reshape(nq, n_per)
                idx, om = jax.vmap(
                    lambda m: select.compact_gather_indices(m, cap))(w > 0)

                def g(leaf):
                    grp = leaf.reshape((nq, n_per) + leaf.shape[1:])
                    out = jax.vmap(lambda gl, gi: gl[gi])(grp, idx)
                    return out.reshape((nq * cap,) + leaf.shape[1:])

                new = jax.tree.map(g, tree)
                return new._replace(
                    w=(new.w.reshape(nq, cap) * om).reshape(nq * cap))

            edge_corrs = compact_group(edge_corrs, n_c, cap_c)
            plane_corrs = compact_group(plane_corrs, n_s, cap_s)
            nc_cur, ns_cur = cap_c, cap_s
        else:
            nc_cur, ns_cur = n_c, n_s

        def small_residual(xx):
            """The few non-point rows: gauge anchor + calib extrinsic priors.

            Gauge anchor: the factor graph is purely relative (6-dim
            nullspace); a weak absolute prior on the pivot at its pre-solve
            estimate pins the gauge without biasing relative geometry. The
            calib rows are the reference's weak PriorFactor keeping
            extrinsics near their running estimates (prior_factor.hpp:27).
            (The marginalization prior enters the normal equations as a
            quadratic form via gauss_newton's quad_prior — no rows here.)
            """
            rs = [oc.gauge_weight * se3.boxminus(opt_pose(xx, 0), pivot_init)]
            if calibrate_ext:
                for k in range(n_ext):
                    l = k + 1
                    rs.append(factors.prior_residual(
                        ext_of(xx, l),
                        Pose(state.prior_ext.q[l], state.prior_ext.t[l]),
                        pos_w=1.0, rot_w=1.0,
                    ))
            return jnp.concatenate(rs)

        def residual_fn(xx, mu=1.0):
            ec, pc = edge_corrs, plane_corrs
            (cq, ct), (sq, st_) = point_poses(xx, nc_cur, ns_cur)
            re = factors.edge_residual(rot.quat_rotate(cq, ec.p) + ct, ec)
            we = factors.robust_weights(
                jnp.sum(re * re, -1), ec.w, oc.loss_mode, oc.huber_delta,
                gm_c=oc.gm_c, gnc_mu=mu,
            )
            rp = factors.plane_residual(rot.quat_rotate(sq, pc.p) + st_, pc)
            wp = factors.robust_weights(rp * rp, pc.w, oc.loss_mode,
                                        oc.huber_delta, gm_c=oc.gm_c,
                                        gnc_mu=mu)
            rs = [re.reshape(-1), rp, small_residual(xx)]
            ws = [jnp.repeat(we, 3), wp, jnp.ones((rs[-1].shape[0],))]
            return jnp.concatenate(rs), jnp.concatenate(ws)

        def linearize_fn(xx, mu=1.0):
            """Closed-form normal equations: per-point analytic Jacobians
            w.r.t. each chain pose's right tangent (factors.{plane,edge}_
            point_jacobian), per-chain 6x6 Gram blocks on the MXU, then the
            chain rule through the pose graph via one *tiny* jacfwd (poses
            only, no point data)."""
            ec, pc = edge_corrs, plane_corrs
            (cq, ct), (sq, st_) = point_poses(xx, nc_cur, ns_cur)
            re = factors.edge_residual(rot.quat_rotate(cq, ec.p) + ct, ec)
            we = factors.robust_weights(
                jnp.sum(re * re, -1), ec.w, oc.loss_mode, oc.huber_delta,
                gm_c=oc.gm_c, gnc_mu=mu,
            )
            rp = factors.plane_residual(rot.quat_rotate(sq, pc.p) + st_, pc)
            wp = factors.robust_weights(rp * rp, pc.w, oc.loss_mode,
                                        oc.huber_delta, gm_c=oc.gm_c,
                                        gnc_mu=mu)
            Je = factors.edge_point_jacobian(cq, ec).reshape(nq, nc_cur, 3, 6)
            Jp = factors.plane_point_jacobian(sq, pc).reshape(nq, ns_cur, 6)
            we_g = we.reshape(nq, nc_cur)
            re_g = re.reshape(nq, nc_cur, 3)
            wp_g = wp.reshape(nq, ns_cur)
            rp_g = rp.reshape(nq, ns_cur)
            G = (jnp.einsum("qnka,qn,qnkb->qab", Je, we_g, Je)
                 + jnp.einsum("qna,qn,qnb->qab", Jp, wp_g, Jp))
            bq = (jnp.einsum("qnka,qn,qnk->qa", Je, we_g, re_g)
                  + jnp.einsum("qna,qn->qa", Jp, wp_g * rp_g))

            # chain rule through the pose graph, closed form: for
            # T = Wp⁻¹∘Wf∘E under right perturbations,
            #   dδ_T/dδ_pivot = −Ad(T⁻¹), dδ_T/dδ_f = Ad(E⁻¹), dδ_T/dδ_E = I
            # (X∘Exp(v) = Exp(Ad_X v)∘X conjugation identities).
            rows = []
            eye6 = jnp.eye(6)
            for qi, (f, l) in enumerate(q_ids):
                T = chain(xx, qi)
                blk = jnp.zeros((6, dim))
                blk = blk.at[:, 0:6].set(-se3.adjoint(se3.inverse(T)))
                blk = blk.at[:, f * 6:(f + 1) * 6].set(
                    se3.adjoint(se3.inverse(ext_of(xx, l))))
                if calibrate_ext and l >= 1:
                    base = (n_opt + l - 1) * 6
                    blk = blk.at[:, base:base + 6].set(eye6)
                rows.append(blk)
            A = jnp.stack(rows)                       # [nq, 6, dim]
            zero = jnp.zeros((dim,), jnp.float32)
            H = jnp.einsum("qai,qab,qbj->ij", A, G, A)
            g = jnp.einsum("qai,qa->i", A, bq)
            rsm = small_residual(xx)
            Jsm = jax.jacfwd(
                lambda dx: small_residual(retract(xx, dx))
            )(zero)
            H = H + Jsm.T @ Jsm
            g = g + Jsm.T @ rsm
            cost = 0.5 * (jnp.sum(we * jnp.sum(re * re, -1))
                          + jnp.sum(wp * rp * rp) + jnp.sum(rsm * rsm))
            return H, g, cost

        gnc = oc.loss_mode == "gnc_gm"
        # GNC needs iterations to anneal (see tracker.py note); the gnc
        # mode gets a full budget — opt-in cost with the loss mode
        eff_iters = max(oc.gn_iters, 8) if gnc else oc.gn_iters
        mu_sched = (robust.gnc_mu_schedule(oc.gnc_mu_init, eff_iters + 1)
                    if gnc else None)
        if deg_P is None and analytic and oc.eig_threshold > 0:
            # ARMED path (indoor/degenerate operating point —
            # platforms.indoor_degenerate; the default ships disarmed,
            # see config.OdometryConfig.eig_threshold): persistence- and
            # purity-gated solution remapping. Linearize once HERE so the
            # gate sees the measurement Hessian, then hand the (possibly
            # identity) projector and the linearization to the solver —
            # no double work.
            with jax.default_matmul_precision("highest"):
                init_lin = GN_linearize(
                    None, retract, x, dim,
                    quad_prior=(prior_delta, state.prior),
                    linearize_fn=linearize_fn,
                    mu=mu_sched(0) if mu_sched is not None else None)
                Hm0 = init_lin[3]
                vals_sh, v0 = degeneracy.shared_weak_direction(Hm0)
                below = vals_sh[0] < oc.eig_threshold
                consistent = (jnp.abs(jnp.dot(v0, state.deg_dir))
                              > oc.eig_persist_cos)
                # leaky persistence credit: +1 per consistent sub-threshold
                # frame, fast decay (-3) on clear frames — a single
                # flicker above the ceiling doesn't zero a corridor's
                # standing, while a real regime exit drains in ~2 frames
                # (and `engage` requires the CURRENT frame below anyway,
                # so disengagement is immediate regardless)
                deg_count = jnp.where(
                    below,
                    jnp.where(consistent, state.deg_count + 1, 1),
                    jnp.maximum(state.deg_count - 3, 0)).astype(jnp.int32)
                deg_dir = jnp.where(below, v0, state.deg_dir)
                engage = below & (deg_count >= oc.eig_persist_k)
                if oc.eig_snap_purity is not None:
                    # purity condition: freeze only a crisply-canonical
                    # starved axis (corridor max|v0| = 0.99; a rotating
                    # mixed weak direction indicates moving-frame weak
                    # geometry, where freezing corrupts real motion)
                    engage = engage & (jnp.max(jnp.abs(v0))
                                       >= oc.eig_snap_purity)
                # SUPPORT-CONCENTRATION gate (round 5): per-correspondence
                # contributions to curvature along v0, a_i = w_i (J_i·v0)².
                # Spurious information is CONCENTRATED — a corridor's
                # along-axis stiffness is carried by a handful of
                # companion/noise returns — while genuine sparse geometry
                # spreads over hundreds of features. The effective support
                # count n_eff = (Σa)²/Σa² separates regimes every
                # Hessian-eigenvalue statistic cannot (e0 bands overlap:
                # corridor-0.01 113-156 vs noiseless-turn 69-207 —
                # measured via demos/probe_*.py).
                (cq0, _), (sq0, _) = point_poses(x, nc_cur, ns_cur)
                Jp_r = factors.plane_point_jacobian(sq0, plane_corrs)
                Je_r = factors.edge_point_jacobian(cq0, edge_corrs)
                a_p = plane_corrs.w * jnp.square(Jp_r @ v0)
                a_e = edge_corrs.w * jnp.sum(
                    jnp.square(jnp.einsum("nkd,d->nk", Je_r, v0)), -1)
                a = jnp.concatenate([a_p, a_e])
                neff = jnp.square(jnp.sum(a)) / jnp.maximum(
                    jnp.sum(a * a), 1e-20)
                support_neff = neff
                if oc.eig_support_neff is not None:
                    engage = engage & (neff < oc.eig_support_neff)
                P_eng, _ = degeneracy.block_projector(
                    Hm0, oc.eig_threshold, oc.remap_max_freeze,
                    shared=oc.remap_shared,
                    snap_purity=oc.eig_snap_purity)
                eye = jnp.broadcast_to(jnp.eye(6, dtype=P_eng.dtype),
                                       P_eng.shape)
                deg_P = jnp.where(engage, P_eng, eye)
        else:
            init_lin = None
        st = gauss_newton(
            None if analytic else residual_fn,
            x,
            retract,
            dim=dim,
            iters=eff_iters,
            remap_threshold=oc.eig_threshold if deg_P is None else None,
            remap_max_freeze=oc.remap_max_freeze,
            remap_shared=oc.remap_shared,
            remap_snap_purity=oc.eig_snap_purity,
            remap_P=deg_P,
            init_linearization=init_lin,
            quad_prior=(prior_delta, state.prior),
            linearize_fn=linearize_fn if analytic else None,
            mu_schedule=mu_sched,
        )
        x = st.x
        result = st

    # re-linearize the anchor/prior rows at the solve's final accepted state
    # (result.x == result.H's linearization point) so marginalize_pivot can
    # subtract them exactly — see WindowSolveResult.H_anchor.
    with jax.default_matmul_precision("highest"):
        zero = jnp.zeros((dim,), jnp.float32)
        rsm = small_residual(result.x)
        Jsm = jax.jacfwd(
            lambda dx: small_residual(retract(result.x, dx))
        )(zero)
        H_anchor = Jsm.T @ Jsm
        g_anchor = Jsm.T @ rsm
        # prior contribution at the same point (for the measurement/prior
        # split in degeneracy-consistent marginalization)
        val = state.prior.valid.astype(jnp.float32)
        Hq = state.prior.H * val
        g_prior = val * state.prior.b + Hq @ prior_delta(result.x)

    poses, ext = result.x
    solve = WindowSolveResult(
        H=result.H,
        g=result.g,
        cost=result.cost,
        n_corner=jnp.sum(edge_corrs.w > 0),
        n_surf=jnp.sum(plane_corrs.w > 0),
        # smallest per-block eigenvalue from the solve's own degeneracy
        # projector (evalDegenracy's lambda, computed once per solve)
        eig_min=result.eig0[:, 0],
        H_anchor=H_anchor,
        g_anchor=g_anchor,
        eig_blocks=result.eig0,
        H_prior=Hq,
        g_prior=g_prior,
        frozen=result.frozen,
        eig_shared=result.eig_shared,
        weak_dir=result.weak_dir,
        remap_P=deg_P,
        support_neff=support_neff,
    )
    return state._replace(poses=poses, ext=ext, deg_dir=deg_dir,
                          deg_count=deg_count), solve


def marginalize_pivot(state: WindowState, solve: WindowSolveResult,
                      cfg: MloamConfig, calibrate_ext: bool = False) -> WindowState:
    """Schur-eliminate the pivot block of the final (H, g) into a prior over
    the remaining opt poses (+ extrinsics in calib mode); re-linearize at the
    current estimates. The new frame pushed next step enters with a zero
    prior block."""
    O = cfg.odometry.opt_window_size
    dim = prior_dim(cfg, calibrate_ext)
    # marginalize only the factor blocks + old prior: the per-solve gauge
    # anchor (and calib extrinsic prior) rows are re-added fresh every solve
    # and must not be re-baked into the prior (see WindowSolveResult.H_anchor)
    H_in = solve.H - solve.H_anchor
    g_in = solve.g - solve.g_anchor
    oc = cfg.odometry
    if (oc.eig_threshold > 0 and oc.remap_project_prior
            and solve.H_prior is not None and not calibrate_ext):
        # Degeneracy-consistent marginalization: measurements the solution
        # remap refused to APPLY must not enter the prior either — else
        # the prior stores the rejected gradient along frozen directions,
        # and every subsequent solve leaks that accumulated pull through
        # the frozen eigvector's impurity into observable axes (measured
        # on the corridor course: the stored pull turned a bounded 2.7 m
        # drift into 7-19 m under every freezing variant). Project the
        # MEASUREMENT part with the same per-block eigprojector the solve
        # used; the inherited prior part passes through untouched. P is
        # idempotent PSD, so P Hm P stays PSD. No counterpart in the
        # reference (its marginalization replays raw residuals,
        # marginalization_factor.cpp:105-144) — its eig analysis and
        # marginalization never co-engage in its shipped configs.
        Hm = H_in - solve.H_prior
        gm = g_in - solve.g_prior
        if solve.remap_P is not None:
            # reuse the EXACT projector the solve applied (identity when
            # the persistence gate kept the remap disengaged) — the prior
            # then stores precisely the measurements the solve accepted
            P = solve.remap_P
        else:
            P, _ = degeneracy.block_projector(Hm, oc.eig_threshold,
                                              oc.remap_max_freeze,
                                              shared=oc.remap_shared,
                                              snap_purity=oc.eig_snap_purity)
        n = P.shape[0]
        H4 = Hm.reshape(n, 6, n, 6)
        Hm = jnp.einsum("aij,ajbl,bkl->aibk", P, H4, P).reshape(n * 6,
                                                               n * 6)
        gm = jnp.einsum("aij,aj->ai", P, gm.reshape(n, 6)).reshape(-1)
        H_in = Hm + solve.H_prior
        g_in = gm + solve.g_prior
    small = schur_marginalize_quad(H_in, g_in, n_drop=6)
    # retained layout after the slide: [poses 0..O-1 | ext...], new pose
    # block O is zero. Old retained layout: [poses 1..O | ext...].
    old_pose = jnp.arange(O * 6)
    new_idx = jnp.concatenate([
        old_pose,                                  # poses keep order
        jnp.arange((O + 1) * 6, dim),              # ext blocks shift past the
    ]) if calibrate_ext else old_pose              # zero new-pose block
    Hp = jnp.zeros((dim, dim)).at[new_idx[:, None], new_idx[None, :]].set(small.H)
    b = jnp.zeros((dim,)).at[new_idx].set(small.b)
    return state._replace(
        prior=QuadPrior(H=Hp, b=b, valid=jnp.asarray(True)),
        prior_poses=state.poses,
        prior_ext=state.ext,
    )


def drop_prior(state: WindowState, cfg: MloamConfig) -> WindowState:
    """Discard the marginalization prior (the reference does this when
    calibration converges, estimator.cpp:1709-1732)."""
    dim = (cfg.odometry.opt_window_size + 1) * 6
    return state._replace(prior=QuadPrior.empty(dim))
