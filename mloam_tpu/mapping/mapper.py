"""Uncertainty-aware keyframe mapping backend (scan-to-map refinement).

Counterpart of the reference's ``lidar_mapper_keyframe.cpp`` process loop
(:929-1114): odometry-to-map association (``transformAssociateToMap`` :145),
surrounding-keyframe map assembly with covariance compounding
(``extractSurroundingKeyFrames`` :254-354 + ``cloudUCTAssociateToMap``
:1116-1158), uncertainty-gated downsampling of the current scan
(``downsampleCurrentScan`` :356-421), two-round scan-to-map Gauss-Newton
with covariance-weighted factors and degeneracy remapping
(``scan2MapOptimization`` :423-639, ``LidarMapPlaneNormFactor`` weights),
pose covariance = H⁻¹ (:602-618), and motion-gated keyframe insertion
(``saveKeyframe`` :641-683).

TPU design: the surround map is a gather over the keyframe ring + one
uncertainty-weighted voxel reduction; correspondences are batched kNN; the
single-pose GN reuses the generic solver. The whole step is one jitted
program; only the keyframe-insertion decision returns to the host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.config import MloamConfig
from mloam_tpu.core import se3, uncertainty
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.mapping import keyframes as KF
from mloam_tpu.ops import select, voxel
from mloam_tpu.solver import degeneracy, factors, robust
from mloam_tpu.solver.gauss_newton import gauss_newton


class SurroundMap(NamedTuple):
    """Cached assembled surround map (fixed caps, world frame).

    The reference caches per-keyframe transformed cov-clouds and re-extracts
    the surround set every mapping step (extractSurroundingKeyFrames,
    lidar_mapper_keyframe.cpp:254-354). Keyframe poses never change between
    insertions here, so the *assembled* world-frame map is exactly reusable:
    it is rebuilt only when a keyframe was inserted or the sensor moved
    beyond ``surround_rebuild_dist`` from the assembly center. Assembly
    (gather + covariance pushforward over ~150k points + two packed voxel
    sorts) measured ~22 ms on chip vs ~5 ms for match+GN — this cache is the
    difference between mapping at ~45 Hz and ~180 Hz.
    """

    c_xyz: jnp.ndarray    # [capC, 3]
    c_mask: jnp.ndarray   # [capC]
    s_xyz: jnp.ndarray    # [capS, 3]
    s_mask: jnp.ndarray   # [capS]
    center: jnp.ndarray   # [3] assembly center (world)
    head: jnp.ndarray     # db.head at assembly time
    valid: jnp.ndarray    # scalar bool


class MapperState(NamedTuple):
    db: KF.KeyframeDB
    pose_map_odom: Pose   # map <- odom drift correction
    last_kf_pose: Pose
    # [L, 6, 6] per-lidar extrinsic covariance — THE uncertainty source of
    # uncertainty-aware mapping (the reference's COV_EXT, fed live from
    # /extrinsics after calibration converges, lidar_mapper_keyframe.cpp:
    # 1028-1046). Installed from config priors (uct_ext yaml counterpart)
    # at init and overwritten with the calibrated covariance at the 1->0
    # freeze (FullPipeline plumbs OdometryPipeline.ext_cov here).
    ext_cov: jnp.ndarray
    cov_meas: jnp.ndarray  # [3, 3] measurement covariance
    cache: SurroundMap
    step: jnp.ndarray     # scalar int32 mapping-step counter (PRNG stream)
    # degeneracy persistence state (MAP_EIG_THRE counterpart with the
    # round-5 temporal gate — see config.MappingConfig.eig_persist_k)
    deg_dir: jnp.ndarray | None = None    # [6]
    deg_count: jnp.ndarray | None = None  # scalar int32


class MapperOutput(NamedTuple):
    pose: Pose            # map <- base refined
    cov: jnp.ndarray      # [6, 6] pose covariance (H^-1)
    cost: jnp.ndarray
    n_corner: jnp.ndarray
    n_surf: jnp.ndarray
    eig_min: jnp.ndarray
    inserted_kf: jnp.ndarray  # bool
    # directions actually frozen by the applied projector (trace deficit;
    # 0.0 when the remap is off or silent) — the mapper-side engagement
    # signal (MAP_EIG_THRE counterpart)
    frozen: jnp.ndarray | float = 0.0


def uncertainty_sqrt_info(trace: jnp.ndarray) -> jnp.ndarray:
    """Normalized/clamped variant of the reference's covariance-driven
    factor weight (``lidar_map_factor.hpp:33-42``): s = sqrt(1/trace);
    the point is fully trusted (weight 1) while s >= 3 — i.e.
    trace <= 1/9 — and decays as s/3 = 1/(3*sqrt(trace)) beyond.

    Deliberate deviation: the reference uses the *unclamped* sqrt(1/trace)
    as the factor weight and instead hard-rejects points with
    trace > TRACE_THRESHOLD_MAPPING before matching
    (``lidar_mapper_keyframe.cpp:384``). We keep that trace gate
    (``downsample_scan``: ``tr < mc.trace_threshold``) but normalize the
    surviving weights into [0, 1] so the robust-loss delta keeps a stable
    scale; high-confidence points are therefore *relatively* down-weighted
    vs the reference. NaN/invalid traces map to a large trace
    (weight -> ~0); pinned by
    tests/test_mapping.py::test_uncertainty_weight_curve."""
    tr = jnp.maximum(jnp.nan_to_num(trace, nan=1e6, posinf=1e6), 1e-12)
    s = jnp.sqrt(1.0 / tr)
    return jnp.where(s >= 3.0, 1.0, s / 3.0)


def default_ext_cov(cfg: MloamConfig) -> jnp.ndarray:
    """[L, 6, 6] prior extrinsic covariance: zeros for the reference lidar,
    the configured uct_ext diagonal (scaled by uct_ext_ratio) for the rest —
    the reference's COV_EXT initialization (parameters.cpp:276-283)."""
    L = cfg.rig.n_lidars
    mc = cfg.mapping
    ec = jnp.zeros((L, 6, 6))
    if mc.ext_cov_prior_diag is not None and L > 1:
        d = jnp.diag(jnp.asarray(mc.ext_cov_prior_diag, jnp.float32))
        ec = ec.at[1:].set(mc.uct_ext_ratio * d)
    return ec


def _point_cov(xyz: jnp.ndarray, pose: Pose, base_cov: jnp.ndarray,
               ext_cov: jnp.ndarray, cov_meas: jnp.ndarray) -> jnp.ndarray:
    """Per-point 3x3 covariance pushforward with PER-LIDAR extrinsic
    covariance: clouds here are the per-lidar features concatenated in lidar
    order with equal segment sizes (FullPipeline._merge), so segment l gets
    pose covariance ``base_cov + ext_cov[l]``. Falls back to the lidar-mean
    extrinsic covariance when the cloud isn't an even concatenation."""
    L = ext_cov.shape[0]
    n = xyz.shape[0]
    if L == 1 or n % L != 0:
        cov6 = base_cov + jnp.mean(ext_cov, axis=0)
        return uncertainty.point_cov_pushforward(xyz, pose, cov6, cov_meas)
    per = jax.vmap(
        lambda x, ec: uncertainty.point_cov_pushforward(
            x, pose, base_cov + ec, cov_meas
        )
    )(xyz.reshape(L, n // L, 3), ext_cov)
    return per.reshape(n, 3, 3)


def init_state(cfg: MloamConfig) -> MapperState:
    mc = cfg.mapping
    # keyframe clouds are the per-sweep features merged over all lidars
    # (FullPipeline._merge), so capacities scale with the rig size
    L = cfg.rig.n_lidars
    db = KF.empty_db(mc.max_keyframes, L * cfg.odometry.cap_frame_corner,
                     L * cfg.odometry.cap_frame_surf,
                     L * mc.cap_frame_outlier)
    return MapperState(
        db=db,
        pose_map_odom=Pose.identity(),
        last_kf_pose=Pose(jnp.array([1.0, 0, 0, 0]),
                          jnp.array([1e6, 1e6, 1e6])),  # force first keyframe
        ext_cov=default_ext_cov(cfg),
        cov_meas=1e-4 * jnp.eye(3),
        cache=SurroundMap(
            c_xyz=jnp.zeros((mc.cap_map_corner, 3)),
            c_mask=jnp.zeros((mc.cap_map_corner,), bool),
            s_xyz=jnp.zeros((mc.cap_map_surf, 3)),
            s_mask=jnp.zeros((mc.cap_map_surf,), bool),
            center=jnp.zeros((3,)),
            head=jnp.asarray(-1, jnp.int32),
            valid=jnp.asarray(False),
        ),
        step=jnp.asarray(0, jnp.int32),
        deg_dir=jnp.zeros((6,)),
        deg_count=jnp.asarray(0, jnp.int32),
    )


def _assemble_map(state: MapperState, center: jnp.ndarray, cfg: MloamConfig,
                  n_surround: int = 50):
    """Surround-keyframe gather -> world-frame cov-clouds -> uncertainty-
    weighted voxel filter. Returns (c_xyz, c_mask, s_xyz, s_mask, s_cov)."""
    mc = cfg.mapping
    idx, ok = KF.surrounding(state.db, center, mc.surround_radius, n_surround)

    def project(stack: FeatCloud, leaf: float, precap: int | None):
        xyz = stack.xyz[idx]          # [M, N, 3]
        mask = stack.mask[idx] & ok[:, None]
        q = state.db.poses.q[idx]
        t = state.db.poses.t[idx]
        cov_pose = state.db.cov[idx]  # [M, 6, 6]

        def per_kf(q, t, c, x, m):
            pose = Pose(q, t)
            y = se3.transform_points(pose, x)
            cov_pt = _point_cov(x, pose, c, state.ext_cov, state.cov_meas)
            return y, cov_pt, m

        y, cov_pt, m = jax.vmap(per_kf)(q, t, cov_pose, xyz, mask)
        flat_xyz = y.reshape(-1, 3)
        flat_cov = cov_pt.reshape(-1, 3, 3)
        flat_m = m.reshape(-1)
        # sort-free compaction before the voxel sort: the stacked keyframe
        # clouds are mostly padding (per-kf caps are worst-case), and the
        # argsort is the dominant cost of assembly. Exact when the valid
        # count fits the bound; even-stride subsample otherwise.
        if precap is not None and precap < flat_xyz.shape[0]:
            packed = jnp.concatenate(
                [flat_xyz, flat_cov.reshape(-1, 9)], -1
            )
            packed, flat_m = select.compact_stride(packed, flat_m, precap)
            flat_xyz = packed[:, :3]
            flat_cov = packed[:, 3:].reshape(-1, 3, 3)
        # packed single-key sort: the surround map spans <= 2*radius
        # (100 m default) — well inside the 1024-cell packed grid
        ds_xyz, ds_cov, ds_m, _ = voxel.voxel_downsample_with_cov(
            flat_xyz, flat_cov, flat_m, leaf, mc.voxel_trace_threshold,
            packed=True,
        )
        return ds_xyz, ds_cov, ds_m

    L = cfg.rig.n_lidars
    pc = (mc.surround_precap_corner * L
          if mc.surround_precap_corner is not None else None)
    ps = (mc.surround_precap_surf * L
          if mc.surround_precap_surf is not None else None)
    c_xyz, c_cov, c_m = project(state.db.corner, mc.corner_leaf, pc)
    s_xyz, s_cov, s_m = project(state.db.surf, mc.surf_leaf, ps)
    return c_xyz, c_cov, c_m, s_xyz, s_cov, s_m


def refresh_surround(state: MapperState, center: jnp.ndarray,
                     cfg: MloamConfig) -> SurroundMap:
    """Return a fresh or reused SurroundMap. Rebuilds (the expensive
    assembly) only when stale: a keyframe was inserted since assembly, or
    the sensor moved > surround_rebuild_dist from the assembly center.
    lax.cond executes a single branch on TPU, so reuse steps skip the
    assembly entirely."""
    mc = cfg.mapping

    def rebuild(_):
        c_xyz, _c_cov, c_m, s_xyz, _s_cov, s_m = _assemble_map(
            state, center, cfg
        )
        # compact to the fixed map caps: shrinks both the cached arrays and
        # the kNN reference sets (valid voxels are far below the padded
        # row counts; even-stride subsample if ever over-full)
        c2, cm2 = select.compact_stride(c_xyz, c_m, mc.cap_map_corner)
        s2, sm2 = select.compact_stride(s_xyz, s_m, mc.cap_map_surf)
        return SurroundMap(c2, cm2, s2, sm2, center, state.db.head,
                           jnp.asarray(True))

    def keep(_):
        return state.cache

    moved = jnp.sum((center - state.cache.center) ** 2) \
        > mc.surround_rebuild_dist ** 2
    stale = (~state.cache.valid) | (state.cache.head != state.db.head) | moved
    return jax.lax.cond(stale, rebuild, keep, None)


def scan_to_map(
    state: MapperState,
    pose_pred: Pose,
    corner: FeatCloud,
    surf: FeatCloud,
    cfg: MloamConfig,
    smap: SurroundMap | None = None,
):
    """Refine pose_pred against the surround map. corner/surf in base frame.

    Returns (pose, cov, cost, n_corner, n_surf, eig_min).
    """
    mc = cfg.mapping
    if smap is None:
        smap = refresh_surround(state, pose_pred.t, cfg)
    c_xyz, c_m, s_xyz, s_m = smap.c_xyz, smap.c_mask, smap.s_xyz, smap.s_mask

    # current-scan uncertainty gate (downsampleCurrentScan :356-421)
    def gate(fc: FeatCloud):
        cov_pt = _point_cov(
            fc.xyz, Pose.identity(), jnp.zeros((6, 6)), state.ext_cov,
            state.cov_meas,
        )
        tr = jnp.trace(cov_pt, axis1=-2, axis2=-1)
        keep = fc.mask & (tr < mc.trace_threshold)
        return fc._replace(mask=keep), tr

    corner, corner_tr = gate(corner)
    surf, surf_tr = gate(surf)

    pose = pose_pred
    result = None
    ec = pc = None
    deg_P = None
    deg_dir = state.deg_dir
    deg_count = state.deg_count
    for _ in range(mc.outer_iters):
        proj_c = se3.transform_points(pose, corner.xyz)
        proj_s = se3.transform_points(pose, surf.xyz)
        ec = factors.match_map_edge(
            corner, proj_c, c_xyz, c_m, cfg.odometry.dist_sq_threshold
        )
        pc = factors.match_map_plane(
            surf, proj_s, s_xyz, s_m, cfg.odometry.dist_sq_threshold
        )
        # covariance-aware weights (LidarMap{PlaneNorm,Edge}Factor sqrt_info
        # curve, lidar_map_factor.hpp:26-141): down-weight high-uncertainty
        # points in BOTH feature classes with the reference's clamped
        # 1/(3*sqrt(trace)) form
        pc = pc._replace(w=pc.w * uncertainty_sqrt_info(surf_tr))
        ec = ec._replace(w=ec.w * uncertainty_sqrt_info(corner_tr))
        # good-feature selection (ActiveFeatureSelection methods,
        # lidar_mapper.h:126-631)
        if mc.gf_method == "gd_float":
            # budget-adaptive ratio (lidar_mapper_keyframe.cpp:456-492):
            # evaluate the full-Hessian logdet of ALL matched features; when
            # the geometry is weak (logdet below map_deg_threshold) back off
            # to the degraded (higher) keep ratio, else use the aggressive
            # configured one. All-batched — the reference's every-10-frames
            # probe exists only to amortize CPU cost.
            from mloam_tpu.solver import feature_selection as FS

            Jp = FS.plane_jacobian_blocks(pc, pose)
            Je = FS.edge_jacobian_blocks(ec, pose)
            vp = (pc.w > 0).astype(jnp.float32)
            ve = (ec.w > 0).astype(jnp.float32)
            Hfull = (jnp.einsum("n,ni,nj->ij", vp, Jp, Jp)
                     + jnp.einsum("n,nai,naj->ij", ve, Je, Je)
                     + 1e-6 * jnp.eye(6))
            _, ld = jnp.linalg.slogdet(Hfull)
            ratio = jnp.where(ld > mc.map_deg_threshold,
                              mc.gf_ratio, mc.gf_ratio_degraded)
            keep_p, keep_e = FS.logdet_gain_select(
                Jp, pc.w, Je, ec.w, ratio,
                max_ratio=max(mc.gf_ratio, mc.gf_ratio_degraded))
            pc = pc._replace(w=pc.w * keep_p.astype(pc.w.dtype))
            ec = ec._replace(w=ec.w * keep_e.astype(ec.w.dtype))
        elif mc.gf_method != "full" and mc.gf_ratio < 1.0:
            from mloam_tpu.solver import feature_selection as FS

            # fold the mapping-step counter into the stream so the 'rnd'
            # Bernoulli mask differs every step (a constant key would apply
            # the SAME mask every frame, defeating variance averaging)
            pc, ec = FS.apply_selection(
                pc, ec, pose, mc.gf_method, mc.gf_ratio,
                key=jax.random.fold_in(jax.random.PRNGKey(17), state.step),
            )

        def linearize_fn(T: Pose, mu=1.0):
            """Closed-form single-pose normal equations (the analytic
            LidarMap{Edge,PlaneNorm}Factor Jacobians, batched)."""
            re = factors.edge_residual(se3.transform_points(T, ec.p), ec)
            we = factors.robust_weights(
                jnp.sum(re * re, -1), ec.w, mc.loss_mode,
                mc.huber_delta, gm_c=mc.gm_c, gnc_mu=mu,
            )
            rp = factors.plane_residual(se3.transform_points(T, pc.p), pc)
            wp = factors.robust_weights(
                rp * rp, pc.w, mc.loss_mode,
                mc.huber_delta, gm_c=mc.gm_c, gnc_mu=mu,
            )
            qe = jnp.broadcast_to(T.q, (ec.p.shape[0], 4))
            qp = jnp.broadcast_to(T.q, (pc.p.shape[0], 4))
            Je = factors.edge_point_jacobian(qe, ec)    # [N, 3, 6]
            Jp = factors.plane_point_jacobian(qp, pc)   # [N, 6]
            H = (jnp.einsum("nka,n,nkb->ab", Je, we, Je)
                 + jnp.einsum("na,n,nb->ab", Jp, wp, Jp))
            g = (jnp.einsum("nka,n,nk->a", Je, we, re)
                 + jnp.einsum("na,n->a", Jp, wp * rp))
            cost = 0.5 * (jnp.sum(we * jnp.sum(re * re, -1))
                          + jnp.sum(wp * rp * rp))
            return H, g, cost

        gnc = mc.loss_mode == "gnc_gm"
        eff_iters = max(mc.gn_iters, 8) if gnc else mc.gn_iters
        mu_sched = (robust.gnc_mu_schedule(mc.gnc_mu_init, eff_iters + 1)
                    if gnc else None)
        if deg_P is None and mc.eig_threshold > 0:
            # ARMED path (indoor/degenerate operating point): persistence-
            # gated mapper remap (MAP_EIG_THRE counterpart,
            # lidar_mapper_keyframe.cpp:1172-1204): linearize once here,
            # run the gate on the single-pose measurement Hessian, hand
            # the projector + the linearization to the solver
            with jax.default_matmul_precision("highest"):
                mu0 = mu_sched(0) if mu_sched is not None else None
                H0, g0, c0 = (linearize_fn(pose) if mu0 is None
                              else linearize_fn(pose, mu0))
                init_lin = (H0, g0, c0, H0)
                vals, vecs = jnp.linalg.eigh(H0)
                below = vals[0] < mc.eig_threshold
                consistent = (jnp.abs(jnp.dot(vecs[:, 0], state.deg_dir))
                              > mc.eig_persist_cos)
                # leaky persistence credit (see the estimator's gate)
                deg_count = jnp.where(
                    below,
                    jnp.where(consistent, state.deg_count + 1, 1),
                    jnp.maximum(state.deg_count - 3, 0)).astype(jnp.int32)
                deg_dir = jnp.where(below, vecs[:, 0], state.deg_dir)
                engage = below & (deg_count >= mc.eig_persist_k)
                if mc.eig_snap_purity is not None:
                    # purity condition — see the estimator's gate: freeze
                    # only a crisply-canonical starved axis
                    engage = engage & (jnp.max(jnp.abs(vecs[:, 0]))
                                       >= mc.eig_snap_purity)
                P_eng, _ = degeneracy.block_projector(
                    H0, mc.eig_threshold, mc.remap_max_freeze,
                    snap_purity=mc.eig_snap_purity)
                eye = jnp.broadcast_to(jnp.eye(6, dtype=P_eng.dtype),
                                       P_eng.shape)
                deg_P = jnp.where(engage, P_eng, eye)
        else:
            init_lin = None
        st = gauss_newton(
            None,
            pose,
            lambda T, dx: se3.boxplus(T, dx),
            dim=6,
            iters=eff_iters,
            # disarmed: threshold 0.0 still populates eig diagnostics
            # (freezes nothing); armed: the gated projector applies
            remap_threshold=mc.eig_threshold if deg_P is None else None,
            remap_max_freeze=mc.remap_max_freeze,
            remap_snap_purity=mc.eig_snap_purity,
            remap_P=deg_P,
            init_linearization=init_lin,
            linearize_fn=linearize_fn,
            mu_schedule=mu_sched,
        )
        pose = st.x
        result = st

    vals, vecs = jnp.linalg.eigh(result.H)
    inv_vals = jnp.where(vals > 1e-6, 1.0 / jnp.maximum(vals, 1e-6), 1e6)
    cov = (vecs * inv_vals[None, :]) @ vecs.T
    return (
        pose, cov, result.cost,
        jnp.sum(ec.w > 0), jnp.sum(pc.w > 0), result.eig0[0, 0],
        result.frozen[0], deg_dir, deg_count,
    )


def mapper_step(
    state: MapperState,
    odom_pose: Pose,
    corner: FeatCloud,
    surf: FeatCloud,
    cfg: MloamConfig,
    outlier: FeatCloud | None = None,
) -> tuple[MapperState, MapperOutput]:
    """One mapping update. ``odom_pose`` is the odometry-frame pose;
    corner/surf are the current sweep's features in the base frame (already
    merged over lidars through their extrinsics). ``outlier`` (optional,
    same frame) is stored into the keyframe for map completeness — it is
    never matched (reference /laser_cloud_outlier handling)."""
    mc = cfg.mapping
    pose_pred = se3.compose(state.pose_map_odom, odom_pose)

    has_map = state.db.valid.any()
    smap = refresh_surround(state, pose_pred.t, cfg)
    state = state._replace(cache=smap)

    def refine(_):
        return scan_to_map(state, pose_pred, corner, surf, cfg, smap=smap)

    def passthrough(_):
        return (
            pose_pred, jnp.eye(6) * 1e-2, jnp.asarray(0.0),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0.0), jnp.asarray(0.0),
            state.deg_dir, state.deg_count,
        )

    (pose, cov, cost, nc, ns, eig, frozen, deg_dir,
     deg_count) = jax.lax.cond(has_map, refine, passthrough, None)

    # drift correction update (transformUpdate :154)
    pose_map_odom = se3.compose(pose, se3.inverse(odom_pose))

    # keyframe insertion
    ins = KF.should_insert(pose, state.last_kf_pose, mc.keyframe_dist,
                           mc.keyframe_angle_deg)
    db = jax.tree.map(
        lambda a, b: jnp.where(ins, a, b),
        KF.insert(state.db, pose, cov, corner, surf, outlier),
        state.db,
    )
    last_kf = jax.tree.map(
        lambda a, b: jnp.where(ins, a, b), pose, state.last_kf_pose
    )

    new_state = state._replace(
        db=db, pose_map_odom=pose_map_odom, last_kf_pose=last_kf,
        step=state.step + 1, deg_dir=deg_dir, deg_count=deg_count,
    )
    out = MapperOutput(
        pose=pose, cov=cov, cost=cost, n_corner=nc, n_surf=ns,
        eig_min=eig, inserted_kf=ins, frozen=frozen,
    )
    return new_state, out
