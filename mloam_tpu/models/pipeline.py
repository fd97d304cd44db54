"""End-to-end odometry pipeline assembly (host-side orchestration around
jitted device programs).

Counterpart of the reference's per-platform ROS nodes + ``Estimator::
inputCloud/processMeasurements`` wiring (``estimator/src/rosNode*.cpp``,
``estimator.cpp:213-281,343-374``), including the online extrinsic
calibration lifecycle (SURVEY §3.4):

  ESTIMATE_EXTRINSIC==2  no prior: every lidar is tracked scan-to-scan on
      its own; screw-consistent motion pairs feed the hand-eye initializer;
      the window solve matches the reference lidar only. On σ2-convergence
      the solved extrinsics are installed and the mode drops to 1.
  ==1  refinement: extrinsic blocks join the window tangent; whenever the
      extrinsic Hessian blocks are well-conditioned the estimate is
      collected; after n_calib_samples the Lie mean is frozen in
      (computeMeanPose), the marginalization prior is discarded
      (estimator.cpp:1709-1732) and the mode drops to 0.
  ==0  pure odometry with fixed extrinsics, all lidars contributing.

All device programs have fixed shapes; each compiles once per mode.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.utils import timing

# block after every stage so stage timers are attributable (debug only —
# costs pipeline overlap). Stage names follow the reference's common::timing
# names (SURVEY §5.1) so BASELINE comparisons line up.
_SYNC_TIMING = os.environ.get("MLOAM_SYNC_TIMING", "0") == "1"


def _sync(x):
    if _SYNC_TIMING:
        jax.block_until_ready(x)
    return x

from mloam_tpu.config import MloamConfig
from mloam_tpu.core import se3
from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend import features as F
from mloam_tpu.frontend import segmentation as S
from mloam_tpu.frontend.features import FeatureFrame, downsample_featcloud
from mloam_tpu.odometry import estimator as E
from mloam_tpu.odometry import initializer as I
from mloam_tpu.odometry import tracker as TR


class OdometryOutput(NamedTuple):
    pose: Pose            # world <- base at sweep start (refined)
    pose_predict: Pose    # tracker-only prediction (high-rate path)
    extrinsics: Pose      # [L] current base <- lidar estimates
    ext_mode: int         # live ESTIMATE_EXTRINSIC state
    cost: jnp.ndarray
    n_corner: jnp.ndarray
    n_surf: jnp.ndarray
    # degeneracy diagnostics (the reference's calib_eig.txt / D-factor
    # logging, estimator.cpp:1598-1680): full [n_blocks, 6] ascending
    # measurement eigenvalues per window block, and the tracker solve's [6]
    # ascending eigenvalues (zeros when tracker remap is off). None on
    # paths that skip the solve.
    win_eig: jnp.ndarray | None = None
    trk_eig: jnp.ndarray | None = None
    # [n_blocks] directions actually frozen by the window solve's applied
    # projector (trace deficit — the TRUE engagement signal; round-4
    # advisor: counting raw sub-threshold eigenvalues overstates it)
    win_frozen: jnp.ndarray | None = None
    # [6] the shared-mean block spectrum the remap gate actually sees
    win_eig_shared: jnp.ndarray | None = None
    # [6] its weakest eigvector (candidate frozen direction)
    win_weak_dir: jnp.ndarray | None = None
    # effective support count of curvature along the weak direction
    win_support_neff: jnp.ndarray | None = None


class OdometryPipeline:
    """Single- or multi-LiDAR odometry front-to-back (no mapping backend).

    Call ``process(imgs)`` once per sweep with a list of RangeImages (one per
    lidar, synchronized). Returns an OdometryOutput.
    """

    def __init__(self, cfg: MloamConfig):
        self.cfg = cfg
        L = cfg.rig.n_lidars
        self.frame_idx = 0
        self.ext_mode = cfg.rig.extrinsic_mode if L > 1 else 0
        self.window = E.init_window(
            cfg, cfg.odometry.cap_frame_corner, cfg.odometry.cap_frame_surf
        )
        if self.ext_mode == 1:
            # starting directly in refinement mode (the RHD preset ships
            # ESTIMATE_EXTRINSIC=1): the marginalization prior must span
            # [opt poses | extrinsic blocks] from frame 0, not the pure-
            # odometry layout init_window builds
            self.window = E.reset_prior(self.window, cfg, calibrate_ext=True)
        self.prev_feats: list[FeatureFrame | None] = [None] * L
        self.last_outlier: list = [None] * L
        self.motions: list[Pose] = [Pose.identity() for _ in range(L)]
        self.world_pose: Pose = Pose.identity()
        self.calib_buffers = [I.MotionBuffer.empty(cfg.calib.n_pose_buffer)
                              for _ in range(L)]
        # per-lidar motion accumulated over calib.pair_stride sweeps: longer
        # baselines raise the pair SNR (tracker noise is absolute while the
        # signal grows with the stride)
        self.pair_accum: list[Pose] = [Pose.identity() for _ in range(L)]
        self.ext_samples: list[list] = [[] for _ in range(L)]
        self.ext_cov: np.ndarray | None = None

        # constant per-lidar ray tables for wire-format (PackedFrame) input
        self._rays = [RI.unit_rays(m) for m in cfg.rig.models]
        self._frontends = [
            jax.jit(functools.partial(self._frontend_impl, model_idx=l))
            for l in range(L)
        ]
        self._track = jax.jit(self._track_impl)
        self._push_only = jax.jit(self._push_only_impl,
                                  static_argnames=("mode2",))
        self._push_first = jax.jit(self._push_first_impl)
        self._window_ref = jax.jit(
            functools.partial(self._window_step_impl, calibrate_ext=False,
                              lidars=(0,)),
            static_argnames=("mode2",),
        )
        self._window_all = jax.jit(
            functools.partial(self._window_step_impl, calibrate_ext=False,
                              lidars=tuple(range(L))),
            static_argnames=("mode2",),
        )
        self._window_calib = jax.jit(
            functools.partial(self._window_step_impl, calibrate_ext=True,
                              lidars=tuple(range(L))),
            static_argnames=("mode2",),
        )
        self._compose = jax.jit(se3.compose)
        self._deskew = jax.jit(lambda fc, T: TR.deskew_features(T, fc))
        self._fused = (
            jax.jit(self._fused_step_impl, donate_argnums=(0,))
            if L == 1 else None
        )
        self._fused_multi = (
            jax.jit(self._fused_multi_impl, donate_argnums=(0,))
            if L > 1 else None
        )
        # scan-chunked replay path: K fused steps inside ONE dispatch via
        # lax.scan (identical per-frame math, chained through the window
        # state). Streaming pays one tunnel dispatch (~3-5 ms) per sweep;
        # replay (the reference's own operating mode — rosbag play) pays it
        # once per K sweeps. Compiled lazily on first process_chunk call.
        self._chunked = jax.jit(self._chunked_impl, donate_argnums=(0,))
        # identical sensor models across the rig -> the per-lidar frontends
        # CAN batch into one vmapped program over the lidar axis (the TPU
        # counterpart of the reference's OpenMP `parallel for
        # num_threads(NUM_OF_LASER)` preprocessing loops, estimator.cpp:249).
        # Measured on-chip (demos/profile_dual.py): the vmapped variant is
        # ~1 ms/frame SLOWER than the unrolled copies inside the same fused
        # program (17.2 vs 16.2 ms dual) — vmap puts a grid dimension on the
        # Pallas segmentation kernel, serializing it, while unrolled copies
        # pipeline freely. Unrolled is the default; opt in via
        # MLOAM_BATCH_FE=1 (trajectories are identical — equivalence-tested).
        self._uniform_rig = (
            L > 1
            and all(m == cfg.rig.models[0] for m in cfg.rig.models)
            and os.environ.get("MLOAM_BATCH_FE", "0") == "1"
        )
        self._add_pair = jax.jit(
            functools.partial(
                I.add_pair,
                eps_r=cfg.calib.screw_rot_epsilon,
                eps_t=cfg.calib.screw_trans_epsilon,
            )
        )
        self._calibrate = jax.jit(
            functools.partial(I.calibrate, planar=cfg.calib.planar,
                              sv_threshold=cfg.calib.rot_converge_sv)
        )

    def reset(self):
        """Reset all mutable state, keeping compiled programs (the
        reference's /mlod_restart semantics: clearState + setParameter,
        rosNodeSR.cpp:154-162)."""
        cfg = self.cfg
        L = cfg.rig.n_lidars
        self.frame_idx = 0
        self.ext_mode = cfg.rig.extrinsic_mode if L > 1 else 0
        self.window = E.init_window(
            cfg, cfg.odometry.cap_frame_corner, cfg.odometry.cap_frame_surf
        )
        if self.ext_mode == 1:
            self.window = E.reset_prior(self.window, cfg, calibrate_ext=True)
        self.prev_feats = [None] * L
        self.last_outlier = [None] * L
        self.motions = [Pose.identity() for _ in range(L)]
        self.world_pose = Pose.identity()
        self.calib_buffers = [I.MotionBuffer.empty(cfg.calib.n_pose_buffer)
                              for _ in range(L)]
        self.pair_accum = [Pose.identity() for _ in range(L)]
        self.ext_samples = [[] for _ in range(L)]
        self.ext_cov = None

    # ---------------- device programs ----------------

    def _frontend_impl(self, img, model_idx: int = 0):
        from mloam_tpu.frontend.features import FeatCloud

        model = self.cfg.rig.models[model_idx]
        if isinstance(img, RI.PackedFrame):
            # wire-format input: reconstruct the f32 range image ON DEVICE
            # from the u16 ranges and the constant ray table — the h2d path
            # is tunnel-bandwidth-bound, so only 86 KB crosses per sweep
            # instead of 0.72 MB
            img = RI.unpack_frame(img, self._rays[model_idx], model)
        seg = S.segment(img, model, self.cfg.segmenter)
        ff = F.extract(img, seg.segmented, self.cfg.features)
        corner = downsample_featcloud(
            ff.less_sharp, self.cfg.odometry.corner_map_leaf,
            self.cfg.odometry.cap_frame_corner,
        )
        surf = downsample_featcloud(
            ff.less_flat, self.cfg.odometry.surf_map_leaf,
            self.cfg.odometry.cap_frame_surf,
        )
        # segmentation rejects as a third feature class for map completeness
        # (reference /laser_cloud_outlier; stored in keyframes, not matched)
        r, c = img.rng.shape
        rows = jnp.broadcast_to(
            jnp.arange(r, dtype=jnp.int32)[:, None], (r, c)
        ).reshape(-1)
        out_fc = FeatCloud(
            xyz=img.xyz.reshape(-1, 3),
            mask=seg.outlier.reshape(-1),
            time=img.time.reshape(-1),
            ring=rows,
        )
        outlier = downsample_featcloud(
            out_fc, self.cfg.mapping.outlier_leaf,
            self.cfg.mapping.cap_frame_outlier,
            precap=2 * self.cfg.mapping.cap_frame_outlier,
        )
        return ff, corner, surf, outlier

    def _track_impl(self, prev: FeatureFrame, curr: FeatureFrame, T: Pose):
        return TR.track(prev, curr, T, self.cfg.tracker)

    def _prep_frame(self, ext: Pose, motion0: Pose, motions, corners, surfs,
                    mode2: bool):
        """De-skew per lidar with its sweep motion and stack to [L, ...].

        Runs inside the jitted step — the axon tunnel charges ~40 ms per
        *eager* op, so no per-frame array op may run outside jit.
        """
        L = self.cfg.rig.n_lidars
        cs, ss = [], []
        for l in range(L):
            if self.cfg.tracker.deskew:
                if mode2 and l > 0:
                    m_l = motions[l]
                else:
                    El = Pose(ext.q[l], ext.t[l])
                    m_l = se3.compose(
                        se3.compose(se3.inverse(El), motion0), El
                    )
                cs.append(TR.deskew_features(m_l, corners[l]))
                ss.append(TR.deskew_features(m_l, surfs[l]))
            else:
                cs.append(corners[l])
                ss.append(surfs[l])
        corner = jax.tree.map(lambda *x: jnp.stack(x), *cs)
        surf = jax.tree.map(lambda *x: jnp.stack(x), *ss)
        return corner, surf

    def _push_only_impl(self, window, world_pose, motion0, motions, corners,
                        surfs, mode2):
        pred = se3.compose(world_pose, motion0)
        corner, surf = self._prep_frame(window.ext, motion0, motions,
                                        corners, surfs, mode2)
        window = E.push_frame(window, pred, corner, surf, self.cfg)
        return window, pred

    def _push_first_impl(self, window, world_pose, corners, surfs):
        corner = jax.tree.map(lambda *x: jnp.stack(x), *corners)
        surf = jax.tree.map(lambda *x: jnp.stack(x), *surfs)
        return E.push_frame(window, world_pose, corner, surf, self.cfg)

    def _window_step_impl(self, window, world_pose, motion0, motions,
                          corners, surfs, mode2, calibrate_ext, lidars):
        pred = se3.compose(world_pose, motion0)
        corner, surf = self._prep_frame(window.ext, motion0, motions,
                                        corners, surfs, mode2)
        window = E.push_frame(window, pred, corner, surf, self.cfg)
        window, solve = E.optimize_window(window, self.cfg, calibrate_ext,
                                          lidars)
        window = E.marginalize_pivot(window, solve, self.cfg, calibrate_ext)
        refined = Pose(window.poses.q[-1], window.poses.t[-1])
        return window, solve, pred, refined

    def _fused_step_impl(self, window, world_pose, motion0, prev_feat0, img):
        """Whole-sweep program for the steady single-lidar pure-odometry
        path: frontend + tracker + de-skew + window solve + marginalization
        in ONE dispatch. On the axon tunnel each submission costs ~3-5 ms,
        so collapsing the 6-call chain is the difference between ~34 and
        ~100+ frames/s."""
        ff, corner, surf, outlier = self._frontend_impl(img, 0)
        if self.cfg.tracker.skip_steady:
            # constant-velocity prediction seeds the window directly; the
            # scan-to-local-map GN below refines it against a map far richer
            # than the previous sweep, and the next prediction is the
            # refined inter-frame motion read back off the window.
            if self.cfg.tracker.deskew:
                desk = FeatureFrame(
                    *[TR.deskew_features(motion0, f) for f in ff]
                )
            else:
                desk = ff
            window, solve, pred, refined = self._window_step_impl(
                window, world_pose, motion0, (motion0,), (corner,), (surf,),
                mode2=False, calibrate_ext=False, lidars=(0,),
            )
            prev_refined = Pose(window.poses.q[-2], window.poses.t[-2])
            motion = se3.compose(se3.inverse(prev_refined), refined)
            return window, refined, motion, desk, pred, solve, outlier, None
        res, desk = TR.track(prev_feat0, ff, motion0, self.cfg.tracker)
        window, solve, pred, refined = self._window_step_impl(
            window, world_pose, res.pose, (res.pose,), (corner,), (surf,),
            mode2=False, calibrate_ext=False, lidars=(0,),
        )
        return window, refined, res.pose, desk, pred, solve, outlier, res.eig

    def _fused_multi_impl(self, window, world_pose, motion0, prev_feat0,
                          imgs):
        """Fused whole-sweep program for the steady MULTI-lidar
        pure-odometry phase (ESTIMATE_EXTRINSIC==0): all frontends, the
        reference-lidar tracker, de-skew of every lidar through its
        extrinsic, window solve over all lidars' correspondences, and
        marginalization in one dispatch (the reference's post-calibration
        path, estimator.cpp:789-848, minus the ROS hops)."""
        L = self.cfg.rig.n_lidars
        if self._uniform_rig:
            stacked = jax.tree.map(lambda *x: jnp.stack(x), *imgs)
            ffs, cs, ss, outs = jax.vmap(
                functools.partial(self._frontend_impl, model_idx=0)
            )(stacked)
            ff0 = jax.tree.map(lambda x: x[0], ffs)
            corners = [jax.tree.map(lambda x: x[l], cs) for l in range(L)]
            surfs = [jax.tree.map(lambda x: x[l], ss) for l in range(L)]
            outliers = [jax.tree.map(lambda x: x[l], outs) for l in range(L)]
        else:
            corners, surfs, outliers = [], [], []
            ff0 = None
            for l in range(L):
                ff, c, s, o = self._frontend_impl(imgs[l], l)
                if l == 0:
                    ff0 = ff
                corners.append(c)
                surfs.append(s)
                outliers.append(o)
        if self.cfg.tracker.skip_steady:
            motion = motion0
            desk = (FeatureFrame(
                *[TR.deskew_features(motion0, f) for f in ff0]
            ) if self.cfg.tracker.deskew else ff0)
            trk_eig = None
        else:
            res, desk = TR.track(prev_feat0, ff0, motion0, self.cfg.tracker)
            motion = res.pose
            trk_eig = res.eig
        window, solve, pred, refined = self._window_step_impl(
            window, world_pose, motion, (motion,) * L, tuple(corners),
            tuple(surfs), mode2=False, calibrate_ext=False,
            lidars=tuple(range(L)),
        )
        if self.cfg.tracker.skip_steady:
            prev_refined = Pose(window.poses.q[-2], window.poses.t[-2])
            motion = se3.compose(se3.inverse(prev_refined), refined)
        return (window, refined, motion, desk, pred, solve, tuple(outliers),
                trk_eig)

    def _chunked_impl(self, carry, imgs_stacked):
        """lax.scan over K sweeps of the fused steady-path step (single- or
        multi-lidar). carry = (window, world_pose, motion0, prev_feat0);
        imgs_stacked = one (or a tuple of L) pytrees with a leading K axis."""
        L = self.cfg.rig.n_lidars

        def step(c, xs):
            window, world, motion, prev = c
            if L == 1:
                (window, refined, mot, desk, pred, solve,
                 outlier, _) = self._fused_step_impl(
                    window, world, motion, prev, xs)
                outliers = (outlier,)
            else:
                (window, refined, mot, desk, pred, solve,
                 outliers, _) = self._fused_multi_impl(
                    window, world, motion, prev, xs)
            ys = (refined.q, refined.t, pred.q, pred.t, solve.cost,
                  solve.n_corner, solve.n_surf, outliers)
            return (window, refined, mot, desk), ys

        return jax.lax.scan(step, carry, imgs_stacked)

    def process_chunk(self, imgs_stacked):
        """Process K synchronized sweeps in ONE device dispatch (replay
        mode). Preconditions: the steady fused path must be active (warm
        window, pure odometry) — exactly the conditions of the fast paths in
        ``process``. ``imgs_stacked``: for L==1 a RangeImage/PackedFrame
        pytree with a leading K axis; for L>1 a tuple of L such pytrees.

        Returns per-frame stacked (pose_q [K,4], pose_t [K,3], pred_q,
        pred_t, cost, n_corner, n_surf). State advances exactly as K
        ``process`` calls would (same programs, same order — bit-identical).
        """
        cfg = self.cfg
        L = cfg.rig.n_lidars
        assert self.ext_mode == 0 and self.prev_feats[0] is not None \
            and self.frame_idx >= cfg.odometry.window_size, \
            "process_chunk requires the steady pure-odometry phase"
        carry = (self.window, self.world_pose, self.motions[0],
                 self.prev_feats[0])
        carry, ys = self._chunked(carry, imgs_stacked)
        self.window, self.world_pose, self.motions[0], self.prev_feats[0] = (
            carry[0], carry[1], carry[2], carry[3]
        )
        (q, t, pq, pt, cost, nc, ns, outliers) = ys
        k = q.shape[0]
        self.frame_idx += int(k)
        self.last_outlier = [
            jax.tree.map(lambda x: x[-1], o) for o in outliers
        ]
        return q, t, pq, pt, cost, nc, ns

    # ---------------- host orchestration ----------------

    def _window_fn(self):
        if self.ext_mode == 2:
            return self._window_ref
        if self.ext_mode == 1:
            return self._window_calib
        return self._window_all

    def _try_init_calib(self):
        """Hand-eye solve for every non-ref lidar; install on convergence."""
        cfg = self.cfg
        L = cfg.rig.n_lidars
        exts, ok = [Pose.identity()], True
        for l in range(1, L):
            est, rsol = self._calibrate(self.calib_buffers[l])
            if bool(rsol.converged):
                exts.append(est)
            else:
                ok = False
                break
        if ok:
            ext = Pose(jnp.stack([e.q for e in exts]),
                       jnp.stack([e.t for e in exts]))
            self.window = E.set_extrinsics(self.window, ext)
            self.window = E.reset_prior(self.window, cfg, calibrate_ext=True)
            self.ext_mode = 1

    def _collect_calib_sample(self, solve):
        """evalCalib voting (estimator.cpp:1682-1734): collect extrinsic
        samples whenever the extrinsic Hessian blocks are well-conditioned;
        freeze the Lie mean after n_calib_samples."""
        cfg = self.cfg
        L = cfg.rig.n_lidars
        n_opt = cfg.odometry.opt_window_size + 1
        eig = np.asarray(solve.eig_min)
        done = True
        for l in range(1, L):
            lam = eig[n_opt + (l - 1)]
            if lam > cfg.calib.lambda_threshold:
                self.ext_samples[l].append(
                    (np.asarray(self.window.ext.q[l]),
                     np.asarray(self.window.ext.t[l]))
                )
            if len(self.ext_samples[l]) < cfg.calib.n_calib_samples:
                done = False
        if done:
            exts_q, exts_t, covs = [np.array([1.0, 0, 0, 0])], [np.zeros(3)], []
            for l in range(1, L):
                qs = jnp.asarray(np.stack([s[0] for s in self.ext_samples[l]]))
                ts = jnp.asarray(np.stack([s[1] for s in self.ext_samples[l]]))
                # drop the first third (reference computeMeanPose)
                k = qs.shape[0] // 3
                mu = se3.mean_pose(Pose(qs[k:], ts[k:]))
                cov = se3.tangent_scatter(Pose(qs[k:], ts[k:]), mu)
                exts_q.append(np.asarray(mu.q))
                exts_t.append(np.asarray(mu.t))
                covs.append(np.asarray(cov))
            ext = Pose(jnp.asarray(np.stack(exts_q)), jnp.asarray(np.stack(exts_t)))
            self.ext_cov = np.stack(covs)
            self.window = E.set_extrinsics(self.window, ext)
            self.window = E.reset_prior(self.window, cfg, calibrate_ext=False)
            self.ext_mode = 0

    def process(self, imgs: list[RangeImage]) -> OdometryOutput:
        cfg = self.cfg
        L = cfg.rig.n_lidars
        assert len(imgs) == L

        # fast path: steady multi-lidar pure odometry — one dispatch per sweep
        if (
            self._fused_multi is not None
            and self.ext_mode == 0
            and self.prev_feats[0] is not None
            and self.frame_idx >= cfg.odometry.window_size
        ):
            (self.window, refined, motion, desk, pred,
             solve, outliers, trk_eig) = self._fused_multi(
                self.window, self.world_pose, self.motions[0],
                self.prev_feats[0], tuple(imgs),
            )
            self.motions[0] = motion
            self.prev_feats[0] = desk
            self.last_outlier = list(outliers)
            self.world_pose = refined
            self.frame_idx += 1
            return OdometryOutput(
                pose=refined, pose_predict=pred, extrinsics=self.window.ext,
                ext_mode=self.ext_mode, cost=solve.cost,
                n_corner=solve.n_corner, n_surf=solve.n_surf,
                win_eig=solve.eig_blocks, trk_eig=trk_eig,
                win_frozen=solve.frozen, win_eig_shared=solve.eig_shared,
                win_weak_dir=solve.weak_dir,
                win_support_neff=solve.support_neff,
            )

        # fast path: steady single-lidar odometry — one dispatch per sweep
        if (
            self._fused is not None
            and self.prev_feats[0] is not None
            and self.frame_idx >= cfg.odometry.window_size
        ):
            (self.window, refined, motion, desk, pred,
             solve, outlier0, trk_eig) = self._fused(
                self.window, self.world_pose, self.motions[0],
                self.prev_feats[0], imgs[0],
            )
            self.motions[0] = motion
            self.prev_feats[0] = desk
            self.last_outlier[0] = outlier0
            self.world_pose = refined
            self.frame_idx += 1
            return OdometryOutput(
                pose=refined, pose_predict=pred, extrinsics=self.window.ext,
                ext_mode=self.ext_mode, cost=solve.cost,
                n_corner=solve.n_corner, n_surf=solve.n_surf,
                win_eig=solve.eig_blocks, trk_eig=trk_eig,
                win_frozen=solve.frozen, win_eig_shared=solve.eig_shared,
                win_weak_dir=solve.weak_dir,
                win_support_neff=solve.support_neff,
            )

        ffs, corners, surfs = [], [], []
        with timing.timer("odom_mea_pre"):
            for l, img in enumerate(imgs):
                ff, c, s, o = self._frontends[l](img)
                ffs.append(ff)
                corners.append(c)
                surfs.append(s)
                self.last_outlier[l] = o
            _sync(surfs)

        if self.prev_feats[0] is None:
            self.prev_feats = ffs
            pose = self.world_pose
            self.window = self._push_first(
                self.window, pose, tuple(corners), tuple(surfs)
            )
            self.frame_idx += 1
            return OdometryOutput(
                pose=pose, pose_predict=pose, extrinsics=self.window.ext,
                ext_mode=self.ext_mode, cost=jnp.asarray(0.0),
                n_corner=jnp.asarray(0), n_surf=jnp.asarray(0),
            )

        # --- scan-to-scan tracking (primary always; all lidars in mode 2)
        with timing.timer("odom_tracker"):
            res0, desk0 = self._track(self.prev_feats[0], ffs[0], self.motions[0])
            _sync(res0)
        self.motions[0] = res0.pose
        new_prev = [desk0]
        mode2 = self.ext_mode == 2
        if mode2:
            self.pair_accum[0] = self._compose(self.pair_accum[0], res0.pose)
            for l in range(1, L):
                res_l, desk_l = self._track(
                    self.prev_feats[l], ffs[l], self.motions[l]
                )
                self.motions[l] = res_l.pose
                new_prev.append(desk_l)
                self.pair_accum[l] = self._compose(
                    self.pair_accum[l], res_l.pose
                )
            if self.frame_idx % cfg.calib.pair_stride == 0:
                for l in range(1, L):
                    self.calib_buffers[l] = self._add_pair(
                        self.calib_buffers[l], self.pair_accum[0],
                        self.pair_accum[l],
                    )
                self.pair_accum = [Pose.identity() for _ in range(L)]
                self._try_init_calib()
        else:
            new_prev += ffs[1:]
        self.prev_feats = new_prev

        step_args = (
            self.window, self.world_pose, res0.pose, tuple(self.motions),
            tuple(corners), tuple(surfs),
        )
        warm = self.frame_idx >= cfg.odometry.window_size
        if warm:
            with timing.timer("odom_solver"):
                self.window, solve, pred, refined = self._window_fn()(
                    *step_args, mode2=mode2
                )
                _sync(solve)
            self.world_pose = refined
            if self.ext_mode == 1:
                self._collect_calib_sample(solve)
            out = OdometryOutput(
                pose=refined, pose_predict=pred, extrinsics=self.window.ext,
                ext_mode=self.ext_mode, cost=solve.cost,
                n_corner=solve.n_corner, n_surf=solve.n_surf,
                win_eig=solve.eig_blocks, trk_eig=res0.eig,
                win_frozen=solve.frozen, win_eig_shared=solve.eig_shared,
                win_weak_dir=solve.weak_dir,
                win_support_neff=solve.support_neff,
            )
        else:
            self.window, pred = self._push_only(*step_args, mode2=mode2)
            self.world_pose = pred
            out = OdometryOutput(
                pose=pred, pose_predict=pred, extrinsics=self.window.ext,
                ext_mode=self.ext_mode, cost=res0.cost,
                n_corner=res0.n_edge, n_surf=res0.n_plane,
                trk_eig=res0.eig,
            )
        self.frame_idx += 1
        return out


class FullOutput(NamedTuple):
    odom: OdometryOutput
    map_pose: Pose            # map <- base (best available estimate)
    map_cov: jnp.ndarray | None
    mapped: bool              # whether the mapper ran this sweep
    # smallest eigenvalue of the scan-to-map Hessian on mapped sweeps
    # (the mapper's degeneracy probe, lidar_mapper_keyframe.cpp:1172-1204);
    # None on pass-through sweeps
    map_eig_min: jnp.ndarray | None = None
    # device-side bool: the mapper inserted a keyframe this sweep (None on
    # pass-through sweeps). NOT fetched here — SlamPipeline reads it one
    # sweep later so the keyframe path never blocks on the mapper program
    inserted_kf: jnp.ndarray | None = None
    # directions the mapper's remap actually froze this sweep (trace
    # deficit of the applied projector; None on pass-through sweeps)
    map_frozen: jnp.ndarray | None = None


class FullPipeline:
    """Odometry + uncertainty-aware keyframe mapping.

    Counterpart of the reference's two-process layout (odometry node +
    lidar_mapper_keyframe node): the mapper consumes every
    ``mapping.skip_frames``-th sweep (SKIP_NUM_ODOM_PUB semantics,
    lidar_mapper_keyframe.cpp:1256) and maintains the map<-odom drift
    correction; between mapping updates the corrected odometry pose is
    reported (the reference's high-frequency prediction path :205-234).
    """

    def __init__(self, cfg: MloamConfig):
        from mloam_tpu.mapping import mapper as MP

        self.cfg = cfg
        self.odom = OdometryPipeline(cfg)
        self.mapper_state = MP.init_state(cfg)
        self._mapper_step = jax.jit(
            functools.partial(MP.mapper_step, cfg=cfg)
        )
        self._merge = jax.jit(self._merge_impl)
        self._merge_outlier = jax.jit(self._merge_outlier_impl)
        # whether the calibrated extrinsic covariance has been installed
        # into the mapper (the reference mapper reads it live off the
        # /extrinsics topic once status drops to 0,
        # lidar_mapper_keyframe.cpp:1028-1046)
        self._ext_cov_installed = False
        # last mapped sweep's merged (corner, surf) base-frame clouds
        self.last_merged = None

    def _install_ext_cov(self):
        """Plumb the frozen calibration covariance (OdometryPipeline.ext_cov,
        set at the ESTIMATE_EXTRINSIC 1->0 transition) into the mapper —
        from then on uncertainty-aware mapping runs on the CALIBRATED
        extrinsic uncertainty instead of the config prior."""
        L = self.cfg.rig.n_lidars
        ec = np.zeros((L, 6, 6), np.float32)
        ec[1:] = np.asarray(self.odom.ext_cov)
        self.mapper_state = self.mapper_state._replace(
            ext_cov=jnp.asarray(ec)
        )
        self._ext_cov_installed = True

    def _merge_outlier_impl(self, ext: Pose, outliers: tuple):
        """Project per-lidar outlier clouds through the extrinsics into the
        base frame and concatenate (same as _merge but for the raw outlier
        lists held outside the window)."""
        from mloam_tpu.frontend.features import FeatCloud

        parts = []
        for l, fc in enumerate(outliers):
            El = Pose(ext.q[l], ext.t[l])
            parts.append(fc._replace(xyz=se3.transform_points(El, fc.xyz)))
        return FeatCloud(
            xyz=jnp.concatenate([p.xyz for p in parts]),
            mask=jnp.concatenate([p.mask for p in parts]),
            time=jnp.concatenate([p.time for p in parts]),
            ring=jnp.concatenate([p.ring for p in parts]),
        )

    def _merge_impl(self, ext: Pose, corner_stack, surf_stack):
        """Slice the newest window slot per lidar, project through the
        extrinsics into the base frame, concatenate. Entirely inside jit
        (eager slicing costs ~40 ms/op on the axon tunnel)."""
        from mloam_tpu.frontend.features import FeatCloud

        L = self.cfg.rig.n_lidars

        def proj(stack):
            parts = []
            for l in range(L):
                fc = jax.tree.map(lambda x: x[-1, l], stack)
                El = Pose(ext.q[l], ext.t[l])
                parts.append(fc._replace(
                    xyz=se3.transform_points(El, fc.xyz)
                ))
            return FeatCloud(
                xyz=jnp.concatenate([p.xyz for p in parts]),
                mask=jnp.concatenate([p.mask for p in parts]),
                time=jnp.concatenate([p.time for p in parts]),
                ring=jnp.concatenate([p.ring for p in parts]),
            )

        return proj(corner_stack), proj(surf_stack)

    def process(self, imgs: list[RangeImage]) -> FullOutput:
        cfg = self.cfg
        out = self.odom.process(imgs)
        if not self._ext_cov_installed and self.odom.ext_cov is not None:
            self._install_ext_cov()
        idx = self.odom.frame_idx - 1  # frame just processed
        run_map = (
            idx % cfg.mapping.skip_frames == 0
            and idx >= cfg.odometry.window_size
        )
        if run_map:
            corner_b, surf_b = self._merge(
                self.odom.window.ext, self.odom.window.corner,
                self.odom.window.surf,
            )
            outlier_b = self._merge_outlier(
                self.odom.window.ext, tuple(self.odom.last_outlier)
            )
            self.mapper_state, mout = self._mapper_step(
                self.mapper_state, out.pose, corner_b, surf_b,
                outlier=outlier_b,
            )
            # cache this sweep's merged clouds for SlamPipeline's deferred
            # keyframe handling (avoids re-dispatching _merge there)
            self.last_merged = (corner_b, surf_b)
            return FullOutput(
                odom=out, map_pose=mout.pose, map_cov=mout.cov, mapped=True,
                map_eig_min=mout.eig_min, inserted_kf=mout.inserted_kf,
                map_frozen=mout.frozen,
            )
        map_pose = self.odom._compose(self.mapper_state.pose_map_odom, out.pose)
        return FullOutput(odom=out, map_pose=map_pose, map_cov=None,
                          mapped=False)


class SlamOutput(NamedTuple):
    full: FullOutput
    loop_found: bool
    n_loops: int


class SlamPipeline:
    """Complete system: odometry + mapping + loop closure.

    Counterpart of the reference's three-process layout (SURVEY §1):
    odometry node ∥ mapping node ∥ loop_closure_node, here three groups of
    jitted programs sharing one host loop. Keyframes inserted by the mapper
    feed the loop graph every ``loop.skip_interval``-th insertion
    (loop_closure_node.cpp:273-284); accepted loops trigger pose-graph
    optimization. As in the reference, the loop-corrected trajectory is a
    separate output (the mapper's incremental frame is not rewritten;
    updateKeyframe is a stub there too, lidar_mapper_keyframe.cpp:685).
    """

    def __init__(self, cfg: MloamConfig, loop_capacity: int | None = None):
        from mloam_tpu.loop import posegraph as PGraph

        self.cfg = cfg
        self.full = FullPipeline(cfg)
        self.loop_state = PGraph.init_state(
            loop_capacity if loop_capacity is not None else cfg.loop.capacity,
            cfg.rig.n_lidars * cfg.odometry.cap_frame_corner,
            cfg.rig.n_lidars * cfg.odometry.cap_frame_surf,
            cfg.loop,
        )
        self._PGraph = PGraph
        self.kf_counter = 0
        self.n_loops = 0
        # host mirror of loop_state.count (add_keyframe increments it iff
        # below capacity) — tracking it here removes the blocking
        # device_get(count) from the keyframe sweep
        self._loop_capacity = int(
            loop_capacity if loop_capacity is not None else cfg.loop.capacity)
        self.loop_kf_count = 0
        # pending detections awaiting temporal consistency:
        # list of (query_idx, cand_idx, zq, zt, correction_t [3])
        self._pending_loops: list = []
        # in-flight detect/verify submission: (q_idx, found, cand, zq, zt)
        # device arrays, fetched one sweep later (see _drain_verify)
        self._pending_verify = None
        # deferred keyframe handling: (inserted_kf device flag, map pose,
        # merged clouds) from the last mapped sweep — the flag is read one
        # sweep later, when the mapper program has long finished, so the
        # keyframe sweep never blocks on its own mapper dispatch (the
        # blocking device_get handshake costs 30-60 ms on the tunnel)
        self._pending_kf = None
        self._add_kf = jax.jit(
            functools.partial(PGraph.add_keyframe, cfg=cfg.loop)
        )
        self._try_loop = jax.jit(
            functools.partial(
                PGraph.try_close_loop, lcfg=cfg.loop, cfg=cfg,
                use_global_reg=cfg.loop.use_global_registration,
            )
        )
        self._record = jax.jit(PGraph.record_loop)
        self._optimize = jax.jit(
            functools.partial(PGraph.optimize, iters=cfg.loop.pgo_gn_iters,
                              dof4=cfg.loop.dof4)
        )

    def _loop_correction_t(self, q_idx: int, cand: int, zt) -> np.ndarray:
        """Translation the loop edge would apply to the query keyframe:
        (T_cand ∘ Z).t − T_query.t. Used by the temporal-consistency gate."""
        qs = np.asarray(jax.device_get(self.loop_state.poses.q))
        ts = np.asarray(jax.device_get(self.loop_state.poses.t))
        w, x, y, z = qs[cand]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        return R @ np.asarray(jax.device_get(zt)) + ts[cand] - ts[q_idx]

    def _accept_loop(self, q_idx: int, cand: int, zq, zt) -> bool:
        """Temporal-consistency gate: require ``temporal_consistency_n``
        detections implying the same drift correction (within tol meters)
        before committing edges + running PGO. With n=1 (default, matching
        the reference's pass-through checkTemporalConsistency) every
        verified detection is committed immediately."""
        cfg = self.cfg
        corr = self._loop_correction_t(q_idx, cand, zt)
        window = 2 * max(cfg.loop.skip_interval, 1) + 2
        self._pending_loops = [
            p for p in self._pending_loops if q_idx - p[0] <= window
        ]
        self._pending_loops.append((q_idx, cand, zq, zt, corr))
        consistent = [
            p for p in self._pending_loops
            if np.linalg.norm(p[4] - corr) < cfg.loop.temporal_consistency_tol
        ]
        if len(consistent) < max(cfg.loop.temporal_consistency_n, 1):
            return False
        for (qi, cj, pzq, pzt, _) in consistent:
            self.loop_state = self._record(
                self.loop_state, jnp.asarray(True), jnp.asarray(cj),
                jnp.asarray(qi), pzq, pzt,
            )
        self._pending_loops = []
        self.loop_state = self._optimize(self.loop_state)
        self.n_loops += len(consistent)
        return True

    def corrected_trajectory(self):
        """Loop-corrected keyframe trajectory (valid prefix).

        Drains the in-flight keyframe handling and loop verification first
        (both are pipelined one sweep behind, so the final keyframe and
        its loop would be silently dropped at the end of a sequence for
        callers that never call :meth:`flush`)."""
        self.flush()
        n = int(self.loop_state.count)
        return (
            np.asarray(self.loop_state.poses.t[:n]),
            np.asarray(self.loop_state.poses.q[:n]),
        )

    def _drain_verify(self) -> bool:
        """Fetch the PREVIOUS sweep's loop detect/verify result (submitted
        asynchronously last keyframe) and commit any accepted loop.

        The reference runs detection+verification in its own process
        (loop_closure_node) so it never blocks the odometry/mapping rate;
        here the same decoupling is one sweep of pipelining: the verify
        program's device time overlaps the NEXT sweep's host work, and the
        only synchronous cost left on the keyframe path is this small
        fetch. Detection latency grows by one sweep — the reference's
        cross-process queues delay it far more."""
        if self._pending_verify is None:
            return False
        q_idx_host, found, cand, zq, zt = self._pending_verify
        self._pending_verify = None
        if bool(jax.device_get(found)):
            return self._accept_loop(
                q_idx_host, int(jax.device_get(cand)), zq, zt)
        return False

    def _drain_kf(self):
        """Handle the PREVIOUS mapped sweep's keyframe insertion: read its
        inserted flag (ready by now — no blocking on in-flight work), and
        if the mapper inserted a loop-interval keyframe, push it into the
        loop graph and submit detection/verification asynchronously.

        This is the second pipelining stage of the loop path (the first is
        _drain_verify): the reference runs the whole loop module in its
        own process (loop_closure_node.cpp:167-291); here each keyframe's
        scan-context insert + detect/verify ride one-sweep-delayed device
        dispatches, so the keyframe sweep costs only its own mapped
        dispatch plus two async submissions — no device round trips."""
        cfg = self.cfg
        if self._pending_kf is None:
            return
        ins_flag, map_pose, merged = self._pending_kf
        self._pending_kf = None
        if not bool(jax.device_get(ins_flag)):
            return
        self.kf_counter += 1
        if self.kf_counter % max(cfg.loop.skip_interval, 1) != 0:
            return
        corner_b, surf_b = merged
        self.loop_state = self._add_kf(
            self.loop_state, map_pose, corner_b, surf_b
        )
        if self.loop_kf_count < self._loop_capacity:
            self.loop_kf_count += 1
        q_idx_host = self.loop_kf_count - 1
        if q_idx_host > cfg.loop.num_exclude_recent:
            # submit detection+verification WITHOUT fetching — the
            # result is drained at the next sweep
            found, cand, zq, zt, dist, reg = self._try_loop(
                self.loop_state, jnp.asarray(q_idx_host)
            )
            self._pending_verify = (q_idx_host, found, cand, zq, zt)

    def process(self, imgs: list[RangeImage]) -> SlamOutput:
        out = self.full.process(imgs)
        loop_found = self._drain_verify()
        self._drain_kf()
        if out.mapped and out.inserted_kf is not None:
            self._pending_kf = (out.inserted_kf, out.map_pose,
                                self.full.last_merged)
        return SlamOutput(full=out, loop_found=loop_found,
                          n_loops=self.n_loops)

    def flush(self) -> bool:
        """Drain the in-flight keyframe handling and loop verification
        (end of sequence)."""
        found = self._drain_verify()
        self._drain_kf()
        return self._drain_verify() or found
