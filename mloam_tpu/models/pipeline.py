"""End-to-end odometry pipeline assembly (host-side orchestration around
jitted device programs).

Counterpart of the reference's per-platform ROS nodes + ``Estimator::
inputCloud/processMeasurements`` wiring (``estimator/src/rosNode*.cpp``,
``estimator.cpp:213-281,343-374``): here a plain Python class owning three
jitted programs — frontend (segment + extract), tracker step, window step —
and the small host state machine (INITIAL → NON_LINEAR, reference
estimator.cpp:499-530).

All device programs have fixed shapes; each compiles exactly once per
(lidar model, config) pair.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.config import MloamConfig
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend import features as F
from mloam_tpu.frontend import segmentation as S
from mloam_tpu.frontend.features import FeatureFrame, downsample_featcloud
from mloam_tpu.odometry import estimator as E
from mloam_tpu.odometry import tracker as TR


class OdometryOutput(NamedTuple):
    pose: Pose            # world <- base at sweep start (refined)
    pose_predict: Pose    # tracker-only prediction (high-rate path)
    cost: jnp.ndarray
    n_corner: jnp.ndarray
    n_surf: jnp.ndarray


class OdometryPipeline:
    """Single- or multi-LiDAR odometry front-to-back (no mapping backend).

    Call ``process(imgs)`` once per sweep with a list of RangeImages (one per
    lidar, synchronized). Returns an OdometryOutput.
    """

    def __init__(self, cfg: MloamConfig):
        self.cfg = cfg
        L = cfg.rig.n_lidars
        self.frame_idx = 0
        self.window = E.init_window(
            cfg, cfg.odometry.cap_frame_corner, cfg.odometry.cap_frame_surf
        )
        self.prev_feats: list[FeatureFrame | None] = [None] * L
        self.motion: Pose = Pose.identity()  # prev <- curr (per-sweep)
        self.world_pose: Pose = Pose.identity()

        self._frontends = [
            jax.jit(functools.partial(self._frontend_impl, model_idx=l))
            for l in range(L)
        ]
        self._track = jax.jit(self._track_impl)
        self._window_step = jax.jit(self._window_step_impl)
        self._push_only = jax.jit(self._push_only_impl)
        self._deskew = jax.jit(
            lambda fc, T: TR.deskew_features(T, fc)
        )

    # ---------------- device programs ----------------

    def _frontend_impl(self, img: RangeImage, model_idx: int = 0):
        model = self.cfg.rig.models[model_idx]
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
        return ff, corner, surf

    def _track_impl(self, prev: FeatureFrame, curr: FeatureFrame, T: Pose):
        return TR.track(prev, curr, T, self.cfg.tracker)

    def _push_only_impl(self, window, pose, corner, surf):
        return E.push_frame(window, pose, corner, surf, self.cfg)

    def _window_step_impl(self, window, pose, corner, surf):
        window = E.push_frame(window, pose, corner, surf, self.cfg)
        window, solve = E.optimize_window(window, self.cfg)
        window = E.marginalize_pivot(window, solve, self.cfg)
        return window, solve

    # ---------------- host orchestration ----------------

    def process(self, imgs: list[RangeImage]) -> OdometryOutput:
        cfg = self.cfg
        L = cfg.rig.n_lidars
        assert len(imgs) == L
        # frontend + tracking on the primary lidar
        ffs, corners, surfs = [], [], []
        for l, img in enumerate(imgs):
            ff, c, s = self._frontends[l](img)
            ffs.append(ff)
            corners.append(c)
            surfs.append(s)

        if self.prev_feats[0] is None:
            # first sweep: identity pose, seed the tracker targets
            self.prev_feats = ffs
            pose = self.world_pose
            corner = jax.tree.map(lambda *x: jnp.stack(x), *corners)
            surf = jax.tree.map(lambda *x: jnp.stack(x), *surfs)
            self.window = self._push_only(self.window, pose, corner, surf)
            self.frame_idx += 1
            return OdometryOutput(
                pose=pose, pose_predict=pose,
                cost=jnp.asarray(0.0), n_corner=jnp.asarray(0), n_surf=jnp.asarray(0),
            )

        res, deskewed0 = self._track(self.prev_feats[0], ffs[0], self.motion)
        self.motion = res.pose
        self.prev_feats = [deskewed0] + ffs[1:]
        pred = se3.compose(self.world_pose, res.pose)

        # de-skew window features with the tracked sweep motion (per lidar,
        # through its extrinsic: motion_l = E_l^-1 ∘ motion ∘ E_l)
        if cfg.tracker.deskew:
            ext = self.window.ext
            for l in range(L):
                El = Pose(ext.q[l], ext.t[l])
                m_l = se3.compose(se3.compose(se3.inverse(El), res.pose), El)
                corners[l] = self._deskew(corners[l], m_l)
                surfs[l] = self._deskew(surfs[l], m_l)
        corner = jax.tree.map(lambda *x: jnp.stack(x), *corners)
        surf = jax.tree.map(lambda *x: jnp.stack(x), *surfs)

        warm = self.frame_idx >= cfg.odometry.window_size
        if warm:
            self.window, solve = self._window_step(self.window, pred, corner, surf)
            refined = Pose(self.window.poses.q[-1], self.window.poses.t[-1])
            # keep the tracker's motion but adopt the refined world pose
            self.world_pose = refined
            out = OdometryOutput(
                pose=refined, pose_predict=pred, cost=solve.cost,
                n_corner=solve.n_corner, n_surf=solve.n_surf,
            )
        else:
            self.window = self._push_only(self.window, pred, corner, surf)
            self.world_pose = pred
            out = OdometryOutput(
                pose=pred, pose_predict=pred, cost=res.cost,
                n_corner=res.n_edge, n_surf=res.n_plane,
            )
        self.frame_idx += 1
        return out
