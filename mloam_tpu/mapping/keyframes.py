"""Keyframe database: fixed-capacity ring of posed feature clouds.

Counterpart of the reference mapper's keyframe bookkeeping
(``estimator/src/lidarMapper/lidar_mapper_keyframe.cpp``: ``saveKeyframe``
:641-683, surrounding-keyframe extraction :254-354) — kd-tree radius search
over keyframe positions becomes a masked distance test + top-M gather.

Clouds are stored in each keyframe's own base frame together with the 6x6
pose covariance; projection into the map frame (with covariance
pushforward, ``cloudUCTAssociateToMap`` :1116-1158) happens at extraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud


class KeyframeDB(NamedTuple):
    poses: Pose          # [K] world(map) <- base
    cov: jnp.ndarray     # [K, 6, 6] pose covariance
    corner: FeatCloud    # [K, Nc] base-frame corner features
    surf: FeatCloud      # [K, Ns]
    outlier: FeatCloud   # [K, No] segmentation rejects (map completeness,
    #                      reference /laser_cloud_outlier; not matched)
    valid: jnp.ndarray   # [K]
    head: jnp.ndarray    # scalar int32 ring cursor


def empty_db(k: int, cap_corner: int, cap_surf: int,
             cap_outlier: int = 0) -> KeyframeDB:
    def stack(cap):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape).copy(),
            FeatCloud.zeros(max(cap, 1)),
        )

    return KeyframeDB(
        poses=Pose.identity((k,)),
        cov=jnp.zeros((k, 6, 6)),
        corner=stack(cap_corner),
        surf=stack(cap_surf),
        outlier=stack(cap_outlier),
        valid=jnp.zeros((k,), bool),
        head=jnp.asarray(0, jnp.int32),
    )


def insert(db: KeyframeDB, pose: Pose, cov: jnp.ndarray,
           corner: FeatCloud, surf: FeatCloud,
           outlier: FeatCloud | None = None) -> KeyframeDB:
    """Ring-insert one keyframe (overwrites the oldest at capacity)."""
    k = db.valid.shape[0]
    i = db.head % k
    if outlier is None:
        outlier = jax.tree.map(lambda a: a[i], db.outlier)  # keep zeros
    return KeyframeDB(
        poses=Pose(db.poses.q.at[i].set(pose.q), db.poses.t.at[i].set(pose.t)),
        cov=db.cov.at[i].set(cov),
        corner=jax.tree.map(lambda a, n: a.at[i].set(n), db.corner, corner),
        surf=jax.tree.map(lambda a, n: a.at[i].set(n), db.surf, surf),
        outlier=jax.tree.map(lambda a, n: a.at[i].set(n), db.outlier, outlier),
        valid=db.valid.at[i].set(True),
        head=db.head + 1,
    )


def should_insert(pose: Pose, last_kf: Pose, dist_gate: float,
                  angle_gate_deg: float) -> jnp.ndarray:
    """Keyframe gating on relative motion (saveKeyframe :649-656)."""
    rel = se3.relative(last_kf, pose)
    d = jnp.linalg.norm(rel.t)
    ang = jnp.linalg.norm(se3.log(rel)[3:])
    return (d > dist_gate) | (ang > jnp.deg2rad(angle_gate_deg))


def surrounding(db: KeyframeDB, center: jnp.ndarray, radius: float,
                m: int):
    """Indices + mask of up to ``m`` keyframes within ``radius`` of
    ``center`` (closest first). ``m`` is clamped to the ring capacity —
    a small-capacity DB (scaled-down deployments, design-limit tests)
    must not break the fixed-shape select."""
    d2 = jnp.sum((db.poses.t - center[None]) ** 2, axis=-1)
    d2 = jnp.where(db.valid, d2, jnp.inf)
    m = min(m, int(d2.shape[0]))
    neg, idx = jax.lax.top_k(-d2, m)
    sel_d2 = -neg
    ok = jnp.isfinite(sel_d2) & (sel_d2 < radius * radius)
    return idx, ok
