"""Point-cloud tensor schema: fixed-capacity padded clouds + masks.

The reference passes around ``pcl::PointCloud`` with dynamic sizes and a
``cloudFeature = map<string, PointICloud>`` bundle (``parameters.h:161``).
Here every cloud is a statically-shaped array set, so the whole pipeline jits
once per capacity class. Invalid slots are masked, never trimmed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose


class Cloud(NamedTuple):
    """Flat padded cloud. xyz [N,3]; mask [N] bool; attr [N] (intensity or
    relative sweep time, feature-dependent)."""

    xyz: jnp.ndarray
    mask: jnp.ndarray
    attr: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "Cloud":
        return Cloud(
            jnp.zeros((n, 3), dtype), jnp.zeros((n,), bool), jnp.zeros((n,), dtype)
        )


class CovCloud(NamedTuple):
    """Cloud with per-point 3x3 covariance (reference ``PointXYZIWithCov``,
    ``mloam_pcl/.../point_with_cov.hpp:45-111``)."""

    xyz: jnp.ndarray   # [N, 3]
    cov: jnp.ndarray   # [N, 3, 3]
    mask: jnp.ndarray  # [N]
    attr: jnp.ndarray  # [N]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "CovCloud":
        return CovCloud(
            jnp.zeros((n, 3), dtype),
            jnp.zeros((n, 3, 3), dtype),
            jnp.zeros((n,), bool),
            jnp.zeros((n,), dtype),
        )


def transform_cloud(pose: Pose, c: Cloud) -> Cloud:
    return c._replace(xyz=se3.transform_points(pose, c.xyz))


def deskew(xyz: jnp.ndarray, s: jnp.ndarray, motion: Pose) -> jnp.ndarray:
    """Motion-compensate points to sweep start.

    ``motion`` is the full-sweep relative pose (start <- end frame motion of
    the sensor, i.e. T such that p_start = scale(T, s) · p). ``s`` [N] is the
    per-point relative sweep time in [0,1]. Matches the reference's
    ``TransformToStart`` slerp semantics (``utility.h:55-101``) without the
    intensity-encoding trick — time is a first-class channel here.
    """
    frac = se3.scale(motion, s)  # batched poses [N]
    from mloam_tpu.core import rotations as rot

    return rot.quat_rotate(frac.q, xyz) + frac.t


def merge_clouds(a: Cloud, b: Cloud) -> Cloud:
    return Cloud(
        jnp.concatenate([a.xyz, b.xyz]),
        jnp.concatenate([a.mask, b.mask]),
        jnp.concatenate([a.attr, b.attr]),
    )
