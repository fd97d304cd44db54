"""Device-mesh helpers.

The reference's "distributed backend" is ROS pub/sub on one machine (SURVEY
§5.8); the TPU-native replacement is SPMD over a jax.sharding.Mesh: factors
(edges, correspondences) are sharded across chips, per-chip partial normal
equations are reduced with psum over ICI, and the tiny dense solve is
replicated. These helpers centralize mesh construction so every program in
the framework agrees on axis names.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FACTOR_AXIS = "factor"   # data-parallel over factors/edges/correspondences
MAP_AXIS = "map"         # sharding of map blocks / keyframes


def make_mesh(n_devices: int | None = None, axis: str = FACTOR_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str = FACTOR_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
