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
HOST_AXIS = "host"       # cross-host axis (collectives ride DCN)


def make_mesh(n_devices: int | None = None, axis: str = FACTOR_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_multihost_mesh(n_hosts: int | None = None,
                        chips_per_host: int | None = None,
                        inner_axis: str = FACTOR_AXIS) -> Mesh:
    """2-D (host, chip) mesh for multi-host deployments.

    The inner axis maps to chips within a host (collectives ride ICI); the
    outer HOST_AXIS crosses hosts (DCN). Sharding a data axis over
    ``P((HOST_AXIS, inner_axis))`` and reducing with
    ``psum(..., (HOST_AXIS, inner_axis))`` makes XLA perform the in-host ICI
    reduction first and a single small DCN hop per host after — the layout
    rule from the scaling playbook. On a single host (or the virtual CPU
    mesh) the same program runs with both axes mapped onto local devices,
    which is how the 2-axis path is validated without a pod.
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(len({d.process_index for d in devs}), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    n = n_hosts * chips_per_host
    arr = np.asarray(devs[:n]).reshape(n_hosts, chips_per_host)
    return Mesh(arr, (HOST_AXIS, inner_axis))


def data_axes(mesh: Mesh) -> tuple[str, ...]:
    """All mesh axis names, for sharding a big data axis over the whole
    mesh (works for 1-D and multi-host 2-D meshes alike)."""
    return tuple(mesh.axis_names)


def shard_leading(mesh: Mesh, axis: str = FACTOR_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
