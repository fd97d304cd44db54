"""Keyframe-sharded map assembly: the distributed mapping backend path.

BASELINE's north star shards keyframes and map blocks across hosts. Here the
keyframe ring (mapping/keyframes.KeyframeDB) is sharded on its keyframe axis
over a device mesh; the surround-map query becomes an SPMD program:

  * every device radius-tests and top-M-selects within its own shard,
  * projects the selected keyframes' clouds to the map frame with the
    Barfoot covariance pushforward (same math as the single-chip mapper),
  * `all_gather` over the mesh axis assembles the full surround cloud.

The gathered cloud feeds the same uncertainty-weighted voxel reduction and
scan-to-map GN as the single-chip path. On a pod slice the gather rides
ICI/DCN; on the virtual CPU mesh the tests validate exact equivalence with
the single-device assembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mloam_tpu.core import se3, uncertainty
from mloam_tpu.core.se3 import Pose
from mloam_tpu.frontend.features import FeatCloud
from mloam_tpu.mapping import keyframes as KF
from mloam_tpu.parallel.mesh import MAP_AXIS, data_axes


def shard_db(db: KF.KeyframeDB, mesh: Mesh) -> KF.KeyframeDB:
    """Lay the keyframe axis out over ALL mesh axes (K must divide by
    mesh.devices.size; capacities are configured that way). On a 2-D
    (host, map) mesh from make_multihost_mesh this places contiguous
    keyframe blocks per host — the multi-host keyframe sharding of the
    BASELINE north star (DCN only at the gather)."""
    sharding = jax.sharding.NamedSharding(mesh, P(data_axes(mesh)))

    def place(x):
        if x.ndim == 0:
            return jax.device_put(
                x, jax.sharding.NamedSharding(mesh, P())
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(place, db)


def sharded_surround_map(
    db: KF.KeyframeDB,
    center: jnp.ndarray,
    radius: float,
    m_per_shard: int,
    ext_cov: jnp.ndarray,
    cov_meas: jnp.ndarray,
    mesh: Mesh,
    use_corner: bool = False,
):
    """Assemble the world-frame surround cov-cloud from a sharded DB.

    Returns (xyz [n_dev * m_per_shard * N, 3], cov [..., 3, 3], mask) —
    fixed shapes, gathered on every device (replicated output).
    """
    stack_name = "corner" if use_corner else "surf"
    axes = data_axes(mesh)

    db_specs = jax.tree.map(
        lambda x: P(axes) if x.ndim >= 1 else P(), db
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(db_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(db_shard: KF.KeyframeDB, c):
        idx, ok = KF.surrounding(db_shard, c, radius, m_per_shard)
        stack: FeatCloud = getattr(db_shard, stack_name)
        xyz = stack.xyz[idx]
        mask = stack.mask[idx] & ok[:, None]
        q = db_shard.poses.q[idx]
        t = db_shard.poses.t[idx]
        cov_pose = db_shard.cov[idx]

        def per_kf(q, t, cp, x, m):
            pose = Pose(q, t)
            y = se3.transform_points(pose, x)
            cov_pt = uncertainty.point_cov_pushforward(
                x, pose, cp + ext_cov, cov_meas
            )
            return y, cov_pt, m

        y, cov_pt, m = jax.vmap(per_kf)(q, t, cov_pose, xyz, mask)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        # gather each device's shard contribution; tiled => concatenated.
        # On a (host, map) mesh the gather is hierarchical: ICI within
        # hosts, one DCN exchange across.
        return (
            jax.lax.all_gather(flat(y), axes, tiled=True),
            jax.lax.all_gather(flat(cov_pt), axes, tiled=True),
            jax.lax.all_gather(flat(m), axes, tiled=True),
        )

    return run(db, center)
