"""Voxel-grid ops as sort + segment reductions (exact, statically shaped).

TPU-native replacements for PCL voxel filters used throughout the reference:
  * plain centroid downsampling (pcl::VoxelGrid, used in feature extraction
    ``feature_extract.cpp:282-285`` and local-map assembly)
  * uncertainty-weighted downsampling with covariance (the custom
    ``VoxelGridCovarianceMLOAM`` filter,
    ``mloam_pcl/.../voxel_grid_covariance_mloam_impl.hpp:284-333``)

Design: no kd-trees, no dynamic shapes. Points are keyed by their integer
voxel coordinate, lexicographically sorted, reduced with segment heads, and
compacted into a fixed-capacity output with a validity mask. Invalid points
sort to the tail via a valid-first sort key.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def voxel_coords(xyz: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """Integer voxel coordinate per point, [N, 3] int32 (exact, unbounded
    within int32 range — no bit packing, so no x64 requirement)."""
    return jnp.floor(xyz / leaf).astype(jnp.int32)


class VoxelReduction(NamedTuple):
    """Result of a voxel reduction, compacted to the input capacity.

    ``order`` and ``seg_id`` allow callers to push extra per-point payloads
    through the same reduction (segment-sum with the same ids).
    """

    num_voxels: jnp.ndarray      # scalar int32
    mask: jnp.ndarray            # [N] True for the first num_voxels slots
    order: jnp.ndarray           # [N] permutation sorting points by key
    seg_id: jnp.ndarray          # [N] voxel slot id per *sorted* point
    sorted_valid: jnp.ndarray    # [N] validity per sorted point


def voxel_reduce(ijk: jnp.ndarray, valid_in: jnp.ndarray,
                 packed: bool = False) -> VoxelReduction:
    """Group points by integer voxel coordinate; all shapes static.

    ``packed=False``: exact lexicographic sort (4 stable sort passes) —
    unbounded coordinate range, used for map-scale reductions.
    ``packed=True``: coordinates are re-based to their minimum and packed
    into one int32 key (10 bits/axis, grid up to 1024³ cells) — a single
    sort pass, ~4x cheaper. Out-of-grid cells clamp to the boundary (only
    relevant beyond 1024 cells span, i.e. >200 m at 0.2 m leaf) — the right
    trade for single-sweep downsampling.
    """
    if packed:
        base = jnp.min(jnp.where(valid_in[:, None], ijk, 2**30), axis=0)
        rel = jnp.clip(ijk - base[None], 0, 1023)
        key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
        key = jnp.where(valid_in, key, jnp.int32(2**30))
        order = jnp.argsort(key)
        sk3 = None
        sorted_key = key[order]
        valid = valid_in[order]
        differs = sorted_key[1:] != sorted_key[:-1]
    else:
        inv = (~valid_in).astype(jnp.int32)
        order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], inv))
        sk = ijk[order]
        valid = valid_in[order]
        differs = jnp.any(sk[1:] != sk[:-1], axis=-1)
    head = jnp.concatenate([valid[:1], differs & valid[1:]])
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1  # [-1 .. num-1]
    seg_id = jnp.maximum(seg_id, 0)
    num = jnp.sum(head.astype(jnp.int32))
    n = ijk.shape[0]
    out_mask = jnp.arange(n, dtype=jnp.int32) < num
    return VoxelReduction(num, out_mask, order, seg_id, valid)


def segment_mean(values: jnp.ndarray, red: VoxelReduction,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted mean of per-point payload over voxels.

    values: [N, ...] in *original* order; returns [N, ...] compacted (valid in
    the first num_voxels rows).
    """
    n = values.shape[0]
    v = values[red.order]
    w = jnp.ones((n,), values.dtype) if weights is None else weights[red.order]
    w = jnp.where(red.sorted_valid, w, 0.0)
    wv = v * w.reshape((n,) + (1,) * (values.ndim - 1))
    sums = jnp.zeros_like(values).at[red.seg_id].add(wv)
    wsum = jnp.zeros((n,), values.dtype).at[red.seg_id].add(w)
    return sums / jnp.maximum(wsum, 1e-12).reshape((n,) + (1,) * (values.ndim - 1))


def segment_sum(values: jnp.ndarray, red: VoxelReduction) -> jnp.ndarray:
    n = values.shape[0]
    v = values[red.order]
    v = jnp.where(
        red.sorted_valid.reshape((n,) + (1,) * (values.ndim - 1)), v, 0.0
    )
    return jnp.zeros_like(values).at[red.seg_id].add(v)


def voxel_downsample(xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     payload: jnp.ndarray | None = None,
                     packed: bool = False):
    """Centroid voxel filter. Returns (xyz_ds [N,3], mask_ds [N], payload_ds)."""
    red = voxel_reduce(voxel_coords(xyz, leaf), mask, packed=packed)
    out_xyz = segment_mean(xyz, red)
    out_payload = None if payload is None else segment_mean(payload, red)
    return out_xyz, red.mask, out_payload


def voxel_downsample_two_class(
    xyz_a: jnp.ndarray, mask_a: jnp.ndarray, leaf_a: float,
    xyz_b: jnp.ndarray, mask_b: jnp.ndarray, leaf_b: float,
):
    """Fused centroid filter over two point classes with ONE sort pass.

    The window local map needs corner and surf clouds filtered at different
    leaves (reference buildLocalMap voxel-filters each feature class,
    estimator.cpp:1194-1203); sorting them together (class in the key's high
    bit, 10 bits/axis re-based per class) nearly halves the serial sort
    latency of the per-sweep program. Class-a voxels sort first, so class-b
    output is a dynamic slice at a's voxel count.

    Returns (xyz_a_ds, mask_a_ds, xyz_b_ds, mask_b_ds), each input-capacity.
    """
    na, nb = xyz_a.shape[0], xyz_b.shape[0]
    n = na + nb

    def rel_coords(xyz, m, leaf):
        ijk = voxel_coords(xyz, leaf)
        base = jnp.min(jnp.where(m[:, None], ijk, 2**30), axis=0)
        return jnp.clip(ijk - base[None], 0, 1023)

    ra = rel_coords(xyz_a, mask_a, leaf_a)
    rb = rel_coords(xyz_b, mask_b, leaf_b)
    rel = jnp.concatenate([ra, rb])
    cls = jnp.concatenate([
        jnp.zeros((na,), jnp.int32), jnp.ones((nb,), jnp.int32)
    ])
    valid_in = jnp.concatenate([mask_a, mask_b])
    key = (cls << 30) | (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
    key = jnp.where(valid_in, key, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key)
    sorted_key = key[order]
    valid = valid_in[order]
    differs = sorted_key[1:] != sorted_key[:-1]
    head = jnp.concatenate([valid[:1], differs & valid[1:]])
    seg_id = jnp.maximum(jnp.cumsum(head.astype(jnp.int32)) - 1, 0)
    red = VoxelReduction(
        jnp.sum(head.astype(jnp.int32)),
        jnp.arange(n, dtype=jnp.int32) < jnp.sum(head.astype(jnp.int32)),
        order, seg_id, valid,
    )
    out = segment_mean(jnp.concatenate([xyz_a, xyz_b]), red)
    n_a = jnp.sum((head & (sorted_key < (1 << 30))).astype(jnp.int32))
    n_b = red.num_voxels - n_a
    xyz_a_ds = out[:na]
    mask_a_ds = jnp.arange(na, dtype=jnp.int32) < n_a
    xyz_b_ds = jax.lax.dynamic_slice(out, (n_a, 0), (nb, 3))
    mask_b_ds = jnp.arange(nb, dtype=jnp.int32) < n_b
    return xyz_a_ds, mask_a_ds, xyz_b_ds, mask_b_ds


def voxel_downsample_with_cov(
    xyz: jnp.ndarray,
    cov: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    trace_threshold: float,
    payload: jnp.ndarray | None = None,
    packed: bool = False,
):
    """Uncertainty-weighted voxel filter (VoxelGridCovarianceMLOAM semantics).

    Points with tr(Σ) >= trace_threshold are dropped; within a voxel,
    w_i = trace_threshold - tr(Σ_i), μ = Σ w_i x_i / Σ w_i,
    Σ_out = Σ w_i² Σ_i / (Σ w_i)², payload taken from the max-weight point.
    cov: [N, 3, 3]. Returns (xyz, cov, mask, payload) compacted.
    """
    tr = jnp.trace(cov, axis1=-2, axis2=-1)
    ok = mask & (tr < trace_threshold)
    w = jnp.maximum(trace_threshold - tr, 0.0)
    red = voxel_reduce(voxel_coords(xyz, leaf), ok, packed=packed)
    n = xyz.shape[0]

    ws = jnp.where(red.sorted_valid, w[red.order], 0.0)
    wsum = jnp.zeros((n,), xyz.dtype).at[red.seg_id].add(ws)
    wsum_safe = jnp.maximum(wsum, 1e-12)

    out_xyz = jnp.zeros_like(xyz).at[red.seg_id].add(ws[:, None] * xyz[red.order]) / wsum_safe[:, None]
    out_cov = (
        jnp.zeros_like(cov).at[red.seg_id].add((ws ** 2)[:, None, None] * cov[red.order])
        / (wsum_safe ** 2)[:, None, None]
    )
    out_payload = None
    if payload is not None:
        # payload of the max-weight member: argmax via (weight, index) packing
        packed = jnp.where(red.sorted_valid, ws, -1.0)
        best = jnp.full((n,), -jnp.inf, xyz.dtype).at[red.seg_id].max(packed)
        is_best = (packed == best[red.seg_id]) & red.sorted_valid
        p = payload[red.order]
        contrib = jnp.where(
            is_best.reshape((n,) + (1,) * (payload.ndim - 1)), p, -jnp.inf
        )
        out_payload = jnp.full_like(payload, -jnp.inf).at[red.seg_id].max(contrib)
        out_payload = jnp.where(
            red.mask.reshape((n,) + (1,) * (payload.ndim - 1)), out_payload, 0.0
        )
    return out_xyz, out_cov, red.mask, out_payload
