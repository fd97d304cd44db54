"""Range-image segmentation: ground labeling + cluster filtering.

Re-design of the reference's LeGO-LOAM-style segmenter
(``estimator/src/imageSegmenter/image_segmenter.hpp``): ground by
consecutive-ring slope (:176-223), clusters by BFS with the adjacent-beam
angle test ``atan2(d2 sin a, d1 - d2 cos a) > theta`` (:285-288), small
clusters dropped unless they span enough rings (:300-320).

TPU-native formulation: the BFS becomes connected-component labeling by
alternating *segmented min-scans* along rows and columns
(``jax.lax.associative_scan``, O(log C) per pass) — each round propagates
labels through entire connected runs, so a handful of rounds converges for
real cluster shapes (no data-dependent loop). Cluster statistics (size, ring
span) are scatter-adds keyed by the component label, which is a linear pixel
index.

Azimuth wrap-around (col 0 vs col C-1) is handled by running the row pass on
a half-width-rolled copy as well and taking the elementwise min.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.config import SegmenterConfig
from mloam_tpu.core.rangeimage import LidarModel, RangeImage


class Segmentation(NamedTuple):
    ground: jnp.ndarray    # [R, C] bool — ground points
    segmented: jnp.ndarray  # [R, C] bool — kept (ground or valid cluster)
    outlier: jnp.ndarray   # [R, C] bool — dropped cluster points
    label: jnp.ndarray     # [R, C] int32 component label (linear index space)


def _beam_angle_connected(rng_a, rng_b, alpha: float, theta_rad: float):
    """LeGO adjacency test between two beams separated by angle alpha."""
    d1 = jnp.maximum(rng_a, rng_b)
    d2 = jnp.minimum(rng_a, rng_b)
    beta = jnp.arctan2(
        d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha)
    )
    return beta > theta_rad


def _segmented_min_scan(labels: jnp.ndarray, conn: jnp.ndarray) -> jnp.ndarray:
    """Per-row segmented min over runs: conn[r, c] says col c-1 and c are
    connected (conn[:, 0] must be False). Bidirectional (min anywhere in the
    run reaches every member). labels [R, C] int32."""

    def combine(a, b):
        va, fa = a
        vb, fb = b
        # fb==1 -> segment restarts at b
        v = jnp.where(fb, vb, jnp.minimum(va, vb))
        return v, fa | fb

    reset = ~conn
    fwd, _ = jax.lax.associative_scan(combine, (labels, reset), axis=1)
    # backward: reverse, with reset flags shifted (reset at c means boundary
    # between c-1 and c; in reversed order the boundary sits before c-1)
    rev_reset = jnp.flip(jnp.roll(reset, -1, axis=1).at[:, -1].set(True), 1)
    bwd, _ = jax.lax.associative_scan(
        combine, (jnp.flip(labels, 1), rev_reset), axis=1
    )
    return jnp.minimum(fwd, jnp.flip(bwd, 1))


def segment(img: RangeImage, model: LidarModel, cfg: SegmenterConfig) -> Segmentation:
    r, c = img.valid.shape
    rng = jnp.where(img.valid, img.rng, 0.0)

    # --- ground: slope between vertically adjacent returns in bottom rows
    dx = img.xyz[1:, :, 0] - img.xyz[:-1, :, 0]
    dy = img.xyz[1:, :, 1] - img.xyz[:-1, :, 1]
    dz = img.xyz[1:, :, 2] - img.xyz[:-1, :, 2]
    slope = jnp.abs(jnp.arctan2(dz, jnp.sqrt(dx * dx + dy * dy)))
    pair_ok = img.valid[1:] & img.valid[:-1] & (
        slope < jnp.deg2rad(cfg.ground_angle_deg)
    )
    ground = jnp.zeros((r, c), bool)
    ground = ground.at[:-1].set(pair_ok)
    ground = ground.at[1:].set(ground[1:] | pair_ok)
    row_idx = jnp.arange(r)[:, None]
    ground = ground & (row_idx < cfg.ground_rows) & img.valid

    # --- clustering on non-ground valid points
    clusterable = img.valid & ~ground
    theta = jnp.deg2rad(cfg.segment_theta_deg)
    alpha_h = 2 * jnp.pi / model.n_cols
    alpha_v = jnp.deg2rad(
        (model.fov_up_deg - model.fov_down_deg) / max(model.n_rings - 1, 1)
    )

    conn_h = jnp.zeros((r, c), bool)
    conn_h = conn_h.at[:, 1:].set(
        clusterable[:, 1:]
        & clusterable[:, :-1]
        & _beam_angle_connected(rng[:, 1:], rng[:, :-1], alpha_h, theta)
    )
    conn_v = jnp.zeros((r, c), bool)
    conn_v = conn_v.at[1:, :].set(
        clusterable[1:]
        & clusterable[:-1]
        & _beam_angle_connected(rng[1:], rng[:-1], alpha_v, theta)
    )
    # wrap-around adjacency col C-1 <-> col 0
    wrap_ok = (
        clusterable[:, 0]
        & clusterable[:, -1]
        & _beam_angle_connected(rng[:, 0], rng[:, -1], alpha_h, theta)
    )

    labels = jnp.arange(r * c, dtype=jnp.int32).reshape(r, c)
    labels = jnp.where(clusterable, labels, jnp.int32(r * c))
    half = c // 2
    n_rounds = max(cfg.label_iters // 4, 3)

    if jax.devices()[0].platform == "tpu":
        # fused single-dispatch propagation (ops/pallas_labels): the XLA
        # path below lowers to ~30 small scan kernels per round
        from mloam_tpu.ops import pallas_labels

        labels = pallas_labels.propagate_labels_pallas(
            labels, conn_h.at[:, 0].set(wrap_ok), conn_v, rounds=n_rounds
        )
    else:
        def one_round(_, lab):
            lab = _segmented_min_scan(lab, conn_h)
            # azimuth wrap: same row pass on a half-rolled image
            lab_r = jnp.roll(lab, half, axis=1)
            conn_r = jnp.roll(conn_h, half, axis=1)
            conn_r = conn_r.at[:, half].set(wrap_ok)
            conn_r = conn_r.at[:, 0].set(False)
            lab = jnp.roll(_segmented_min_scan(lab_r, conn_r), -half, axis=1)
            # column pass (transpose)
            lab = _segmented_min_scan(lab.T, conn_v.T).T
            return lab

        labels = jax.lax.fori_loop(0, n_rounds, one_round, labels)

    # --- cluster stats via scatter keyed on label
    flat = labels.reshape(-1)
    ones = clusterable.reshape(-1).astype(jnp.int32)
    size = jnp.zeros(r * c + 1, jnp.int32).at[flat].add(ones)
    rows2d = jnp.broadcast_to(row_idx, (r, c)).reshape(-1)
    rmin = jnp.full(r * c + 1, r, jnp.int32).at[flat].min(
        jnp.where(ones > 0, rows2d, r)
    )
    rmax = jnp.full(r * c + 1, -1, jnp.int32).at[flat].max(
        jnp.where(ones > 0, rows2d, -1)
    )
    span = rmax - rmin + 1

    big = size >= cfg.min_cluster_size
    liney = (size >= cfg.segment_valid_point_num) & (span >= cfg.min_line_num)
    keep_label = big | liney
    keep = clusterable & keep_label[labels]
    outlier = clusterable & ~keep

    return Segmentation(
        ground=ground,
        segmented=keep | ground,
        outlier=outlier,
        label=labels,
    )
