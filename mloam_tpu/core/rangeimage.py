"""Range-image projection of spinning-LiDAR sweeps.

The reference projects clouds to a [n_scans x horizon] grid inside the
segmenter (``image_segmenter.hpp:87-136``, incl. per-model row mapping) and
derives per-point relative sweep time from azimuth (``feature_extract.cpp:
73-114``). Here the range image *is* the canonical scan tensor: all frontend
ops are dense [R, C] array programs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RangeImage(NamedTuple):
    xyz: jnp.ndarray       # [R, C, 3]
    rng: jnp.ndarray       # [R, C] euclidean range, 0 where invalid
    valid: jnp.ndarray     # [R, C] bool
    time: jnp.ndarray      # [R, C] relative sweep time in [0, 1)
    intensity: jnp.ndarray  # [R, C]

    @property
    def shape(self):
        return self.rng.shape


class LidarModel(NamedTuple):
    """Geometry of one spinning LiDAR (static; part of the config tree)."""

    n_rings: int = 16
    n_cols: int = 1800
    fov_up_deg: float = 15.0
    fov_down_deg: float = -15.0
    min_range: float = 0.3
    max_range: float = 100.0
    scan_period: float = 0.1


def project(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    model: LidarModel,
    intensity: jnp.ndarray | None = None,
) -> RangeImage:
    """Project a flat padded cloud into a range image.

    Collisions keep the *closest* return per cell (scatter-min on range,
    matched gather for payloads). Relative time is derived from the azimuth
    column assuming a uniform clockwise sweep starting at -x axis.
    """
    r, c = model.n_rings, model.n_cols
    dtype = xyz.dtype
    rng = jnp.linalg.norm(xyz, axis=-1)
    ok = mask & (rng > model.min_range) & (rng < model.max_range)

    azimuth = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi)
    col = jnp.floor((azimuth + jnp.pi) / (2 * jnp.pi) * c).astype(jnp.int32)
    col = jnp.clip(col, 0, c - 1)

    horiz = jnp.linalg.norm(xyz[:, :2], axis=-1)
    vert = jnp.arctan2(xyz[:, 2], jnp.maximum(horiz, 1e-9))
    fov_up = jnp.deg2rad(model.fov_up_deg)
    fov_down = jnp.deg2rad(model.fov_down_deg)
    ring_f = (vert - fov_down) / (fov_up - fov_down) * (r - 1)
    ring = jnp.round(ring_f).astype(jnp.int32)
    in_fov = (ring_f > -0.5) & (ring_f < r - 0.5)
    ok = ok & in_fov
    ring = jnp.clip(ring, 0, r - 1)

    flat = ring * c + col
    # closest-return wins: scatter-min range, then match by equality
    img_rng = jnp.full((r * c,), jnp.inf, dtype).at[flat].min(
        jnp.where(ok, rng, jnp.inf)
    )
    winner = ok & (rng == img_rng[flat])
    # resolve exact ties by scatter-min on point index
    idx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    img_idx = jnp.full((r * c,), jnp.iinfo(jnp.int32).max, jnp.int32).at[flat].min(
        jnp.where(winner, idx, jnp.iinfo(jnp.int32).max)
    )
    cell_valid = jnp.isfinite(img_rng)
    src = jnp.where(cell_valid, img_idx, 0)

    img_xyz = xyz[src].reshape(r, c, 3)
    img_int = (
        intensity[src] if intensity is not None else jnp.zeros((r * c,), dtype)
    ).reshape(r, c)
    cols2d = jnp.broadcast_to(jnp.arange(c, dtype=dtype) / c, (r, c))
    return RangeImage(
        xyz=jnp.where(cell_valid.reshape(r, c, 1), img_xyz, 0.0),
        rng=jnp.where(cell_valid, img_rng, 0.0).reshape(r, c),
        valid=cell_valid.reshape(r, c),
        time=cols2d,
        intensity=jnp.where(cell_valid.reshape(r, c), img_int, 0.0),
    )


def from_grid(xyz: jnp.ndarray, valid: jnp.ndarray,
              intensity: jnp.ndarray | None = None) -> RangeImage:
    """Wrap an already-gridded sweep (e.g. from the simulator) as a RangeImage."""
    r, c = valid.shape
    rng = jnp.linalg.norm(xyz, axis=-1) * valid
    cols2d = jnp.broadcast_to(jnp.arange(c, dtype=xyz.dtype) / c, (r, c))
    inten = intensity if intensity is not None else jnp.zeros((r, c), xyz.dtype)
    return RangeImage(xyz=xyz, rng=rng, valid=valid, time=cols2d, intensity=inten)


def flatten(img: RangeImage):
    """Range image -> flat padded cloud arrays (xyz, mask, time, intensity)."""
    r, c = img.valid.shape
    return (
        img.xyz.reshape(r * c, 3),
        img.valid.reshape(r * c),
        img.time.reshape(r * c),
        img.intensity.reshape(r * c),
    )
