"""Synthetic multi-LiDAR world: analytic ray-casting against plane/cylinder
primitives along a smooth trajectory.

Role: the deterministic replay fixture of this framework — the counterpart of
the reference's SR Gazebo-simulation bags (``rosNodeSR.cpp:164-192`` consumes
``/base_odom_gt``) and its bag generators (``mloam_test/src/
test_generate_bag_*``). Every integration test and ATE gate runs against
sequences rendered here, with exact ground truth and exact per-point sweep
timing, so accuracy regressions are attributable.

The world is built from finite rectangles (ground, building walls) and
vertical cylinders (poles, trunks) — structure that exercises both LOAM
feature classes: planar patches and sharp vertical edges (wall corners, pole
silhouettes). Scans are rendered with intra-sweep motion distortion: each
azimuth column is ray-cast from the interpolated sensor pose at its firing
time, and ranges are reported in the sensor frame at that time — exactly what
a spinning LiDAR measures.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import LidarModel, RangeImage, from_grid
from mloam_tpu.core.se3 import Pose

_BIG = 1e9


class World(NamedTuple):
    rect_center: jnp.ndarray  # [P, 3]
    rect_u: jnp.ndarray       # [P, 3] half-extent vector 1
    rect_v: jnp.ndarray       # [P, 3] half-extent vector 2
    rect_mask: jnp.ndarray    # [P]
    cyl_xyr: jnp.ndarray      # [Q, 3] center x, y, radius
    cyl_z: jnp.ndarray        # [Q, 2] zmin, zmax
    cyl_mask: jnp.ndarray     # [Q]


def make_world(
    key: jax.Array,
    extent: float = 40.0,
    n_walls: int = 24,
    n_poles: int = 12,
    wall_height: float = 4.0,
) -> World:
    """Random structured world: big ground plane, vertical walls at random
    yaw, vertical poles. Deterministic in the key."""
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # ground
    ground_c = jnp.array([[0.0, 0.0, 0.0]])
    ground_u = jnp.array([[extent * 2.0, 0.0, 0.0]])
    ground_v = jnp.array([[0.0, extent * 2.0, 0.0]])

    # walls: random center (ring between 6 and extent), random yaw, random len
    r = jax.random.uniform(k1, (n_walls,), minval=6.0, maxval=extent)
    ang = jax.random.uniform(k2, (n_walls,), minval=-jnp.pi, maxval=jnp.pi)
    yaw = jax.random.uniform(k3, (n_walls,), minval=-jnp.pi, maxval=jnp.pi)
    half_len = jax.random.uniform(k4, (n_walls,), minval=2.0, maxval=8.0)
    wc = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang),
                    jnp.full((n_walls,), wall_height / 2)], -1)
    wu = jnp.stack([half_len * jnp.cos(yaw), half_len * jnp.sin(yaw),
                    jnp.zeros(n_walls)], -1)
    wv = jnp.stack([jnp.zeros(n_walls), jnp.zeros(n_walls),
                    jnp.full((n_walls,), wall_height / 2)], -1)

    rect_c = jnp.concatenate([ground_c, wc])
    rect_u = jnp.concatenate([ground_u, wu])
    rect_v = jnp.concatenate([ground_v, wv])
    rect_mask = jnp.ones(rect_c.shape[0], bool)

    k5, k6 = jax.random.split(k4)
    pr = jax.random.uniform(k5, (n_poles,), minval=4.0, maxval=extent * 0.8)
    pang = jax.random.uniform(k6, (n_poles,), minval=-jnp.pi, maxval=jnp.pi)
    cyl_xyr = jnp.stack(
        [pr * jnp.cos(pang), pr * jnp.sin(pang), jnp.full((n_poles,), 0.25)], -1
    )
    cyl_z = jnp.broadcast_to(jnp.array([0.0, 5.0]), (n_poles, 2))
    return World(rect_c, rect_u, rect_v, rect_mask, cyl_xyr, cyl_z,
                 jnp.ones(n_poles, bool))


def make_corridor_world(length: float = 120.0, width: float = 4.0,
                        wall_height: float = 4.0,
                        featured_entry: bool = True,
                        ceiling: bool = True,
                        rails: bool = True) -> World:
    """Featureless straight corridor along +x: two parallel side walls +
    ground (+ ceiling) + far end caps. Translation along x is
    geometrically unobservable in the corridor interior (every surface
    normal is ⊥ x) — the degenerate scenario the reference's solution
    remapping exists for (Zhang's degeneracy analysis;
    estimator.cpp:1598-1680, lidar_tracker.cpp:131-163).

    ``ceiling``: close the top (an indoor corridor / tunnel). This keeps
    every direction EXCEPT x strongly observed — measured spectra in the
    open-top variant have the second eigenvalue (pitch-ish) dipping into
    the same 70-160 band as the degenerate x direction, so no absolute
    threshold can freeze x without also freezing an observable direction;
    with the ceiling the gap between e0 (x, spurious floor) and e1 is
    wide and the reference's freeze-all-below-threshold rule is safe.

    ``rails``: four thin strips running the corridor's length (floor
    curbs + ceiling rails, all surfaces ⊥ z or creating x-parallel edge
    lines). They add strong y/z/pitch/roll information while contributing
    exactly ZERO along x — purifying the degenerate eigendirection so the
    remap's frozen vector is pure x instead of an x/z mix (measured: the
    bare tunnel's lowest eigvector carried 0.24-0.33 of z, so freezing it
    blocked a tenth of every z correction).

    ``featured_entry``: poles scattered over x ∈ [-12, 0] give the entry
    segment full observability (the estimator learns the vehicle speed
    there; inside the corridor the constant-velocity prediction is the
    only source of along-x information)."""
    half = length / 2.0
    rect_c = jnp.array([
        [0.0, 0.0, 0.0],                       # ground strip
        [0.0, -width / 2.0, wall_height / 2],  # right wall
        [0.0, width / 2.0, wall_height / 2],   # left wall
        [half, 0.0, wall_height / 2],          # far end cap
        [-5.0, 0.0, wall_height / 2],          # entry back wall (⊥ x):
        # the only plane with x-normal — full observability near the
        # start; once it leaves sensor range the corridor is degenerate
        [0.0, 0.0, wall_height],               # ceiling (masked if open)
        # longitudinal rails (masked if rails=False): floor curbs +
        # ceiling rails, horizontal strips ⊥ z running the full length
        [0.0, -width / 2 + 0.6, 0.30],
        [0.0, width / 2 - 0.6, 0.30],
        [0.0, -width / 2 + 0.6, wall_height - 0.30],
        [0.0, width / 2 - 0.6, wall_height - 0.30],
    ])
    rect_u = jnp.array([
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
        [0.0, width, 0.0],
        [0.0, width, 0.0],
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
        [half, 0.0, 0.0],
    ])
    rect_v = jnp.array([
        [0.0, width, 0.0],
        [0.0, 0.0, wall_height / 2],
        [0.0, 0.0, wall_height / 2],
        [0.0, 0.0, wall_height / 2],
        [0.0, 0.0, wall_height / 2],
        [0.0, width, 0.0],
        [0.0, 0.12, 0.0],
        [0.0, 0.12, 0.0],
        [0.0, 0.12, 0.0],
        [0.0, 0.12, 0.0],
    ])
    n_poles = 8
    if featured_entry:
        px = jnp.linspace(-12.0, -1.0, n_poles)
        py = jnp.where(jnp.arange(n_poles) % 2 == 0, -width / 2 + 0.4,
                       width / 2 - 0.4)
        cyl_xyr = jnp.stack([px, py, jnp.full((n_poles,), 0.15)], -1)
        cyl_z = jnp.broadcast_to(jnp.array([0.0, wall_height]), (n_poles, 2))
        cyl_mask = jnp.ones(n_poles, bool)
    else:
        cyl_xyr = jnp.zeros((1, 3))
        cyl_z = jnp.zeros((1, 2))
        cyl_mask = jnp.zeros(1, bool)
    return World(
        rect_center=rect_c, rect_u=rect_u, rect_v=rect_v,
        rect_mask=jnp.array([True] * 5 + [bool(ceiling)]
                            + [bool(rails)] * 4),
        cyl_xyr=cyl_xyr, cyl_z=cyl_z, cyl_mask=cyl_mask,
    )


def make_straight_trajectory(speed: float = 2.0,
                             wobble: float = 0.0) -> Trajectory:
    """Constant-velocity straight line along +x (the corridor course).

    Built from the sinusoid parameterization's small-angle region: a single
    very-low-frequency term whose sin is ~linear over the run."""
    om = 0.01
    amp = jnp.array([[speed / om, 0.0, 0.0]])
    freq = jnp.array([om])
    phase = jnp.array([[0.0, jnp.pi / 2, 0.0]])
    return Trajectory(amp, freq, phase, yaw_rate=0.0, wobble=wobble)


def _raycast_rects(world: World, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Min positive hit distance against all rectangles. o,d: [N,3] -> [N]."""
    c, u, v = world.rect_center, world.rect_u, world.rect_v
    n = jnp.cross(u, v)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # t = (c - o)·n / d·n   per (ray, rect)
    denom = jnp.einsum("nk,pk->np", d, n)
    numer = jnp.einsum("pk,pk->p", c, n)[None, :] - jnp.einsum("nk,pk->np", o, n)
    t = numer / jnp.where(jnp.abs(denom) < 1e-9, jnp.inf, denom)
    hit = o[:, None, :] + t[..., None] * d[:, None, :] - c[None, :, :]
    ulen2 = jnp.sum(u * u, -1)
    vlen2 = jnp.sum(v * v, -1)
    pu = jnp.einsum("npk,pk->np", hit, u)
    pv = jnp.einsum("npk,pk->np", hit, v)
    inside = (jnp.abs(pu) <= ulen2[None, :]) & (jnp.abs(pv) <= vlen2[None, :])
    ok = inside & (t > 0.05) & world.rect_mask[None, :]
    return jnp.min(jnp.where(ok, t, _BIG), axis=1)


def _raycast_cyls(world: World, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Min positive hit distance against vertical cylinders. [N,3] -> [N]."""
    cxy = world.cyl_xyr[:, :2]
    rad = world.cyl_xyr[:, 2]
    oxy = o[:, None, :2] - cxy[None, :, :]
    dxy = d[:, None, :2]
    a = jnp.sum(dxy * dxy, -1)
    b = 2.0 * jnp.sum(oxy * dxy, -1)
    cc = jnp.sum(oxy * oxy, -1) - (rad ** 2)[None, :]
    disc = b * b - 4 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    t0 = (-b - sq) / (2 * a_safe)
    t1 = (-b + sq) / (2 * a_safe)
    t = jnp.where(t0 > 0.05, t0, t1)
    z = o[:, None, 2] + t * d[:, None, 2]
    ok = (
        (disc > 0)
        & (t > 0.05)
        & (z >= world.cyl_z[None, :, 0])
        & (z <= world.cyl_z[None, :, 1])
        & world.cyl_mask[None, :]
    )
    return jnp.min(jnp.where(ok, t, _BIG), axis=1)


def raycast(world: World, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """[N] min positive range, _BIG where no hit."""
    return jnp.minimum(_raycast_rects(world, o, d), _raycast_cyls(world, o, d))


def sensor_rays(model: LidarModel, dtype=jnp.float32) -> jnp.ndarray:
    """[R, C, 3] unit ray directions in the sensor frame (canonical table
    lives in core.rangeimage.unit_rays; the simulator casts along it, which
    makes the PackedFrame wire format exactly lossless on sim data)."""
    from mloam_tpu.core.rangeimage import unit_rays

    return unit_rays(model, dtype)


def render_scan(
    world: World,
    pose_start: Pose,
    pose_end: Pose,
    model: LidarModel,
    noise_std: float = 0.0,
    noise_key: jax.Array | None = None,
) -> RangeImage:
    """Render one distorted sweep.

    Column j fires at s = j/C into the sweep, from pose interp(start, end, s);
    the returned xyz is in the *sensor frame at firing time* (what the device
    measures), gridded [R, C]. ``noise_std`` adds gaussian range noise
    (fault-injection counterpart of the reference's -inject_meas_noise flag
    and noisy-bag generator).
    """
    r, c = model.n_rings, model.n_cols
    dirs_s = sensor_rays(model)  # [R, C, 3]
    s = (jnp.arange(c, dtype=jnp.float32) + 0.5) / c
    pose_cols = se3.interpolate(
        Pose(jnp.broadcast_to(pose_start.q, (c, 4)), jnp.broadcast_to(pose_start.t, (c, 3))),
        Pose(jnp.broadcast_to(pose_end.q, (c, 4)), jnp.broadcast_to(pose_end.t, (c, 3))),
        s,
    )
    d_world = rot.quat_rotate(pose_cols.q[None, :, :], dirs_s)  # [R, C, 3]
    o_world = jnp.broadcast_to(pose_cols.t[None, :, :], (r, c, 3))
    t_hit = raycast(world, o_world.reshape(-1, 3), d_world.reshape(-1, 3))
    t_hit = t_hit.reshape(r, c)
    if noise_std > 0.0 and noise_key is not None:
        t_hit = t_hit + noise_std * jax.random.normal(noise_key, t_hit.shape)
    valid = (t_hit < model.max_range) & (t_hit > model.min_range)
    xyz = jnp.where(valid[..., None], t_hit[..., None] * dirs_s, 0.0)
    return from_grid(xyz, valid)


class Trajectory(NamedTuple):
    """Smooth parametric trajectory: position/yaw as sums of sinusoids,
    optional roll/pitch wobble (handheld-style motion — needed for full
    hand-eye observability, which requires rotation about >= 2 axes)."""

    amp: jnp.ndarray    # [K, 3] xyz amplitudes
    freq: jnp.ndarray   # [K] rad/s
    phase: jnp.ndarray  # [K, 3]
    yaw_rate: float
    wobble: float       # roll/pitch amplitude (rad); 0 = planar

    def pose(self, t) -> Pose:
        t = jnp.asarray(t, jnp.float32)
        arg = self.freq[:, None] * t[..., None, None] + self.phase
        pos = jnp.sum(self.amp * jnp.sin(arg), axis=-2)
        pos = pos.at[..., 2].set(0.6 + 0.05 * jnp.sum(jnp.sin(arg[..., 2]), -1))
        yaw = self.yaw_rate * t
        roll = self.wobble * jnp.sin(1.7 * t + 0.3)
        pitch = self.wobble * jnp.sin(2.3 * t + 1.1)
        q_yaw = rot.so3_exp_quat(
            jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1)
        )
        q_rp = rot.so3_exp_quat(
            jnp.stack([roll, pitch, jnp.zeros_like(yaw)], -1)
        )
        return Pose(rot.quat_multiply(q_yaw, q_rp), pos)


def make_trajectory(key: jax.Array, speed_scale: float = 1.0,
                    wobble: float = 0.0) -> Trajectory:
    k1, k2 = jax.random.split(key)
    amp = jnp.array([[6.0, 4.0, 0.3], [1.5, 2.0, 0.2], [0.4, 0.3, 0.1]]) * speed_scale
    freq = jnp.array([0.11, 0.31, 0.83])
    phase = jax.random.uniform(k1, (3, 3), minval=0, maxval=2 * jnp.pi)
    yaw_rate = float(0.25 * speed_scale)
    return Trajectory(amp, freq, phase, yaw_rate, wobble)


def make_loop_trajectory(radius: float = 7.0, period_s: float = 10.0,
                         wobble: float = 0.0) -> Trajectory:
    """Closed circular trajectory: one lap every ``period_s`` seconds, with
    heading tangent to the circle — the sensor revisits every point each lap
    with matching yaw. The loop-closure replay fixture (counterpart of the
    reference's revisiting sequences driven through loop_closure_node)."""
    om = 2.0 * jnp.pi / period_s
    amp = jnp.array([[radius, radius, 0.0]])
    freq = jnp.array([om])
    phase = jnp.array([[jnp.pi / 2.0, 0.0, 0.0]])
    return Trajectory(amp, freq, phase, yaw_rate=float(om), wobble=wobble)


def render_sequence(
    world: World,
    traj: Trajectory,
    model: LidarModel,
    n_frames: int,
    extrinsic: Pose | None = None,
    t0: float = 0.0,
    noise_std: float = 0.0,
    noise_seed: int = 1234,
    companions: jnp.ndarray | None = None,
    companion_z: jnp.ndarray | None = None,
    companion_frames: tuple[int, int] | None = None,
    companion_period: tuple[int, int] | None = None,
    movers: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
):
    """Render n_frames sweeps for one lidar mounted at ``extrinsic``
    (base <- lidar). Returns (RangeImage stacked [F, ...], gt base poses
    Pose[F] at sweep starts).

    ``companions`` [K, 3] (x, y, radius, in the BASE frame) adds dynamic
    cylinder objects that move rigidly with the vehicle — the classic
    degenerate-scene hazard (a pedestrian/vehicle keeping pace): their
    returns are static in the sensor frame, so scan matching reads them as
    "no motion". ``companion_z`` [K, 2] gives each column's z range
    (default full wall height 0..2), ``companion_frames`` (start, stop)
    bounds their presence. Counterpart of the reference's measurement
    fault injection (rosNodeSR.cpp:53, noisy-bag generator) extended to
    dynamic objects, which the reference's simulator never constructs.

    ``movers`` = (xyr [K, 3], z [K, 2], vel [K, 2]): independently moving
    cylinder objects (cross-traffic) — world-frame centers translate at
    ``vel`` m/s from their initial positions. Their inter-scan residuals
    are exactly the dynamic-object outliers the reference ships GM/GNC
    losses for (impl_loss_function.hpp:94-125, launch args
    loss_mode/gnc, mloam_simu_jackal.launch:16-18)."""
    if extrinsic is None:
        extrinsic = Pose.identity()
    dt = model.scan_period
    nkey = jax.random.PRNGKey(noise_seed)
    if companions is not None and companion_z is None:
        companion_z = jnp.broadcast_to(jnp.array([0.0, 2.0]),
                                       (companions.shape[0], 2))

    def one(i):
        ts = t0 + i * dt
        base0 = traj.pose(ts)
        base1 = traj.pose(ts + dt)
        w = world
        if movers is not None:
            m_xyr, m_z, m_vel = movers
            pos = m_xyr[:, :2] + m_vel * (ts - t0)
            w = w._replace(
                cyl_xyr=jnp.concatenate(
                    [w.cyl_xyr,
                     jnp.concatenate([pos, m_xyr[:, 2:3]], -1)]),
                cyl_z=jnp.concatenate([w.cyl_z, m_z]),
                cyl_mask=jnp.concatenate(
                    [w.cyl_mask, jnp.ones(m_xyr.shape[0], bool)]),
            )
        if companions is not None:
            # companion centers ride the base pose (xy only — cylinders
            # stay vertical; yaw rotates the offset)
            off = jnp.concatenate(
                [companions[:, :2],
                 jnp.zeros((companions.shape[0], 1))], -1)
            ctr = rot.quat_rotate(base0.q[None], off) + base0.t[None]
            present = jnp.asarray(True)
            if companion_frames is not None:
                present = ((i >= companion_frames[0])
                           & (i < companion_frames[1]))
            if companion_period is not None:
                # transient bursts: present for the first ``on`` frames of
                # every ``period``-frame cycle (measured from the window
                # start) — repeated outlier clusters rather than a
                # persistent co-moving object
                on, period = companion_period
                start = (companion_frames[0]
                         if companion_frames is not None else 0)
                phase = jnp.mod(i - start, float(period))
                present = present & (phase < on)
            w = w._replace(
                cyl_xyr=jnp.concatenate(
                    [w.cyl_xyr,
                     jnp.concatenate([ctr[:, :2], companions[:, 2:3]], -1)]),
                cyl_z=jnp.concatenate(
                    [w.cyl_z, companion_z + base0.t[2]]),
                cyl_mask=jnp.concatenate(
                    [w.cyl_mask,
                     jnp.broadcast_to(present, (companions.shape[0],))]),
            )
        p0 = se3.compose(base0, extrinsic)
        p1 = se3.compose(base1, extrinsic)
        img = render_scan(
            w, p0, p1, model, noise_std,
            jax.random.fold_in(nkey, i.astype(jnp.int32)) if noise_std > 0 else None,
        )
        return img, base0

    idx = jnp.arange(n_frames, dtype=jnp.float32)
    imgs, poses = jax.lax.map(one, idx)
    return imgs, poses
