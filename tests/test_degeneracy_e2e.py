"""Degenerate-geometry end-to-end: the tunnel course with outlier bursts.

The reference's core failure-detection story is eigenvalue analysis of the
per-pose measurement Hessian with solution remapping
(estimator.cpp:1578-1680; the projector here uses res_ids_proj semantics —
point factors + anchors, never the marginalization prior).

Scenario (mirrors the results/corridor artifact): a closed tunnel along +x
(every surface normal ⊥ x — x geometrically unobservable) traversed at
constant velocity, with a pillar-sized object that is static in the SENSOR
frame for 3 of every 10 frames (transient outlier bursts: coherent "no
motion along x" correspondences with only a small eigenvalue bump). Run on
the tracker-skipping steady path so the constant-velocity prediction is
the protected quantity.

Gates (replacing the round-3 "not worse than a no-op" assertions):
  * the projector ENGAGES: frozen-direction count > 0 on essentially every
    in-tunnel frame of the remap-on run — and stays SILENT on a
    feature-rich course;
  * it PROTECTS: along-x error with remap on is several times smaller
    than with remap off (measured: 0.35 m vs 2.47 m over 90 frames — the
    bursts walk the unfrozen solver backward, the frozen direction coasts
    on the prediction);
  * the cost is bounded: the frozen shared eigvector carries a measured
    ~0.3 z-impurity, so z degrades moderately (bounded, not runaway — the
    runaway variants are what the shared projector + per-direction cap +
    degeneracy-consistent marginalization exist to prevent; see
    config.OdometryConfig remap_* docstrings for the measured failures).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.sim import world as W

N = 90
COMP_START = 15


def _tunnel_cfg():
    cfg = platforms.synthetic(n_lidars=1)
    model = cfg.rig.models[0]._replace(max_range=20.0)
    cfg = dataclasses.replace(
        cfg,
        rig=dataclasses.replace(cfg.rig, models=(model,)),
        tracker=dataclasses.replace(cfg.tracker, skip_steady=True),
    )
    # the indoor/degenerate OPERATING POINT arms the remap — the product
    # default ships disarmed, because round 5 measured that no Hessian
    # statistic separates corridor degeneracy from genuine sparse
    # geometry on turning courses (BENCH_NOTES round-5 investigation);
    # the reference makes the same per-environment choice via its
    # per-platform eig_thre_ yaml
    return platforms.indoor_degenerate(cfg)


@pytest.fixture(scope="module")
def corridor_runs():
    base = _tunnel_cfg()
    model = base.rig.models[0]
    w = W.make_corridor_world(wall_height=3.0, ceiling=True)
    mount = Pose(jnp.array([1.0, 0.0, 0.0, 0.0]),
                 jnp.array([0.0, 0.0, 1.2]))
    traj = W.make_straight_trajectory(speed=2.0, wobble=0.02)
    imgs, gt = W.render_sequence(
        w, traj, model, N, noise_std=0.01, noise_seed=1000, extrinsic=mount,
        companions=jnp.array([[5.0, 0.8, 0.12]]),
        companion_frames=(COMP_START, N), companion_period=(3, 10),
    )
    g0 = se3.compose(Pose(gt.q[0], gt.t[0]), mount)
    gt_rel = np.stack([
        np.asarray(se3.compose(
            se3.inverse(g0),
            se3.compose(Pose(gt.q[i], gt.t[i]), mount)).t)
        for i in range(N)
    ])
    thr = base.odometry.eig_threshold
    out = {}
    for label, t in (("on", thr), ("off", 0.0)):
        cfg = dataclasses.replace(base, odometry=dataclasses.replace(
            base.odometry, eig_threshold=t))
        pipe = OdometryPipeline(cfg)
        est, frozen = [], []
        for i in range(N):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f)
                               for f in imgs])
            o = pipe.process([img])
            est.append(np.asarray(o.pose.t))
            if o.win_frozen is not None:
                # TRUE engagement: directions the applied projector froze
                # (round-4 advisor: raw sub-threshold eigenvalue counts
                # overstated it)
                frozen.append(float(np.sum(np.asarray(o.win_frozen))))
            else:
                frozen.append(0.0)
        err = np.stack(est) - gt_rel
        out[label] = (err, frozen)
    return out


class TestCorridorDegeneracy:
    def test_projector_engages(self, corridor_runs):
        """Sub-threshold directions exist on essentially every in-tunnel
        frame — the intervention actually fires (round-3 gap: the
        projector had never engaged in any end-to-end run)."""
        _, frozen = corridor_runs["on"]
        in_tunnel = frozen[COMP_START:]
        engaged = sum(1 for f in in_tunnel if f > 0)
        assert engaged >= 0.9 * len(in_tunnel), \
            f"engaged {engaged}/{len(in_tunnel)}"

    def test_protects_degenerate_direction(self, corridor_runs):
        """Remap ON holds the unobservable axis on the constant-velocity
        prediction; OFF gets walked backward by the outlier bursts."""
        err_on, _ = corridor_runs["on"]
        err_off, _ = corridor_runs["off"]
        ex_on = np.abs(err_on[:, 0]).max()
        ex_off = np.abs(err_off[:, 0]).max()
        assert ex_on < 0.8, ex_on                 # absolute envelope
        assert ex_on < 0.5 * ex_off, (ex_on, ex_off)  # and beats OFF

    def test_observable_directions_bounded(self, corridor_runs):
        """y/z stay bounded in both runs. Round 5 tightened the z bound
        2.5 -> 0.8 m: the frozen direction SNAPS to the canonical x axis
        (purity 0.99 measured), so the round-4 ~0.3 z-impurity coupling
        (ez_max 1.74 ON vs 0.39 OFF) is gone by construction."""
        err_on, _ = corridor_runs["on"]
        err_off, _ = corridor_runs["off"]
        assert np.abs(err_on[:, 1]).max() < 0.8
        assert np.abs(err_on[:, 2]).max() < 0.8
        assert np.abs(err_off[:, 1]).max() < 0.3
        assert np.abs(err_off[:, 2]).max() < 1.0
        assert np.isfinite(err_on).all() and np.isfinite(err_off).all()

    def test_silent_on_feature_rich_course(self):
        """The DEFAULT config must never freeze on an observed scene —
        checked on a NOISELESS render (the bench regime, where rich-floor
        eigenvalues dip lowest)."""
        cfg = platforms.synthetic(n_lidars=1)
        w = W.make_world(jax.random.PRNGKey(11))
        traj = W.make_trajectory(jax.random.PRNGKey(12))
        imgs, _ = W.render_sequence(w, traj, cfg.rig.models[0], 26)
        pipe = OdometryPipeline(cfg)
        frozen = 0.0
        for i in range(26):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f)
                               for f in imgs])
            o = pipe.process([img])
            if o.win_frozen is not None:
                frozen += float(np.sum(np.asarray(o.win_frozen)))
        assert frozen == 0, frozen

    def test_silent_on_turning_noiseless_course(self):
        """THE round-4 regression course: a noiseless TURNING loop, where
        shared-mean e0 dips below any workable absolute threshold for
        dozens of consecutive direction-consistent frames (measured:
        below-rate 0.53, runs up to 42 frames, cons 0.998 — persistence
        alone cannot separate it either). What separates it is PURITY:
        its weak direction is a rotating tx/ty mix (max component ~0.6)
        while the corridor's is 0.99-canonical. The default gate must
        stay silent here — window AND mapper."""
        import dataclasses as dc

        from mloam_tpu.models.pipeline import FullPipeline

        cfg = platforms.synthetic(n_lidars=1)
        cfg = dc.replace(cfg, mapping=dc.replace(
            cfg.mapping, keyframe_dist=0.5, skip_frames=2))
        w = W.make_world(jax.random.PRNGKey(3), extent=30.0, n_walls=20,
                         n_poles=10)
        traj = W.make_loop_trajectory(radius=6.0, period_s=10.0)
        n = 45
        imgs, _ = W.render_sequence(w, traj, cfg.rig.models[0], n)
        pipe = FullPipeline(cfg)
        win_frozen = map_frozen = 0.0
        for i in range(n):
            img = RangeImage(*[jax.tree.map(lambda x: x[i], f)
                               for f in imgs])
            o = pipe.process([img])
            if o.odom.win_frozen is not None:
                win_frozen += float(np.sum(np.asarray(o.odom.win_frozen)))
            if o.mapped and o.map_frozen is not None:
                map_frozen += float(np.asarray(o.map_frozen))
        assert win_frozen == 0, f"window remap fired {win_frozen}"
        assert map_frozen == 0, f"mapper remap fired {map_frozen}"
