"""Per-platform configuration presets.

Counterpart of the reference's yaml config set (``estimator/config/*.yaml``):
SR (simulated jackal, 2x VLP-16), RHD (handheld, 2x VLP-16), RV Hercules
(vehicle, 4x), Oxford (2x HDL-32), KITTI (1x HDL-64). Values mirror the
reference's per-platform settings (n_scans, num_of_laser, window sizes,
resolutions) on top of the defaults in config.py.
"""

from __future__ import annotations

import dataclasses

from mloam_tpu.config import LidarRig, MloamConfig
from mloam_tpu.core.rangeimage import LidarModel

VLP16 = LidarModel(n_rings=16, n_cols=1800, fov_up_deg=15.0, fov_down_deg=-15.0)
HDL32 = LidarModel(n_rings=32, n_cols=2160, fov_up_deg=10.67, fov_down_deg=-30.67)
HDL64 = LidarModel(n_rings=64, n_cols=1800, fov_up_deg=2.0, fov_down_deg=-24.8)
SIM16 = LidarModel(n_rings=16, n_cols=1800)


def _rig_budget(cfg: MloamConfig) -> MloamConfig:
    """Rig-normalized per-sweep feature budget for multi-lidar rigs.

    The window-solve cost scales with the TOTAL per-sweep feature count;
    overlapping-FOV lidars don't see L× the unique structure (local-map
    density is bounded by the voxel leaves), so the single-rig budget is
    split across the rig instead of multiplied by it. On-chip A/B
    (demos/profile_dual_{caps,fast}.py, dual VLP-16): full per-lidar caps
    17.0 ms/frame ATE 2.79 cm → 384/768 per lidar 10.75 ms ATE 2.17 cm —
    1.6x faster AND more accurate (the dropped features are the lowest-
    curvature-rank ones; the map stays voxel-bounded either way)."""
    L = cfg.rig.n_lidars
    if L <= 1:
        return cfg
    corner = max(768 // L, 256)
    surf = 2 * corner
    return dataclasses.replace(
        cfg,
        odometry=dataclasses.replace(
            cfg.odometry,
            cap_frame_corner=corner,
            cap_frame_surf=surf,
            localmap_precap_corner=2 * corner,
            localmap_precap_surf=5 * surf,
        ),
    )


def simu_jackal(n_lidars: int = 2, extrinsic_mode: int = 2) -> MloamConfig:
    """SR: config_simu_jackal.yaml (2x VLP-16, online calibration)."""
    return _rig_budget(MloamConfig(rig=LidarRig(models=(SIM16,) * n_lidars,
                                                extrinsic_mode=extrinsic_mode)))


def handheld(extrinsic_mode: int = 1) -> MloamConfig:
    """RHD: config_handheld.yaml (2x VLP-16)."""
    return _rig_budget(MloamConfig(rig=LidarRig(models=(VLP16, VLP16),
                                                extrinsic_mode=extrinsic_mode)))


def vehicle_hercules(extrinsic_mode: int = 1) -> MloamConfig:
    """RV: config_realvehicle_hercules.yaml (4x VLP-16)."""
    return _rig_budget(MloamConfig(rig=LidarRig(models=(VLP16,) * 4,
                                                extrinsic_mode=extrinsic_mode)))


def oxford(extrinsic_mode: int = 0) -> MloamConfig:
    """OR: config_realvehicle_oxford.yaml (2x HDL-32)."""
    return _rig_budget(MloamConfig(rig=LidarRig(models=(HDL32, HDL32),
                                                extrinsic_mode=extrinsic_mode)))


def kitti() -> MloamConfig:
    """KITTI: config_realvehicle_kitti.yaml (1x HDL-64, fixed extrinsics).

    Uses the HDL-64's real two-density beam ladder (reference
    image_segmenter.hpp:104-111) — uniform elevation binning on this
    sensor mis-bins the lower block's 1/2-deg-spaced rings."""
    from mloam_tpu.core.rangeimage import hdl64_ring_table

    model = HDL64._replace(ring_elevations_deg=hdl64_ring_table())
    cfg = MloamConfig(rig=LidarRig(models=(model,), extrinsic_mode=0))
    return dataclasses.replace(
        cfg, segmenter=dataclasses.replace(cfg.segmenter, ground_rows=30)
    )


def realtime_tuned(cfg: MloamConfig) -> MloamConfig:
    """The on-chip realtime operating point, from the round-3 chip ladders
    (demos/profile_dual_fast.py DUAL_LADDER=5..8): window gn 1 iteration +
    tracker gn 2 + stride-0.6 good-feature compaction + less-flat cap
    2560 + 8 label-prop rounds + localmap precaps 512/2560. Measured on
    chip: dual rig 108.9 fps median / ATE max 1.98 cm (vs 86 / 2.62 for
    the plain rig budget); single rig 137.8 fps / 1.49 cm (vs 120.0 /
    1.58) — faster AND more accurate on both rigs. The extra window
    iterations the default runs buy nothing once the tracker seeds well;
    stride decimation also improves ATE (fewer aliased correspondences at
    equal map density)."""
    return dataclasses.replace(
        cfg,
        odometry=dataclasses.replace(
            cfg.odometry, gn_iters=1, gf_ratio=0.6, gf_method="stride",
            gf_compact=True,
            localmap_precap_corner=512, localmap_precap_surf=2560),
        tracker=dataclasses.replace(cfg.tracker, gn_iters=2),
        segmenter=dataclasses.replace(cfg.segmenter, label_iters=8),
        features=dataclasses.replace(cfg.features, cap_less_flat=2560),
    )


def synthetic(n_lidars: int = 1, extrinsic_mode: int = 0) -> MloamConfig:
    """The simulator fixture platform (tests/bench)."""
    return _rig_budget(MloamConfig(rig=LidarRig(models=(SIM16,) * n_lidars,
                                                extrinsic_mode=extrinsic_mode)))


def indoor_degenerate(cfg: MloamConfig) -> MloamConfig:
    """The indoor/degenerate-geometry operating point: ARM the solution
    remap (window + mapper) at the calibrated threshold with the round-5
    harm-reduction stack (persistence + purity gating, canonical-axis
    snapping, projector-consistent marginalization).

    The product DEFAULT ships the remap disarmed because no measurement-
    Hessian statistic separates corridor degeneracy from genuine sparse
    geometry on turning courses (six gates measured and ruled out — see
    config.OdometryConfig.eig_threshold and BENCH_NOTES "Round-5
    degeneracy-gate investigation"); arming is an ENVIRONMENT decision,
    exactly as the reference makes it per-platform (its eig_thre_ yaml,
    estimator.cpp:1598-1680; its config_simu_jackal.yaml vs indoor
    variants). Threshold 175 is calibrated for the 0.01 m noise regime:
    corridor window floors 113-156, rich floors at that noise >= 232
    (demos/calibrate_eig.py, probe_eig_gap.py)."""
    return dataclasses.replace(
        cfg,
        odometry=dataclasses.replace(cfg.odometry, eig_threshold=175.0),
        mapping=dataclasses.replace(cfg.mapping, eig_threshold=175.0),
    )
