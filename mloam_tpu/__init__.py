"""mloam_tpu — TPU-native multi-LiDAR odometry, mapping, and online extrinsic
calibration.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of M-LOAM
(gogojjh/M-LOAM): curvature-based LiDAR feature extraction, scan-to-scan
tracking, sliding-window odometry with online multi-LiDAR extrinsic
calibration, uncertainty-aware keyframe mapping, and loop-closure pose-graph
optimization — all expressed as batched, statically-shaped tensor programs
(Gauss-Newton/LM with Schur complement replacing Ceres; brute-force/voxel-hash
matmul correspondence search replacing PCL kd-trees).

Layer map (bottom-up):
  core/      geometry (SO(3)/SE(3)), covariance algebra, cloud tensor schema
  ops/       batched primitives: kNN, voxel grid scatter, masked top-k, Pallas kernels
  frontend/  range-image projection, segmentation, curvature feature extraction
  solver/    factor library, robust losses, GN/LM + Schur, marginalization, degeneracy
  odometry/  scan-to-scan tracker, hand-eye initializer, sliding-window estimator
  mapping/   voxel-hashed map, keyframe DB, scan-to-map refinement
  loop/      scan-context retrieval, coarse+fine registration, pose-graph optimization
  parallel/  device-mesh sharding of BA/PGO (pjit/shard_map + collectives)
  models/    per-platform pipeline assemblies (SR, RHD, RV-Hercules, Oxford, KITTI)
  sim/       synthetic multi-LiDAR world generator (deterministic test fixtures)
  utils/     timing registry, TUM trajectory I/O, ATE/RPE evaluation
"""

import jax as _jax

# SLAM geometry gives bf16 matmuls nothing: every matrix product here is
# either numerically critical (normal equations, Schur complements, plane/
# line fits whose outputs steer the solver) or too small to win MXU
# throughput from reduced precision. At the TPU default (bf16 accumulation)
# the Schur-complement marginalization is only *marginally* stable — runs
# flip between cm-level and 20x-worse ATE depending on unrelated XLA fusion
# choices. Float32 matmuls are therefore the framework default; the one
# genuinely MXU-heavy product (kNN distance expansion, ops/knn.py) pins
# HIGHEST explicitly regardless.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
