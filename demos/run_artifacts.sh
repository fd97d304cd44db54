#!/bin/bash
# Regenerate all experiment artifacts (CPU, hermetic) sequentially.
# Usage: bash demos/run_artifacts.sh [stage ...]   (default: all)
set -x
cd /root/repo
ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache"
stages=${@:-"slam inject_ext long calib4 scaling single mc gf corridor"}

for s in $stages; do
  case $s in
    # the loop course laps in 100 frames (period_s 10 at 10 Hz): 230 frames
    # = two laps + revisit runway, range noise on — material drift (~1% of
    # path) accumulates at re-entry so the PGO benefit is measurable
    slam)    timeout 5400 $ENV python -m mloam_tpu.models.experiments slam --traj loop --noise 0.03 --frames 260 ;;
    inject_ext) timeout 3600 $ENV python -m mloam_tpu.models.experiments inject_ext --frames 30 ;;
    long)    timeout 3600 $ENV python -m mloam_tpu.models.experiments long --frames 500 ;;
    calib4)  timeout 3600 $ENV python -m mloam_tpu.models.experiments calib --lidars 4 --frames 90 ;;
    scaling) timeout 2400 $ENV env XLA_FLAGS=--xla_force_host_platform_device_count=16 \
               python -m mloam_tpu.models.experiments scaling --poses 1024 ;;
    single)  timeout 1200 $ENV python -m mloam_tpu.models.experiments single --frames 40 ;;
    mc)      timeout 2400 $ENV python -m mloam_tpu.models.experiments mc --trials 3 --frames 30 ;;
    # gf runs on the default (TPU) platform: its fps column is the point
    gf)      timeout 3600 env PYTHONPATH=/root/repo python demos/gf_tradeoff.py ;;
    corridor) timeout 2400 $ENV python -m mloam_tpu.models.experiments corridor --frames 90 ;;
  esac
done
echo "ALL ARTIFACTS DONE"
