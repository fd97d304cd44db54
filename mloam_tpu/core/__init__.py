from mloam_tpu.core import rotations, se3, uncertainty, cloud, rangeimage  # noqa: F401
