from mloam_tpu.odometry import tracker  # noqa: F401
