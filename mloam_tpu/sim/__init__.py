from mloam_tpu.sim import world  # noqa: F401
