from mloam_tpu.mapping import keyframes, mapper  # noqa: F401
