from mloam_tpu.models import pipeline, platforms  # noqa: F401
