from mloam_tpu.utils import evaluation, timing  # noqa: F401
