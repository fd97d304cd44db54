from mloam_tpu.frontend import segmentation, features  # noqa: F401
