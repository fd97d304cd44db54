from mloam_tpu.loop import scancontext, registration, posegraph  # noqa: F401
