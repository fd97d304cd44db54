from mloam_tpu.parallel import mesh, sharded_pgo  # noqa: F401
