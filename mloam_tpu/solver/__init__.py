from mloam_tpu.solver import robust, gauss_newton, factors, degeneracy, marginalization  # noqa: F401
