from mloam_tpu.ops import voxel, knn, select  # noqa: F401
