from pbr_tpu.accel.bvh import BuildStats, build_bvh  # noqa: F401
