from pbr_tpu.ops import rng  # noqa: F401
