from pbr_tpu.models.integrator import trace_rays  # noqa: F401
from pbr_tpu.models.pathtracer import PathTracer  # noqa: F401
