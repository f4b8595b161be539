"""Persistent XLA compilation cache.

The wavefront integrator is one large fused program; its first compile for a
new (scene-shape, settings) pair costs tens of seconds (the analog of the
reference's per-scene clBuildProgram, CL.cpp:58-80 — which the OpenCL driver
also cached on disk). JAX's persistent compilation cache keys on the HLO, so
re-running the same config — across processes — loads the binary instead of
recompiling. Enabled by the CLI and bench entry points; set
``PBR_TPU_NO_CACHE=1`` to disable (e.g. when measuring cold compiles).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("PBR_TPU_CACHE_DIR", "/tmp/pbr_tpu_jax_cache")


def enable_persistent_cache(path: str = DEFAULT_DIR) -> bool:
    """Turn on JAX's on-disk compilation cache. Returns False when disabled
    by env or unsupported by the installed jax."""
    if os.environ.get("PBR_TPU_NO_CACHE") == "1":
        return False
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took meaningfully long to compile.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # Some jax versions gate non-TPU backends behind this:
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        except Exception:
            pass
    except Exception:
        return False
    return True
