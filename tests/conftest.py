"""Test harness config: run JAX on a virtual 8-device CPU mesh.

This is the standard way to test TPU sharding logic without a pod
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).

Note: the environment may import jax at interpreter startup (sitecustomize)
with a TPU backend pinned via JAX_PLATFORMS; backends initialize lazily, so
overriding through jax.config before first device use still works — plain
os.environ would be too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
