"""Multi-host execution glue.

The reference was one process on one GPU (SURVEY.md §2.5); scaling past a
chip here means `jax.distributed` + a mesh spanning every host's devices.
ICI carries the collectives within a slice and DCN across hosts — the same
`psum`s as single-host, inserted by XLA; nothing in the render or train
step changes. What this module adds is the process-level choreography:

- ``initialize()``: `jax.distributed.initialize` (env-driven on TPU pods);
- ``global_mesh()``: a ('dp','sp') mesh over *all* devices across hosts;
- ``host_local_pixel_ids()``: each host feeds only its dp-shard of the
  pixel batch (``jax.make_array_from_process_local_data`` assembles the
  global array);
- determinism: the counter RNG keys off *global* pixel ids, so host count
  and layout cannot change the image (tested on the virtual CPU mesh in
  tests/test_sharding.py::test_sharded_render_deterministic_across_layouts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the jax distributed runtime. On TPU pods all arguments are
    discovered from the environment; pass them explicitly elsewhere."""
    import jax

    kw = {}
    if coordinator_address is not None:
        kw = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def global_mesh(n_sp: int = 1):
    """('dp','sp') mesh over every device of every process."""
    from pbr_tpu.parallel.mesh import make_mesh

    import jax

    return make_mesh(n_dp=len(jax.devices()) // n_sp, n_sp=n_sp)


def host_local_pixel_ids(mesh, width: int, height: int):
    """The global (npix,) pixel-id array assembled from per-process local
    shards — each host materializes only its own dp tile."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    npx = width * height
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() == 1:
        return jax.device_put(jnp.arange(npx, dtype=jnp.int32), sharding)
    local = np.arange(npx, dtype=np.int32)  # global ids; slicing per process
    return jax.make_array_from_process_local_data(
        sharding, local[_process_slice(mesh, npx)], (npx,)
    )


def _process_slice(mesh, npx: int):
    import jax

    n_dp = mesh.shape["dp"]
    per = npx // n_dp
    # dp shards owned by this process, assuming the default device order.
    my = [i for i, dev in enumerate(np.asarray(mesh.devices)[:, 0]) if dev.process_index == jax.process_index()]
    lo = min(my) * per
    hi = (max(my) + 1) * per
    return slice(lo, hi)
