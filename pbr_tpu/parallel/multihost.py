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


def pixel_id_sharding(mesh):
    """The ('dp',)-sharded NamedSharding pixel batches use."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    return NamedSharding(mesh, P("dp"))


def shard_index_map(mesh, npx: int):
    """{device: index-tuple} for the (npx,) dp-sharded pixel array, derived
    from the sharding itself — valid for ANY device order / process layout
    (no contiguous-default-order assumption)."""
    return pixel_id_sharding(mesh).devices_indices_map((npx,))


def host_local_pixel_ids(mesh, width: int, height: int, dtype=np.int32):
    """The global (npix,) pixel-id array, each host materializing only the
    shards its own devices address.

    Built with ``jax.make_array_from_callback``: jax asks for exactly the
    index tuples of this process's addressable shards (from
    ``shard_index_map``), so non-contiguous or permuted dp layouts are
    handled by construction. Pixel ids are *global* (the value at global
    index i is i) — the counter RNG keys off them, which is what makes the
    image independent of host count and mesh layout.
    """
    import jax
    import jax.numpy as jnp

    npx = width * height

    def cb(index):
        # index is a tuple of slices into the (npx,) global shape.
        (sl,) = index
        start, stop, step = sl.indices(npx)
        return jnp.arange(start, stop, step, dtype=dtype)

    return jax.make_array_from_callback((npx,), pixel_id_sharding(mesh), cb)
