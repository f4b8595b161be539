"""Fused brute-force intersection kernel (Pallas, TPU).

Why: the XLA formulations stream per-face intermediates through HBM — the
(B, 4F) GEMM output alone is ~0.5 KB/ray — so intersection is bandwidth
bound at ~50 M rays/s. This kernel keeps the entire all-faces competition in
VMEM/registers: HBM traffic is 6 f32 in + 2 words out per ray (32 B), and
the F-face loop is unrolled over (8, 128) ray tiles on the VPU. Triangle
data (v0/e1/e2 per face) rides in SMEM and is read as scalars.

Same Möller-Trumbore math and first-face-wins tie-breaking as
``ops.intersect.moller_trumbore`` / ``ops.traverse.intersect_brute`` (the
vectorized re-design of the reference's pt_intersect.cl:92-129), so it is
interchangeable with the other intersectors behind ``intersect_scene``.

Layout contract: rays are processed as (rows, 128) f32 tiles, 8 rows per
grid program. The wrapper pads the flat ray batch to a multiple of 1024.
"""

from __future__ import annotations

import functools

import numpy as np

from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import TrianglesSoA
from pbr_tpu.utils.config import EPSILON5

_TILE_ROWS = 8
_LANES = 128


def _kernel(nf, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, f_ref):
    """One (8, 128) ray tile vs all ``nf`` triangles.

    ``tri_ref``: (9, F) SMEM — rows are v0.xyz, e1.xyz, e2.xyz.
    """
    import jax.numpy as jnp

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]

    t_best = jnp.full(ox.shape, INF, dtype=jnp.float32)
    f_best = jnp.full(ox.shape, -1, dtype=jnp.int32)

    for f in range(nf):
        v0x = tri_ref[0, f]
        v0y = tri_ref[1, f]
        v0z = tri_ref[2, f]
        e1x = tri_ref[3, f]
        e1y = tri_ref[4, f]
        e1z = tri_ref[5, f]
        e2x = tri_ref[6, f]
        e2y = tri_ref[7, f]
        e2z = tri_ref[8, f]

        # pvec = d x e2 (scalar e2 per face, vector d per lane)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / det
        # tvec = o - v0 ; qvec = tvec x e1
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        u = (tx * px + ty * py + tz * pz) * inv_det
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        ok = (
            (t >= np.float32(EPSILON5))
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t < t_best)
        )
        t_best = jnp.where(ok, t, t_best)
        f_best = jnp.where(ok, np.int32(f), f_best)

    t_ref[...] = t_best
    f_ref[...] = f_best


@functools.lru_cache(maxsize=None)
def _build_call(nf: int, rows: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        functools.partial(_kernel, nf),
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
    )
    return call


def intersect_pallas(xp, o: Vec3, d: Vec3, tris: TrianglesSoA):
    """Nearest-hit over all triangles, fused on-chip. jax-only."""
    import jax.numpy as jnp

    nf = int(tris.v0.x.shape[0])
    shape = o.x.shape
    flat = o.x.reshape(-1).shape[0]
    pad = (-flat) % (_TILE_ROWS * _LANES)
    total = flat + pad

    def prep(a):
        a = a.reshape(-1)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        return a.reshape(total // _LANES, _LANES)

    tri = jnp.stack(
        [
            tris.v0.x, tris.v0.y, tris.v0.z,
            tris.e1.x, tris.e1.y, tris.e1.z,
            tris.e2.x, tris.e2.y, tris.e2.z,
        ],
        axis=0,
    )  # (9, F)

    call = _build_call(nf, total // _LANES)
    t, f = call(tri, prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z))
    t = t.reshape(-1)[:flat].reshape(shape)
    f = f.reshape(-1)[:flat].reshape(shape)
    return t, f
