"""Packet BVH traversal kernel (Pallas, TPU).

The vectorized per-ray walk (ops/traverse.py) is gather-bound and lockstep
across the whole batch; a TPU has no per-lane control flow, so the
TPU-native shape is *packet* (tile-uniform) traversal: each (8, 128)-ray
tile follows ONE scalar node cursor through the stackless linear BVH
(hit ⇒ i+1, miss ⇒ escape — the same encoding as pt_bvh.cl:93-102), where
"hit" means ANY live ray in the tile hits the node's AABB. Node and
triangle records live in VMEM and are read as scalar rows; all per-ray math
is full-width VPU work. Fed with Morton/octant-sorted rays (coherent tiles
visit near the per-ray optimal node count), this removes both the gather
cost and the global-lockstep divergence of the XLA walk.

Capacity: node + triangle tables must fit VMEM (~16 MB) — roughly 100k
triangles. Larger scenes fall back to the chunked XLA walk.
"""

from __future__ import annotations

import functools

import numpy as np

from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import LinearBVH, TrianglesSoA
from pbr_tpu.utils.config import EPSILON5

_TILE_ROWS = 8
_LANES = 128
_TILE = _TILE_ROWS * _LANES

PALLAS_BVH_MAX_FACES = 100_000


def _kernel(n_nodes, max_leaf, nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, f_ref):
    """One (8, 128) ray tile through the whole BVH.

    nodes_ref: (N, 16) f32 VMEM — [bbmin.xyz, bbmax.xyz, leaf_first,
    leaf_count, exit, pad...]; tris_ref: (F, 16) f32 VMEM — [v0, e1, e2,
    pad...]. Scalar row reads drive the tile-uniform cursor.
    """
    import jax
    import jax.numpy as jnp

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def slab1(lo_s, hi_s, o, inv):
        a = (lo_s - o) * inv
        b = (hi_s - o) * inv
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        # NaN (origin on slab plane, parallel ray) → no constraint.
        lo = jnp.where(lo == lo, lo, -jnp.inf)
        hi = jnp.where(hi == hi, hi, jnp.inf)
        return lo, hi

    def body(carry):
        i, t_best, f_best = carry
        rec = nodes_ref[i, :]
        lo_x, hi_x = slab1(rec[0], rec[3], ox, inv_x)
        lo_y, hi_y = slab1(rec[1], rec[4], oy, inv_y)
        lo_z, hi_z = slab1(rec[2], rec[5], oz, inv_z)
        t_near = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
        t_far = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
        hit = (t_near <= t_far) & (t_far > np.float32(EPSILON5)) & (t_best > t_near)
        any_hit = jnp.any(hit)

        leaf_first = rec[6].astype(jnp.int32)
        leaf_count = rec[7].astype(jnp.int32)
        exit_i = rec[8].astype(jnp.int32)
        is_leaf = leaf_first >= 0

        def leaf_tests(args):
            t_best, f_best = args
            for k in range(max_leaf):
                fidx = jnp.clip(leaf_first + k, 0, tris_ref.shape[0] - 1)
                tri = tris_ref[fidx, :]
                # Möller-Trumbore, scalar triangle vs ray tile
                # (same formula as ops/intersect.py::moller_trumbore).
                px = dy * tri[8] - dz * tri[7]
                py = dz * tri[6] - dx * tri[8]
                pz = dx * tri[7] - dy * tri[6]
                det = tri[3] * px + tri[4] * py + tri[5] * pz
                inv_det = 1.0 / det
                tx = ox - tri[0]
                ty = oy - tri[1]
                tz = oz - tri[2]
                qx = ty * tri[5] - tz * tri[4]
                qy = tz * tri[3] - tx * tri[5]
                qz = tx * tri[4] - ty * tri[3]
                t = (tri[6] * qx + tri[7] * qy + tri[8] * qz) * inv_det
                u = (tx * px + ty * py + tz * pz) * inv_det
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                ok = (
                    hit
                    & (k < leaf_count)
                    & (t >= np.float32(EPSILON5))
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t < t_best)
                )
                t_best = jnp.where(ok, t, t_best)
                f_best = jnp.where(ok, leaf_first + k, f_best)
            return t_best, f_best

        t_best, f_best = jax.lax.cond(
            any_hit & is_leaf, leaf_tests, lambda a: a, (t_best, f_best)
        )
        nxt = jnp.where(any_hit, i + 1, exit_i)
        return nxt, t_best, f_best

    def cond(carry):
        return carry[0] < n_nodes

    t0 = jnp.full(ox.shape, INF, dtype=jnp.float32)
    f0 = jnp.full(ox.shape, -1, dtype=jnp.int32)
    _, t_best, f_best = jax.lax.while_loop(cond, body, (np.int32(0), t0, f0))
    t_ref[...] = t_best
    f_ref[...] = f_best


@functools.lru_cache(maxsize=None)
def _build_call(n_nodes: int, n_faces: int, rows: int, max_leaf: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, n_nodes, max_leaf),
        grid=grid,
        in_specs=[table_spec, table_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )


def intersect_bvh_packet(
    xp, o: Vec3, d: Vec3, bvh: LinearBVH, tris: TrianglesSoA,
    max_leaf: int = 2, sort: bool = True, interpret: bool = False,
):
    """Nearest-hit via packet traversal (jax + TPU only). Same contract as
    ``intersect_brute``; rays are Morton/octant-sorted into coherent tiles
    when ``sort`` (results are per-ray, so sorting is exact)."""
    import jax.numpy as jnp

    from pbr_tpu.ops.traverse import _coherence_keys

    n = bvh.count
    nf = int(tris.v0.x.shape[0])
    shape = o.x.shape
    flat = int(np.prod(shape)) if shape else 1

    ox, oy, oz = o.x.reshape(-1), o.y.reshape(-1), o.z.reshape(-1)
    dx, dy, dz = d.x.reshape(-1), d.y.reshape(-1), d.z.reshape(-1)
    pad = (-flat) % _TILE
    if pad:
        far = jnp.full((pad,), 1.0e30, dtype=jnp.float32)
        one = jnp.ones((pad,), dtype=jnp.float32)
        ox, oy, oz = (jnp.concatenate([a, far]) for a in (ox, oy, oz))
        dx, dy, dz = (jnp.concatenate([a, one]) for a in (dx, dy, dz))
    total = flat + pad

    if sort:
        keys = _coherence_keys(jnp, Vec3(ox, oy, oz), Vec3(dx, dy, dz), bvh)
        perm = jnp.argsort(keys)
        ox, oy, oz, dx, dy, dz = (a[perm] for a in (ox, oy, oz, dx, dy, dz))

    prep = lambda a: a.reshape(total // _LANES, _LANES)  # noqa: E731

    zeros_n = jnp.zeros((n,), dtype=jnp.float32)
    nodes = jnp.stack(
        [
            bvh.bb_min.x, bvh.bb_min.y, bvh.bb_min.z,
            bvh.bb_max.x, bvh.bb_max.y, bvh.bb_max.z,
            bvh.leaf_first.astype(jnp.float32),
            bvh.leaf_count.astype(jnp.float32),
            bvh.exit.astype(jnp.float32),
        ] + [zeros_n] * 7,
        axis=1,
    )  # (N, 16)
    zeros_f = jnp.zeros((nf,), dtype=jnp.float32)
    trisrow = jnp.stack(
        [
            tris.v0.x, tris.v0.y, tris.v0.z,
            tris.e1.x, tris.e1.y, tris.e1.z,
            tris.e2.x, tris.e2.y, tris.e2.z,
        ] + [zeros_f] * 7,
        axis=1,
    )  # (F, 16)

    call = _build_call(n, nf, total // _LANES, max_leaf, interpret)
    t, f = call(nodes, trisrow, prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz))
    t = t.reshape(-1)
    f = f.reshape(-1)
    if sort:
        inv = jnp.argsort(perm)
        t, f = t[inv], f[inv]
    return t[:flat].reshape(shape), f[:flat].reshape(shape)
