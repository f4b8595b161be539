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

Capacity: the node and triangle tables are (rows, 16) f32 VMEM arrays, and
VMEM tiles f32 as (8, 128) — each row occupies a full 128-lane tile line
(512 B), not 64 B. With ~16 MB VMEM and room for ray tiles, the budget is
~24k table rows ≈ 10k triangles (nodes ≈ 1.2×faces with 2-face leaves).
Larger scenes fall back to the chunked XLA walk (``intersect_scene`` auto
dispatch checks ``packet_fits``).
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

# Max (nodes + faces) table rows resident in VMEM: 24576 rows x 512 B = 12 MB,
# leaving ~4 MB for ray tiles and double buffering.
PALLAS_BVH_MAX_ROWS = 24_576


def packet_fits(bvh: LinearBVH, tris: TrianglesSoA) -> bool:
    """True when the scene's node+triangle tables fit the VMEM row budget."""
    return bvh.count + int(tris.mtl.shape[0]) <= PALLAS_BVH_MAX_ROWS


def _traverse_tile(n_nodes, max_leaf, nodes_ref, tris_ref,
                   ox, oy, oz, dx, dy, dz, t_ref, f_ref, t_limit=None,
                   occ_ref=None, t_init=None, f_init=None, occ_init=None):
    """Tile-uniform stackless walk of one (8, 128) ray tile.

    ``t_limit`` None: nearest-hit — writes (t, face) into ``t_ref``/``f_ref``.
    ``t_limit`` array: any-hit with t < t_limit (NEE shadow leg, the analog
    of traverseShadows' early-out, pt_bvh.cl:133-177) — writes an int mask
    into ``occ_ref``; the walk stops early once every ray is occluded.

    ``t_init``/``f_init`` (or ``occ_init`` in any-hit mode): optional refs
    seeding the best-hit state instead of INF/-1 (or 0). The forest threads
    the running best across its sub-tree walks this way, so chunk k+1's
    node tests prune against everything chunks 0..k already found (the
    cross-tree analog of the single walk's ``t_best > t_near`` cut), and an
    already-occluded tile early-outs a later shadow walk at its root.

    Mosaic shape constraints drive the structure: the while carry is
    SCALAR-only (node cursor + early-exit flag — vector-carrying scf.while/
    scf.if does not legalize on this libtpu), with the per-ray best-hit
    state living in the output refs; leaf tests run unconditionally under
    masks (predicated full-width VPU work instead of divergent control
    flow — an inner-node step wastes two masked Möller-Trumbore
    evaluations, far cheaper than a branch).
    """
    import jax
    import jax.numpy as jnp

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

    any_hit_mode = t_limit is not None
    if any_hit_mode:
        if occ_init is not None:
            occ_ref[...] = occ_init[...]
        else:
            occ_ref[...] = jnp.zeros(ox.shape, dtype=jnp.int32)
    elif t_init is not None:
        t_ref[...] = t_init[...]
        f_ref[...] = f_init[...]
    else:
        t_ref[...] = jnp.full(ox.shape, INF, dtype=jnp.float32)
        f_ref[...] = jnp.full(ox.shape, -1, dtype=jnp.int32)

    def body(carry):
        i, _done = carry
        rec = nodes_ref[i, :]
        lo_x, hi_x = slab1(rec[0], rec[3], ox, inv_x)
        lo_y, hi_y = slab1(rec[1], rec[4], oy, inv_y)
        lo_z, hi_z = slab1(rec[2], rec[5], oz, inv_z)
        t_near = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
        t_far = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
        # rec[0] <= rec[3]: guard against the forest's inverted padding
        # AABBs (min=+inf, max=-inf) — slab1's min/max(a, b) per axis would
        # otherwise turn them into lo=-inf/hi=+inf unconditional hits,
        # walking the whole padding chain one node per step instead of
        # exiting at the first padding node (accel/forest.py::_pad_bvh).
        nonempty = rec[0] <= rec[3]
        hit = (t_near <= t_far) & (t_far > np.float32(EPSILON5)) & nonempty
        if any_hit_mode:
            occ = occ_ref[...] != 0
            hit = hit & ~occ & (t_limit > t_near)
        else:
            t_best = t_ref[...]
            f_best = f_ref[...]
            hit = hit & (t_best > t_near)
        any_hit = jnp.any(hit)

        leaf_first = rec[6].astype(jnp.int32)
        leaf_count = rec[7].astype(jnp.int32)
        exit_i = rec[8].astype(jnp.int32)

        do_leaf = hit & (leaf_first >= 0)
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
            valid = (
                do_leaf
                & (k < leaf_count)
                & (t >= np.float32(EPSILON5))
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            if any_hit_mode:
                occ = occ | (valid & (t < t_limit))
            else:
                ok = valid & (t < t_best)
                t_best = jnp.where(ok, t, t_best)
                f_best = jnp.where(ok, leaf_first + k, f_best)
        if any_hit_mode:
            occ_ref[...] = occ.astype(jnp.int32)
            done = jnp.all(occ)
        else:
            t_ref[...] = t_best
            f_ref[...] = f_best
            done = jnp.bool_(False)

        nxt = jnp.where(any_hit, i + 1, exit_i)
        return nxt, done

    def cond(carry):
        return (carry[0] < n_nodes) & ~carry[1]

    jax.lax.while_loop(cond, body, (np.int32(0), jnp.bool_(False)))


def _kernel(n_nodes, max_leaf, nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, f_ref):
    """One (8, 128) ray tile through the whole BVH.

    nodes_ref: (N, 16) f32 VMEM — [bbmin.xyz, bbmax.xyz, leaf_first,
    leaf_count, exit, pad...]; tris_ref: (F, 16) f32 VMEM — [v0, e1, e2,
    pad...]. Scalar row reads drive the tile-uniform cursor.
    """
    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
        t_ref, f_ref,
    )


def _kernel_nee(n_nodes, max_leaf, nodes_ref, tris_ref, lp_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                t_ref, f_ref, occ_ref):
    """Fused primary nearest-hit + NEE shadow any-hit through the BVH.

    The shadow leg re-derives the hit point / light direction with exactly
    the integrator's guarded math (t_safe for missed lanes, safe_sqrt /
    safe_div semantics) — the same contract as the brute Pallas NEE kernel
    (ops/pallas_intersect.py::_kernel_nee) so either is a drop-in behind
    ``intersect_scene``. ``lp_ref``: (3,) SMEM — light 0 position (NEE
    always samples lights[0], pathtracing.cl:188-199).
    """
    import jax.numpy as jnp

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]

    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
        t_ref, f_ref,
    )
    t_best = t_ref[...]

    one = np.float32(1.0)
    hit = t_best < INF
    ts = jnp.where(hit, t_best, one)
    hx = ox + dx * ts
    hy = oy + dy * ts
    hz = oz + dz * ts
    lx = lp_ref[0] - hx
    ly = lp_ref[1] - hy
    lz = lp_ref[2] - hz
    len2 = lx * lx + ly * ly + lz * lz
    pos = len2 > 0.0
    t_light = jnp.where(pos, jnp.sqrt(jnp.where(pos, len2, one)), 0.0)
    okd = jnp.abs(t_light) > np.float32(1e-12)
    inv = jnp.where(okd, one / jnp.where(okd, t_light, one), 0.0)
    sx = lx * inv
    sy = ly * inv
    sz = lz * inv

    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref, hx, hy, hz, sx, sy, sz,
        None, None, t_limit=t_light, occ_ref=occ_ref,
    )


def _kernel_shadow(n_nodes, max_leaf, nodes_ref, tris_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tlim_ref, occ_ref):
    """Standalone any-hit walk (occluded iff some face hits with
    t < t_limit) — the shadow leg of ``_kernel_nee`` as its own kernel, for
    callers that must finish the nearest pass globally before deriving
    shadow rays (the forest combines K sub-tree results first)."""
    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
        None, None, t_limit=tlim_ref[...], occ_ref=occ_ref,
    )


def _kernel_seeded(n_nodes, max_leaf, nodes_ref, tris_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tin_ref, fin_ref, t_ref, f_ref):
    """Nearest-hit walk seeded with a running best (the forest's
    cross-chunk pruning — see ``_traverse_tile``'s docstring)."""
    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
        t_ref, f_ref, t_init=tin_ref, f_init=fin_ref,
    )


def _kernel_shadow_seeded(n_nodes, max_leaf, nodes_ref, tris_ref,
                          ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tlim_ref, oin_ref, occ_ref):
    """Any-hit walk seeded with a running occlusion mask: a tile whose rays
    are all already occluded early-outs at the first step."""
    _traverse_tile(
        n_nodes, max_leaf, nodes_ref, tris_ref,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
        None, None, t_limit=tlim_ref[...], occ_ref=occ_ref,
        occ_init=oin_ref,
    )


@functools.lru_cache(maxsize=None)
def _build_call(n_nodes: int, n_faces: int, rows: int, max_leaf: int,
                nee: bool = False, interpret: bool = False,
                shadow: bool = False, seeded: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    t_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    f_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    if shadow and seeded:
        return pl.pallas_call(
            functools.partial(_kernel_shadow_seeded, n_nodes, max_leaf),
            grid=grid,
            in_specs=[table_spec, table_spec] + [ray_spec] * 8,
            out_specs=ray_spec,
            out_shape=f_shape,
            interpret=interpret,
        )
    if shadow:
        return pl.pallas_call(
            functools.partial(_kernel_shadow, n_nodes, max_leaf),
            grid=grid,
            in_specs=[table_spec, table_spec] + [ray_spec] * 7,
            out_specs=ray_spec,
            out_shape=f_shape,
            interpret=interpret,
        )
    if seeded:
        return pl.pallas_call(
            functools.partial(_kernel_seeded, n_nodes, max_leaf),
            grid=grid,
            in_specs=[table_spec, table_spec] + [ray_spec] * 8,
            out_specs=(ray_spec, ray_spec),
            out_shape=(t_shape, f_shape),
            interpret=interpret,
        )
    if nee:
        lp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            functools.partial(_kernel_nee, n_nodes, max_leaf),
            grid=grid,
            in_specs=[table_spec, table_spec, lp_spec] + [ray_spec] * 6,
            out_specs=(ray_spec, ray_spec, ray_spec),
            out_shape=(t_shape, f_shape, f_shape),
            interpret=interpret,
        )
    return pl.pallas_call(
        functools.partial(_kernel, n_nodes, max_leaf),
        grid=grid,
        in_specs=[table_spec, table_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(t_shape, f_shape),
        interpret=interpret,
    )


def intersect_bvh_packet(
    xp, o: Vec3, d: Vec3, bvh: LinearBVH, tris: TrianglesSoA,
    max_leaf: int = 2, sort: bool = True, light_pos=None, interpret: bool = False,
):
    """Nearest-hit via packet traversal (jax + TPU only). Same contract as
    ``intersect_brute``; rays are Morton/octant-sorted into coherent tiles
    when ``sort`` (results are per-ray, so sorting is exact).

    With ``light_pos`` (scalar Vec3, light 0) the NEE shadow any-hit runs
    fused in the same kernel and ``(t, face, occluded)`` is returned."""
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

    rays = (prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz))
    if light_pos is not None:
        import jax

        lp = jax.lax.stop_gradient(
            jnp.stack(
                [
                    jnp.asarray(light_pos.x, jnp.float32),
                    jnp.asarray(light_pos.y, jnp.float32),
                    jnp.asarray(light_pos.z, jnp.float32),
                ]
            )
        )
        call = _build_call(n, nf, total // _LANES, max_leaf, nee=True, interpret=interpret)
        t, f, occ = call(nodes, trisrow, lp, *rays)
        t, f, occ = t.reshape(-1), f.reshape(-1), occ.reshape(-1)
        if sort:
            inv = jnp.argsort(perm)
            t, f, occ = t[inv], f[inv], occ[inv]
        return (
            t[:flat].reshape(shape),
            f[:flat].reshape(shape),
            occ[:flat].reshape(shape) != 0,
        )
    call = _build_call(n, nf, total // _LANES, max_leaf, interpret=interpret)
    t, f = call(nodes, trisrow, *rays)
    t = t.reshape(-1)
    f = f.reshape(-1)
    if sort:
        inv = jnp.argsort(perm)
        t, f = t[inv], f[inv]
    return t[:flat].reshape(shape), f[:flat].reshape(shape)


# ---------------------------------------------------------------------------
# Big-scene variant: nodes resident in VMEM, triangles DMA'd from HBM.
#
# The VMEM-resident kernel above caps at PALLAS_BVH_MAX_ROWS records. For
# scenes beyond it (the chunked XLA walk runs at ~0.03 M rays/s on a 100k-tri
# soup — unusable), the TPU-native shape is two-level: a COARSE BVH
# (scene/build.py builds 64-face leaves for >20k-face scenes, so ~6k nodes =
# 3 MB sit in VMEM) drives the same tile-uniform walk, and each leaf visit
# DMAs its contiguous 64-face slab (4 KB — triangles are stored in leaf
# order, accel/bvh.py) from the HBM-resident (F, 16) table into a VMEM
# scratch, then runs the unrolled masked sweep on it. Leaf work runs under
# pl.when (a leaf visit is rare relative to inner-node steps, and the
# 64-face sweep + DMA is too heavy to predicate away).

# (N, 16) f32 node rows pay 512 B each to lane padding; 12k nodes = 6 MB.
PACKET_HBM_MAX_NODES = 12_288


def packet_hbm_fits(bvh: LinearBVH) -> bool:
    """True when the coarse node table fits VMEM (triangles stay in HBM)."""
    return bvh.count <= PACKET_HBM_MAX_NODES


def _traverse_tile_hbm(n_nodes, max_leaf, nodes_ref, tris_hbm, slab_ref, sem,
                       ox, oy, oz, dx, dy, dz, t_ref, f_ref, t_limit=None,
                       occ_ref=None):
    """Tile-uniform walk with HBM leaf slabs (see module section above).

    Same traversal contract and MT math as ``_traverse_tile``; only the
    triangle fetch differs. Best-hit state lives in the output refs so the
    while carry stays scalar-only and leaf work can run under ``pl.when``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def slab1(lo_s, hi_s, o, inv):
        a = (lo_s - o) * inv
        b = (hi_s - o) * inv
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        lo = jnp.where(lo == lo, lo, -jnp.inf)
        hi = jnp.where(hi == hi, hi, jnp.inf)
        return lo, hi

    any_hit_mode = t_limit is not None
    if any_hit_mode:
        occ_ref[...] = jnp.zeros(ox.shape, dtype=jnp.int32)
    else:
        t_ref[...] = jnp.full(ox.shape, INF, dtype=jnp.float32)
        f_ref[...] = jnp.full(ox.shape, -1, dtype=jnp.int32)

    def body(carry):
        i, _done = carry
        rec = nodes_ref[i, :]
        lo_x, hi_x = slab1(rec[0], rec[3], ox, inv_x)
        lo_y, hi_y = slab1(rec[1], rec[4], oy, inv_y)
        lo_z, hi_z = slab1(rec[2], rec[5], oz, inv_z)
        t_near = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
        t_far = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
        # Empty/inverted padding AABBs must miss (see _traverse_tile).
        nonempty = rec[0] <= rec[3]
        hit = (t_near <= t_far) & (t_far > np.float32(EPSILON5)) & nonempty
        if any_hit_mode:
            hit = hit & (occ_ref[...] == 0) & (t_limit > t_near)
        else:
            hit = hit & (t_ref[...] > t_near)
        any_hit = jnp.any(hit)

        leaf_first = rec[6].astype(jnp.int32)
        leaf_count = rec[7].astype(jnp.int32)
        exit_i = rec[8].astype(jnp.int32)

        # Conditional-free leaf handling (vector-carrying scf.if does not
        # legalize on this libtpu — same constraint that shapes
        # _traverse_tile): EVERY step DMAs a slab (row 0 when this node is
        # not a live leaf — harmless prefetch) and runs the masked sweep;
        # do_leaf gates all state updates.
        src = jnp.where(any_hit & (leaf_first >= 0), leaf_first, 0)
        cp = pltpu.make_async_copy(
            tris_hbm.at[pl.ds(src, max_leaf), :], slab_ref, sem
        )
        cp.start()
        cp.wait()
        do_leaf = hit & (leaf_first >= 0)
        if any_hit_mode:
            occ = occ_ref[...] != 0
        else:
            t_best = t_ref[...]
            f_best = f_ref[...]
        for k in range(max_leaf):
            tri = slab_ref[k, :]
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
            valid = (
                do_leaf
                & (k < leaf_count)
                & (t >= np.float32(EPSILON5))
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            if any_hit_mode:
                occ = occ | (valid & (t < t_limit))
            else:
                ok = valid & (t < t_best)
                t_best = jnp.where(ok, t, t_best)
                f_best = jnp.where(ok, leaf_first + k, f_best)
        if any_hit_mode:
            occ_ref[...] = occ.astype(jnp.int32)
        else:
            t_ref[...] = t_best
            f_ref[...] = f_best

        if any_hit_mode:
            done = jnp.all(occ_ref[...] != 0)
        else:
            done = jnp.bool_(False)
        nxt = jnp.where(any_hit, i + 1, exit_i)
        return nxt, done

    def cond(carry):
        return (carry[0] < n_nodes) & ~carry[1]

    jax.lax.while_loop(cond, body, (np.int32(0), jnp.bool_(False)))


def _kernel_hbm(n_nodes, max_leaf, nodes_ref, tris_hbm,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                t_ref, f_ref, slab_ref, sem):
    _traverse_tile_hbm(
        n_nodes, max_leaf, nodes_ref, tris_hbm, slab_ref, sem,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
        t_ref, f_ref,
    )


def _kernel_hbm_nee(n_nodes, max_leaf, nodes_ref, tris_hbm, lp_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    t_ref, f_ref, occ_ref, slab_ref, sem):
    """Fused primary nearest-hit + NEE shadow any-hit, HBM-slab variant
    (same shadow-leg contract as ``_kernel_nee``)."""
    import jax.numpy as jnp

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]

    _traverse_tile_hbm(
        n_nodes, max_leaf, nodes_ref, tris_hbm, slab_ref, sem,
        ox, oy, oz, dx, dy, dz, t_ref, f_ref,
    )
    t_best = t_ref[...]

    one = np.float32(1.0)
    hit = t_best < INF
    ts = jnp.where(hit, t_best, one)
    hx = ox + dx * ts
    hy = oy + dy * ts
    hz = oz + dz * ts
    lx = lp_ref[0] - hx
    ly = lp_ref[1] - hy
    lz = lp_ref[2] - hz
    len2 = lx * lx + ly * ly + lz * lz
    pos = len2 > 0.0
    t_light = jnp.where(pos, jnp.sqrt(jnp.where(pos, len2, one)), 0.0)
    okd = jnp.abs(t_light) > np.float32(1e-12)
    inv = jnp.where(okd, one / jnp.where(okd, t_light, one), 0.0)
    sx = lx * inv
    sy = ly * inv
    sz = lz * inv

    _traverse_tile_hbm(
        n_nodes, max_leaf, nodes_ref, tris_hbm, slab_ref, sem,
        hx, hy, hz, sx, sy, sz, None, None,
        t_limit=t_light, occ_ref=occ_ref,
    )


@functools.lru_cache(maxsize=None)
def _build_call_hbm(n_nodes: int, rows: int, max_leaf: int,
                    nee: bool = False, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    nodes_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tris_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM

    t_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    f_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    scratch = [
        pltpu.VMEM((max_leaf, _LANES), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]
    if nee:
        lp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            functools.partial(_kernel_hbm_nee, n_nodes, max_leaf),
            grid=grid,
            in_specs=[nodes_spec, tris_spec, lp_spec] + [ray_spec] * 6,
            out_specs=(ray_spec, ray_spec, ray_spec),
            out_shape=(t_shape, f_shape, f_shape),
            scratch_shapes=scratch,
            interpret=interpret,
        )
    return pl.pallas_call(
        functools.partial(_kernel_hbm, n_nodes, max_leaf),
        grid=grid,
        in_specs=[nodes_spec, tris_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(t_shape, f_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )


def intersect_bvh_packet_hbm(
    xp, o: Vec3, d: Vec3, bvh: LinearBVH, tris: TrianglesSoA,
    max_leaf: int = 64, sort: bool = True, light_pos=None, interpret: bool = False,
):
    """Big-scene packet traversal: VMEM nodes + HBM triangle slabs.

    Same contract as ``intersect_bvh_packet``; requires
    ``packet_hbm_fits(bvh)`` and a BVH whose leaves hold ≤ ``max_leaf``
    faces (scene/build.py builds 64-face leaves for big scenes)."""
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
    # HBM DMA slices must be 128-lane aligned on the minor dim, so the
    # HBM-resident table is (F + max_leaf, 128): 512 B/row in cheap HBM,
    # arbitrary (unaligned) leaf_first row offsets, 32 KB per leaf slab.
    # The max_leaf zero-row tail keeps the fixed-size DMA in bounds
    # (padding rows read as det=0 -> never a valid hit).
    trisrow = jnp.pad(trisrow, ((0, max_leaf), (0, _LANES - 16)))

    rays = (prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz))
    if light_pos is not None:
        import jax

        lp = jax.lax.stop_gradient(
            jnp.stack(
                [
                    jnp.asarray(light_pos.x, jnp.float32),
                    jnp.asarray(light_pos.y, jnp.float32),
                    jnp.asarray(light_pos.z, jnp.float32),
                ]
            )
        )
        call = _build_call_hbm(
            n, total // _LANES, max_leaf, nee=True, interpret=interpret
        )
        t, f, occ = call(nodes, trisrow, lp, *rays)
        t, f, occ = t.reshape(-1), f.reshape(-1), occ.reshape(-1)
        if sort:
            inv = jnp.argsort(perm)
            t, f, occ = t[inv], f[inv], occ[inv]
        return (
            t[:flat].reshape(shape),
            f[:flat].reshape(shape),
            occ[:flat].reshape(shape) != 0,
        )
    call = _build_call_hbm(n, total // _LANES, max_leaf, interpret=interpret)
    t, f = call(nodes, trisrow, *rays)
    t = t.reshape(-1)
    f = f.reshape(-1)
    if sort:
        inv = jnp.argsort(perm)
        t, f = t[inv], f[inv]
    return t[:flat].reshape(shape), f[:flat].reshape(shape)


# ---------------------------------------------------------------------------
# Forest traversal: big scenes as K VMEM-resident sub-BVHs.
#
# The reliable big-scene path on this toolchain (docs/PERF.md documents why
# the DMA-in-while HBM-slab kernel above cannot ship here): accel/forest.py
# partitions the scene into spatially-coherent chunks whose node+triangle
# tables each fit the PROVEN VMEM kernel, and this wrapper walks every
# sub-tree per ray tile, min-combining nearest hits. A tile that misses a
# sub-root AABB leaves that walk after one node step, so the overhead over
# a single tree is ~K root tests per tile. All chunks share one compiled
# kernel (node arrays are padded to a common length at build time).


def _node_rows(jnp, bvh: LinearBVH):
    """(N, 16) f32 node records for the kernel's scalar row reads."""
    zeros = jnp.zeros((bvh.count,), dtype=jnp.float32)
    return jnp.stack(
        [
            bvh.bb_min.x, bvh.bb_min.y, bvh.bb_min.z,
            bvh.bb_max.x, bvh.bb_max.y, bvh.bb_max.z,
            bvh.leaf_first.astype(jnp.float32),
            bvh.leaf_count.astype(jnp.float32),
            bvh.exit.astype(jnp.float32),
        ] + [zeros] * 7,
        axis=1,
    )


def _tri_rows(jnp, v0: Vec3, e1: Vec3, e2: Vec3):
    """(F, 16) f32 triangle records (v0 / e1 / e2 rows)."""
    zeros = jnp.zeros(v0.x.shape, dtype=jnp.float32)
    return jnp.stack(
        [v0.x, v0.y, v0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z] + [zeros] * 7,
        axis=1,
    )


def intersect_bvh_forest(
    xp, o: Vec3, d: Vec3, forest, bvh: LinearBVH,
    max_leaf: int = 4, sort: bool = True, light_pos=None, interpret: bool = False,
):
    """Nearest-hit over a BVHForest (jax + TPU only; scene/types.py).

    Same contract as ``intersect_bvh_packet``: returns main-order face
    indices (``forest.face_ids`` maps each sub-tree's local winner back).
    ``bvh`` (the scene's main BVH) only provides the scene bounds for the
    Morton/octant coherence sort. With ``light_pos`` the NEE shadow any-hit
    runs as a second per-chunk any-hit sweep — shadow rays are derived from
    the *combined* nearest result with exactly ``_kernel_nee``'s guarded
    math, so either path is a drop-in behind ``intersect_scene``.
    """
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.traverse import _coherence_keys

    k = len(forest.bvhs)
    chunk = forest.chunk_size
    maxn = forest.bvhs[0].count
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

    rows = total // _LANES
    prep = lambda a: a.reshape(rows, _LANES)  # noqa: E731
    rays = (prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz))

    def chunk_tables(i):
        sl = lambda v: Vec3(  # noqa: E731
            v.x[i * chunk : (i + 1) * chunk],
            v.y[i * chunk : (i + 1) * chunk],
            v.z[i * chunk : (i + 1) * chunk],
        )
        return (
            _node_rows(jnp, forest.bvhs[i]),
            _tri_rows(jnp, sl(forest.v0), sl(forest.e1), sl(forest.e2)),
        )

    # Seeded chain: chunk i+1's walk starts from chunk 0..i's best, so its
    # node tests prune against hits already found (measured ~8x fewer node
    # visits than independent INF-seeded walks + XLA min-combine on the
    # 100k soup). Face ids are local to each chunk's table; shifting the
    # seed by -i*chunk and the result by +i*chunk keeps pass-through values
    # global while freshly-written locals land in the right range.
    call = _build_call(maxn, chunk, rows, max_leaf, interpret=interpret,
                       seeded=True)
    t_best = jnp.full((rows, _LANES), INF, dtype=jnp.float32)
    slot_best = jnp.full((rows, _LANES), -1, dtype=jnp.int32)
    for i in range(k):
        nodes_i, tris_i = chunk_tables(i)
        t_best, f_out = call(
            nodes_i, tris_i, *rays, t_best, slot_best - i * chunk
        )
        slot_best = f_out + i * chunk

    # Forest slot -> main-order face index (what the shader gathers with).
    f_main = jnp.where(
        slot_best >= 0, forest.face_ids[jnp.maximum(slot_best, 0)], -1
    )

    occ = None
    if light_pos is not None:
        lpx = jax.lax.stop_gradient(jnp.asarray(light_pos.x, jnp.float32))
        lpy = jax.lax.stop_gradient(jnp.asarray(light_pos.y, jnp.float32))
        lpz = jax.lax.stop_gradient(jnp.asarray(light_pos.z, jnp.float32))
        one = np.float32(1.0)
        # Shadow-ray derivation: bitwise the same guarded math as
        # _kernel_nee (missed lanes get ts=1 placeholders; the integrator
        # masks them), so fused-vs-forest golden tests agree.
        hit = t_best < INF
        ts = jnp.where(hit, t_best, one)
        hx = rays[0] + rays[3] * ts
        hy = rays[1] + rays[4] * ts
        hz = rays[2] + rays[5] * ts
        lx = lpx - hx
        ly = lpy - hy
        lz = lpz - hz
        len2 = lx * lx + ly * ly + lz * lz
        pos = len2 > 0.0
        t_light = jnp.where(pos, jnp.sqrt(jnp.where(pos, len2, one)), 0.0)
        okd = jnp.abs(t_light) > np.float32(1e-12)
        inv = jnp.where(okd, one / jnp.where(okd, t_light, one), 0.0)
        sx = lx * inv
        sy = ly * inv
        sz = lz * inv

        # Seeded any-hit chain: a tile fully occluded by earlier chunks
        # early-outs later walks at their root step.
        shadow_call = _build_call(
            maxn, chunk, rows, max_leaf, interpret=interpret, shadow=True,
            seeded=True,
        )
        occ_i32 = jnp.zeros((rows, _LANES), dtype=jnp.int32)
        for i in range(k):
            nodes_i, tris_i = chunk_tables(i)
            occ_i32 = shadow_call(
                nodes_i, tris_i, hx, hy, hz, sx, sy, sz, t_light, occ_i32
            )
        occ = occ_i32.reshape(-1)

    t = t_best.reshape(-1)
    f = f_main.reshape(-1)
    if sort:
        inv_perm = jnp.argsort(perm)
        t, f = t[inv_perm], f[inv_perm]
        if occ is not None:
            occ = occ[inv_perm]
    if occ is not None:
        return (
            t[:flat].reshape(shape),
            f[:flat].reshape(shape),
            occ[:flat].reshape(shape) != 0,
        )
    return t[:flat].reshape(shape), f[:flat].reshape(shape)
