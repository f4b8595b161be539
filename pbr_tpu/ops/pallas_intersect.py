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

# Largest triangle count whose (9, F) f32 SMEM table is known to fit and
# win: measured 7.2 M rays/s at 10k tris (1M coherent rays, v5e) — still
# ahead of every traversal-based alternative (tools/tpu_queue.py).
BRUTE_SMEM_MAX_FACES = 10_000

# The linear-form sweep (see _sweep_lin) needs a wider (16, F) SMEM table;
# cap it where that table stays well inside the footprint the 9-row table
# was measured to tolerate, falling back to the classic sweep above it.
LIN_SMEM_MAX_FACES = 4_096


def _sweep(nf, tri_ref, ox, oy, oz, dx, dy, dz, t_limit=None):
    """Unrolled all-faces Möller-Trumbore over one ray tile.

    ``t_limit`` None: nearest-hit — returns (t_best, f_best).
    ``t_limit`` array: any-hit with t < t_limit (shadow leg) — returns a
    bool mask. Same math and first-face-wins tie-breaking as the XLA sweep.
    """
    import jax.numpy as jnp

    t_best = jnp.full(ox.shape, INF, dtype=jnp.float32)
    f_best = jnp.full(ox.shape, -1, dtype=jnp.int32)
    occ = jnp.zeros(ox.shape, dtype=jnp.bool_)

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
        valid = (
            (t >= np.float32(EPSILON5)) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        )
        if t_limit is None:
            ok = valid & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            f_best = jnp.where(ok, np.int32(f), f_best)
        else:
            occ = occ | (valid & (t < t_limit))

    if t_limit is None:
        return t_best, f_best
    return occ


def _sweep_lin(nf, tab_ref, ox, oy, oz, dx, dy, dz, t_limit=None):
    """Linear-form Möller-Trumbore sweep: same quotients, ~20% fewer VPU ops.

    Each MT quantity is a scalar triple product, so it is (bi)linear in the
    ray — with per-face constants hoisted to build time (``_lin_table``)
    and one shared cross product ``c = o × d`` per tile, the per-face work
    drops from ~62 to ~49 VPU ops:

        det  = d·m                      m = e2 × e1
        tnum = (v0·m) - o·m             (= tvec·(e1×e2), sign folded into m)
        unum = e2·c - d·w               w = e2 × v0
        vnum = -(e1·c) - d·q            q = v0 × e1

    then t/u/v = num · (1/det) and the validity gate and first-face-wins
    update are identical to ``_sweep``. The quotients equal the classic
    formulation exactly in real arithmetic; f32 rounding of the regrouped
    dot products can differ by ulps, which only matters for exact ties in
    the detached nearest-face search (tests gate agreement, not bitwise).
    """
    import jax.numpy as jnp

    t_best = jnp.full(ox.shape, INF, dtype=jnp.float32)
    f_best = jnp.full(ox.shape, -1, dtype=jnp.int32)
    occ = jnp.zeros(ox.shape, dtype=jnp.bool_)

    # One cross product shared by every face of the sweep.
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx

    for f in range(nf):
        m0 = tab_ref[0, f]
        m1 = tab_ref[1, f]
        m2 = tab_ref[2, f]
        km = tab_ref[3, f]
        w0 = tab_ref[4, f]
        w1 = tab_ref[5, f]
        w2 = tab_ref[6, f]
        q0 = tab_ref[7, f]
        q1 = tab_ref[8, f]
        q2 = tab_ref[9, f]
        e1x = tab_ref[10, f]
        e1y = tab_ref[11, f]
        e1z = tab_ref[12, f]
        e2x = tab_ref[13, f]
        e2y = tab_ref[14, f]
        e2z = tab_ref[15, f]

        det = dx * m0 + dy * m1 + dz * m2
        inv = 1.0 / det
        t = (km - (ox * m0 + oy * m1 + oz * m2)) * inv
        u = ((e2x * cx + e2y * cy + e2z * cz) - (dx * w0 + dy * w1 + dz * w2)) * inv
        v = (-(e1x * cx + e1y * cy + e1z * cz) - (dx * q0 + dy * q1 + dz * q2)) * inv
        valid = (
            (t >= np.float32(EPSILON5)) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        )
        if t_limit is None:
            ok = valid & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            f_best = jnp.where(ok, np.int32(f), f_best)
        else:
            occ = occ | (valid & (t < t_limit))

    if t_limit is None:
        return t_best, f_best
    return occ


def _kernel(nf, sweep, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, f_ref):
    """One (8, 128) ray tile vs all ``nf`` triangles.

    ``tri_ref``: SMEM face table — (9, F) v0/e1/e2 rows for ``_sweep``,
    (16, F) hoisted linear-form constants for ``_sweep_lin``.
    """
    t_best, f_best = sweep(
        nf, tri_ref,
        ox_ref[...], oy_ref[...], oz_ref[...],
        dx_ref[...], dy_ref[...], dz_ref[...],
    )
    t_ref[...] = t_best
    f_ref[...] = f_best


def _kernel_nee(
    nf, sweep, tri_ref, lp_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, f_ref, occ_ref,
):
    """Fused primary nearest-hit + NEE shadow any-hit in one pass.

    The shadow leg re-derives the hit point / light direction with exactly
    the integrator's guarded math (t_safe for missed lanes, safe_sqrt /
    safe_div semantics), then sweeps the faces again with an any-hit
    ``t < t_light`` test (the analog of traverseShadows' early-out,
    pt_bvh.cl:133-177 — occluded iff some geometry hit lies closer than
    the light). Saves one full kernel round-trip of ray state per bounce.
    ``lp_ref``: (3,) SMEM — light 0 position (NEE always samples lights[0],
    pathtracing.cl:188-199).
    """
    import jax.numpy as jnp

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]

    t_best, f_best = sweep(nf, tri_ref, ox, oy, oz, dx, dy, dz)
    t_ref[...] = t_best
    f_ref[...] = f_best

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

    occ = sweep(nf, tri_ref, hx, hy, hz, sx, sy, sz, t_limit=t_light)
    occ_ref[...] = occ.astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _build_call(
    nf: int, rows: int, nee: bool = False, interpret: bool = False,
    variant: str = "mt",
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sweep = _sweep_lin if variant == "lin" else _sweep
    grid = (rows // _TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    f_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    if nee:
        return pl.pallas_call(
            functools.partial(_kernel_nee, nf, sweep),
            grid=grid,
            in_specs=[tri_spec, tri_spec] + [ray_spec] * 6,
            out_specs=(ray_spec, ray_spec, ray_spec),
            out_shape=(t_shape, f_shape, f_shape),
            interpret=interpret,
        )
    return pl.pallas_call(
        functools.partial(_kernel, nf, sweep),
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(t_shape, f_shape),
        interpret=interpret,
    )


def _lin_table(xp, tris: TrianglesSoA):
    """(16, F) hoisted per-face constants for ``_sweep_lin``.

    Rows: m = e2×e1 (3), km = v0·m (1), w = e2×v0 (3), q = v0×e1 (3),
    e1 (3), e2 (3). Built with jnp from the traced triangle arrays, so XLA
    CSEs one copy per jit program however many bounces call the kernel.
    """
    v0, e1, e2 = tris.v0, tris.e1, tris.e2
    m = e2.cross(e1)
    w = e2.cross(v0)
    q = v0.cross(e1)
    km = v0.dot(m)
    return xp.stack(
        [
            m.x, m.y, m.z, km,
            w.x, w.y, w.z,
            q.x, q.y, q.z,
            e1.x, e1.y, e1.z,
            e2.x, e2.y, e2.z,
        ],
        axis=0,
    )


def intersect_pallas(
    xp, o: Vec3, d: Vec3, tris: TrianglesSoA, light_pos=None,
    interpret: bool = False, variant: str = None,
):
    """Nearest-hit over all triangles, fused on-chip. jax-only.

    With ``light_pos`` (a scalar Vec3, light 0), additionally runs the NEE
    shadow any-hit in the same kernel and returns ``(t, face, occluded)``;
    otherwise returns ``(t, face)``.

    ``variant``: 'mt' (classic per-face Möller-Trumbore, the measured
    default — docs/PERF.md) or 'lin' (hoisted linear-form sweep; fewer VPU
    ops but no wall-clock win, kept for experiments).
    """
    import jax.numpy as jnp

    nf = int(tris.v0.x.shape[0])
    if variant is None:
        # Measured (tools/tpu_queue.py sweeplin, docs/PERF.md): the
        # linear-form sweep's ~20% op-count reduction does not translate to
        # wall clock (the kernel is not VPU-issue-bound at these face
        # counts), so the classic sweep stays the default.
        variant = "mt"
    shape = o.x.shape
    flat = o.x.reshape(-1).shape[0]
    pad = (-flat) % (_TILE_ROWS * _LANES)
    total = flat + pad

    def prep(a):
        a = a.reshape(-1)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        return a.reshape(total // _LANES, _LANES)

    if variant == "lin":
        tri = _lin_table(jnp, tris)  # (16, F)
    else:
        tri = jnp.stack(
            [
                tris.v0.x, tris.v0.y, tris.v0.z,
                tris.e1.x, tris.e1.y, tris.e1.z,
                tris.e2.x, tris.e2.y, tris.e2.z,
            ],
            axis=0,
        )  # (9, F)

    rays = (prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z))
    unflat = lambda a: a.reshape(-1)[:flat].reshape(shape)  # noqa: E731
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
        call = _build_call(
            nf, total // _LANES, nee=True, interpret=interpret, variant=variant
        )
        t, f, occ = call(tri, lp, *rays)
        return unflat(t), unflat(f), unflat(occ) != 0
    call = _build_call(nf, total // _LANES, interpret=interpret, variant=variant)
    t, f = call(tri, *rays)
    return unflat(t), unflat(f)
