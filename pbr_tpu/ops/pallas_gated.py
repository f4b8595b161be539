"""Gated-brute intersector: the SMEM cluster-culled sweep (Pallas, TPU).

The measured round-4 finding (docs/PERF.md): the brute kernel's
scalar-broadcast VPU sweep (face constants as SMEM scalars against
(rows, 128) ray tiles — ops/pallas_intersect.py) is the fastest per-test
engine on this hardware; every fancier formulation (thin-K MXU matmuls,
per-row broadcast sections) pays 1.5-4x per test in broadcast
materialization, branch, or epilogue overhead. So for every scene whose
linear-form table fits SMEM, the right accelerator is *brute with holes*:

- the face table is the brute kernel's (16, F) hoisted linear-form SMEM
  table, grouped in 64-face clusters (the ClusterSet's fine granularity);
- the cull stage (ops/cull.py::fine_hit_mask) frustum-tests each RAY TILE
  (``rows``x128 rays, default 256 — finer than the brute kernel's 1024)
  against every cluster AABB and packs verdict bits (16 per int32 word,
  sign-safe) into a scalar-prefetch table;
- the kernel runs a ``fori_loop`` over clusters — so the program size is
  ONE cluster's unrolled 64-face sweep regardless of F, which removes the
  brute kernel's ~4k-face compile ceiling (VERDICT r3 weakness #2) — and
  a ``pl.when`` on the verdict bit skips the whole 64-face section for
  the tile: one scalar branch, zero vector work;
- faces are processed in ascending memory order, so the strict-< nearest
  update IS the first-face-wins contract (no lexicographic epilogue).

NEE shadow rays run as a second gated pass (any-hit, t < t_limit) with
their own verdict words — conservative distance capping via the cull
stage's ``t_cap`` makes shadow tiles skip almost everything.
"""

from __future__ import annotations

import functools

import numpy as np

from pbr_tpu.ops.intersect import INF
from pbr_tpu.utils.config import EPSILON5

_LANES = 128
_BIG_NEG = np.float32(-3.0e38)

# Cluster granularity of the gating = the ClusterSet fine size for small/mid
# scenes (accel/clusters.py build_clusters size=64).
GATE_CLUSTER = 64

# Largest face count served: the (16, F) f32 table must fit SMEM alongside
# the prefetch words (16 * 16384 * 4 = 1 MB is the v5e budget edge; stay
# comfortably inside).
GATED_MAX_FACES = 12_288


def _mt_lin_update(jnp, tab, f, ox, oy, oz, dx, dy, dz, cx, cy, cz):
    """One face's linear-form Möller-Trumbore on a ray tile; returns
    (t, valid). ``tab(k, f)`` reads SMEM scalars (ops/pallas_intersect.py::
    _sweep_lin rows: m, km, w, q, e1, e2)."""
    det = dx * tab(0, f) + dy * tab(1, f) + dz * tab(2, f)
    inv = 1.0 / det
    tt = (tab(3, f) - (ox * tab(0, f) + oy * tab(1, f) + oz * tab(2, f))) * inv
    uu = (
        (tab(13, f) * cx + tab(14, f) * cy + tab(15, f) * cz)
        - (dx * tab(4, f) + dy * tab(5, f) + dz * tab(6, f))
    ) * inv
    vv = (
        -(tab(10, f) * cx + tab(11, f) * cy + tab(12, f) * cz)
        - (dx * tab(7, f) + dy * tab(8, f) + dz * tab(9, f))
    ) * inv
    valid = (
        (tt >= np.float32(EPSILON5)) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
    )
    return tt, valid


def _kernel(n_clusters, rows, any_hit, static_unroll,
            words_ref, tab_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tin_ref, fin_ref,
            t_ref, f_ref, t_s, f_s):
    """One ray tile vs all clusters, gated. ``tin``: seed t (-BIG = dead
    lane; any-hit mode: 0/1 occlusion seed with dead/missed lanes pre-set
    to 1). ``fin``: seed face (nearest) or t_limit (any-hit).

    ``static_unroll``: python-unroll the cluster loop so every SMEM face
    read has a STATIC index — the exact instruction mix of the proven
    brute kernel (measured: the fori variant's dynamic scalar reads cost
    ~4.7x per test, erasing the culling win). Bounded by program size to
    ~64 clusters; larger scenes take the fori body.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    t_s[...] = tin_ref[0]
    if not any_hit:
        f_s[...] = fin_ref[0]

    def tab(k, f):
        return tab_ref[k, f]

    def section(c):
        t_best = t_s[...]
        if any_hit:
            t_lim = fin_ref[0]
            occ = t_best
            for j in range(GATE_CLUSTER):
                f = c * GATE_CLUSTER + j
                tt, valid = _mt_lin_update(
                    jnp, tab, f, ox, oy, oz, dx, dy, dz, cx, cy, cz
                )
                occ = jnp.maximum(
                    occ, (valid & (tt < t_lim)).astype(jnp.float32)
                )
            t_s[...] = occ
        else:
            f_best = f_s[...]
            for j in range(GATE_CLUSTER):
                f = c * GATE_CLUSTER + j
                tt, valid = _mt_lin_update(
                    jnp, tab, f, ox, oy, oz, dx, dy, dz, cx, cy, cz
                )
                ok = valid & (tt < t_best)
                t_best = jnp.where(ok, tt, t_best)
                f_best = jnp.where(ok, f, f_best)
            t_s[...] = t_best
            f_s[...] = f_best

    if static_unroll:
        for c in range(n_clusters):
            bit = (words_ref[t, c // 16] >> (c % 16)) & 1
            pl.when(bit != 0)(lambda c=c: section(c))
    else:

        def body(c, carry):
            bit = (words_ref[t, c // 16] >> (c % 16)) & 1
            pl.when(bit != 0)(lambda: section(c))
            return carry

        jax.lax.fori_loop(0, n_clusters, body, 0, unroll=False)
    t_ref[0] = t_s[...]
    f_ref[0] = f_s[...] if not any_hit else fin_ref[0].astype(jnp.int32)


def _vma_of(x):
    try:
        import jax

        v = jax.typeof(x).vma
        return tuple(sorted(v)) if v else ()
    except Exception:
        return ()


# Static-unroll ceiling: 64 clusters x 64 faces x ~50 ops ~ 205k
# instructions, the known Mosaic comfort zone; fori above.
STATIC_MAX_CLUSTERS = 64


@functools.lru_cache(maxsize=None)
def _build_call(n_clusters: int, rows: int, n_tiles: int, any_hit: bool,
                static_unroll: bool = True,
                interpret: bool = False, vma: tuple = ()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # (T, W) verdict words
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]  # (16, F) table
        + [
            # 3D (T, rows, 128) layout: a (1, rows, 128) block is legal for
            # any sublane count (trailing dims equal the array dims).
            pl.BlockSpec((1, rows, _LANES), lambda t, w: (t, 0, 0))
            for _ in range(8)  # o.xyz d.xyz tin fin
        ],
        out_specs=(
            pl.BlockSpec((1, rows, _LANES), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, rows, _LANES), lambda t, w: (t, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, _LANES), jnp.float32),
            pltpu.VMEM((rows, _LANES), jnp.int32),
        ],
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        functools.partial(_kernel, n_clusters, rows, any_hit, static_unroll),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, rows, _LANES), jnp.float32, **kw),
            jax.ShapeDtypeStruct((n_tiles, rows, _LANES), jnp.int32, **kw),
        ),
        interpret=interpret,
    )


def _pack_words(jnp, hit):
    """(T, C) bool -> (T, ceil(C/16)) int32, 16 verdict bits per word."""
    t, c = hit.shape
    w = -(-c // 16)
    pad = w * 16 - c
    bits = hit.astype(jnp.int32)
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((t, pad), jnp.int32)], axis=1)
    return jnp.sum(
        bits.reshape(t, w, 16) << jnp.arange(16, dtype=jnp.int32)[None, None, :],
        axis=2,
        dtype=jnp.int32,
    )


def intersect_gated(
    xp, o, d, tris, cset, light_pos=None, alive=None, rows: int = 8,
    interpret: bool = False, with_counts: bool = False,
    chunk_rays: int = 262144, static_unroll=None,
):
    """Nearest-hit via the gated-brute sweep (jax + TPU only).

    Contract identical to ``intersect_pallas``/``intersect_cull``:
    ``(t, face[, occluded][, n_tests])`` with face -1 on miss and
    memory-order first-face-wins. ``tris``: the scene triangles (leaf
    order); ``cset``: the matching ClusterSet (fine AABBs at 64-face
    granularity are the gate targets). ``rows``: sublane rows per ray
    tile — tile = rows*128 rays is both the frustum and the gate
    granularity (measured: 8 wins at every size — the per-tile fixed
    cost dominates what finer frustums save; tools/tpu_queue.py gated).
    """
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.cull import fine_hit_mask
    from pbr_tpu.ops.pallas_intersect import _lin_table
    from pbr_tpu.ops.vec import Vec3

    nf = int(tris.mtl.shape[0])
    size = cset.size
    c = cset.bb_min.x.shape[0]
    static = (
        static_unroll if static_unroll is not None
        else c <= STATIC_MAX_CLUSTERS
    )
    tile = rows * _LANES
    shape = o.x.shape
    flat = int(np.prod(shape)) if shape else 1
    # SMEM budget: the prefetched words table is padded per tile, so the
    # per-chunk TILE count (not ray count) is what must stay bounded
    # (measured: 2048 tiles OOM'd smem at 1.13M).
    chunk_rays = min(chunk_rays, 512 * tile)
    chunk = min(
        max(tile, (chunk_rays // tile) * tile),
        -(-flat // tile) * tile,
    )
    pad = (-flat) % chunk
    total = flat + pad
    n_chunks = total // chunk
    n_tiles = chunk // tile

    tab = _lin_table(jnp, tris)  # (16, F)
    pad_f = c * size - nf
    if pad_f:
        # Padding faces: m = km = 0 -> det 0 -> t NaN -> never valid.
        tab = jnp.concatenate([tab, jnp.zeros((16, pad_f), jnp.float32)], axis=1)

    def prep(a, mode="edge"):
        a = a.reshape(-1)
        if pad:
            a = jnp.pad(a, (0, pad), mode=mode)
        return a

    ox, oy, oz = prep(o.x), prep(o.y), prep(o.z)
    dx, dy, dz = prep(d.x), prep(d.y), prep(d.z)
    if alive is None:
        alive_f = jnp.ones((total,), dtype=bool)
    else:
        alive_f = prep(alive.astype(jnp.int32)) != 0
    if pad:
        alive_f = alive_f.at[flat:].set(False)

    nee = light_pos is not None
    if nee:
        lpx = jax.lax.stop_gradient(jnp.asarray(light_pos.x, jnp.float32))
        lpy = jax.lax.stop_gradient(jnp.asarray(light_pos.y, jnp.float32))
        lpz = jax.lax.stop_gradient(jnp.asarray(light_pos.z, jnp.float32))

    def shape2(a):
        return a.reshape(-1, rows, _LANES)

    def run_pass(ov, dv, seed_t, seed_f, any_hit, t_cap, live):
        hit = fine_hit_mask(
            jnp, ov, dv, cset, tile, t_cap=t_cap, live=live
        )  # (T, C)
        words = _pack_words(jnp, hit)
        counts = None
        if with_counts:
            # EXACT executed real-face tests per lane: every lane in a
            # tile sweeps each gated-in cluster's ``size`` faces, but only
            # the cluster's REAL faces are intersection tests — the table
            # is zero-padded (det 0, never valid) both inside the partial
            # cluster and in any all-padding tail clusters. Dot the
            # verdict mask with the per-cluster real-face counts
            # (VERDICT r4 item 5: the old cluster-sum was a conservative
            # bound counting padding).
            real_per_cluster = np.clip(
                nf - np.arange(c, dtype=np.int64) * size, 0, size
            ).astype(np.int32)
            per_tile = hit.astype(jnp.int32) @ jnp.asarray(real_per_cluster)
            counts = jnp.repeat(per_tile, tile)
        call = _build_call(
            c, rows, n_tiles, any_hit, static_unroll=static,
            interpret=interpret, vma=_vma_of(ov.x),
        )
        t_out, f_out = call(
            words, tab,
            shape2(ov.x), shape2(ov.y), shape2(ov.z),
            shape2(dv.x), shape2(dv.y), shape2(dv.z),
            shape2(seed_t), shape2(seed_f),
        )
        return t_out.reshape(-1), f_out.reshape(-1), counts

    def chunk_fn(args):
        ox, oy, oz, dx, dy, dz, alive_c = args
        t_seed = jnp.where(alive_c, INF, _BIG_NEG)
        f_seed = jnp.full((chunk,), -1, jnp.int32)
        t_flat, f_flat, n_tests = run_pass(
            Vec3(ox, oy, oz), Vec3(dx, dy, dz), t_seed, f_seed,
            any_hit=False, t_cap=None, live=alive_c,
        )
        if n_tests is None:
            n_tests = jnp.zeros((chunk,), jnp.int32)
        if not nee:
            return t_flat, f_flat, f_flat, n_tests
        one = np.float32(1.0)
        hit = (t_flat < INF) & (t_flat > 0.0) & alive_c
        ts = jnp.where(hit, t_flat, one)
        hx = ox + dx * ts
        hy = oy + dy * ts
        hz = oz + dz * ts
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
        t_cap = jnp.max(jnp.where(hit, t_light, 0.0).reshape(-1, tile), axis=1)
        occ_seed = jnp.where(hit, 0.0, 1.0).astype(jnp.float32)
        occ_out, _, n_tests_sh = run_pass(
            Vec3(hx, hy, hz), Vec3(sx, sy, sz), occ_seed, t_light,
            any_hit=True, t_cap=t_cap, live=hit,
        )
        if n_tests_sh is not None:
            n_tests = n_tests + n_tests_sh
        return (
            t_flat, f_flat, (occ_out > 0.0).astype(jnp.int32), n_tests
        )

    args = tuple(
        a.reshape(n_chunks, chunk)
        for a in (ox, oy, oz, dx, dy, dz, alive_f)
    )
    if n_chunks == 1:
        outs = chunk_fn(tuple(a[0] for a in args))
    else:
        outs = jax.lax.map(chunk_fn, args)
    t_flat = outs[0].reshape(-1)[:flat].reshape(shape)
    f_flat = outs[1].reshape(-1)[:flat].reshape(shape)
    out = [t_flat, f_flat]
    if nee:
        out.append((outs[2].reshape(-1) != 0)[:flat].reshape(shape))
    if with_counts:
        out.append(outs[3].reshape(-1)[:flat].reshape(shape))
    return tuple(out)
