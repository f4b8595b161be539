"""Sweep stage of the cull-and-sweep intersector (Pallas, TPU).

The TPU-native replacement for per-ray BVH traversal at any scene size
(the reference walks one deep tree per ray at full rate,
pt_bvh.cl:82-123; a TPU has no per-lane control flow, and the measured
tile-uniform walks lose to brute force — docs/PERF.md). Design:

- **No traversal at all.** ops/cull.py precomputes, per (tile)-ray tile,
  the near-to-far ordered list of candidate face clusters
  (accel/clusters.py) with conservative entry bounds. The kernel is a
  dense sweep over that list: grid = (tiles, slots).
- **HBM streaming via the pipeline, not manual DMA.** The per-cluster
  Möller-Trumbore coefficient blocks stay in HBM; a
  PrefetchScalarGridSpec index_map keyed on the candidate list makes the
  Pallas pipeline fetch (and double-buffer) exactly the blocks each tile
  needs. No DMA-inside-loop — the construction this environment's Mosaic
  is known to reject (docs/PERF.md "Big-scene intersector status") — and
  no VMEM residency cap on scene size.
- **MXU cross product.** Ray x face Möller-Trumbore in the hoisted
  linear form is bilinear, so one thin-K matmul per step evaluates
  det/tnum/unum/vnum for all (tile x cluster-size) pairs at once:
  (K_ROWS, 4S) coefficients contracted with (K_ROWS, tile) ray features.
- **Occlusion early-out.** Candidates arrive near-to-far; a tile stops
  (per-tile SMEM flag, scalar carry only) once every ray's best hit is
  closer than the next cluster's conservative entry bound — the analog of
  the reference's per-ray `t_best > t_near` cut, lifted to tile
  granularity where it is almost as strong because tiles are coherent.
- **Exact global tie-breaking.** The nearest update keeps
  (t, face-id)-lexicographic minima, so results equal the memory-order
  first-face-wins contract of every other intersector regardless of the
  near-to-far processing order.

Ray-feature rows (accel/clusters.py constants): [o, d, o x d, 1, t_limit].
"""

from __future__ import annotations

import functools

import numpy as np

from pbr_tpu.accel.clusters import K_ROWS
from pbr_tpu.ops.cull import CAND_MISS
from pbr_tpu.ops.intersect import INF
from pbr_tpu.utils.config import EPSILON5


def _precision(name: str):
    import jax

    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
        "tri": "tri",  # hand-rolled bf16x3 (see _dot_k)
    }[name]


def _dot_k(precision, a, b):
    """K-contracted matmul ``a.T @ b`` for (K, M) x (K, N) f32.

    ``precision='tri'``: bf16x3 via explicit hi/lo split — the matmul-pass
    cost of lax.Precision.HIGH (which Mosaic rejects) at ~2^-22 relative
    error. NOT the default: rays originating ON surfaces (every bounce and
    shadow ray) hit the ``km - o.m`` cancellation at t ~ 0, where the
    absolute error (~6e-6 at scene scale) rivals EPSILON5 and flips the
    self-hit gate (measured: 2/9 shadow-occlusion flips on the soup test).
    Opt-in for workloads whose rays start off-surface.
    """
    import jax
    import jax.numpy as jnp

    dims = (((0,), (0,)), ((), ()))
    if precision != "tri":
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32, precision=precision
        )
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _kernel(S, L, precision, any_hit, early_out,
            cand_ref, cnt_ref, tent_ref,
            coeff_ref, rays_ref, tin_ref, fin_ref,
            t_ref, f_ref, done_s):
    """One (tile-)step: sweep candidate cluster ``cand[t, l]``.

    Nearest mode (``any_hit=False``): seeded (t, face) running minima in
    the revisited out blocks. Any-hit mode: ``tin_ref``/``t_ref`` carry
    the occlusion mask as f32 0/1 (one output layout serves both), and
    row R_TLIM of the ray features carries each ray's shadow distance.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        t_ref[...] = tin_ref[...]
        f_ref[...] = fin_ref[...]
        done_s[0] = 0

    # Per-ray state refs are (1, 1, tile) — the singleton middle dim keeps
    # the HBM block spec legal (block trailing dims == array trailing
    # dims); drop it for the in-step math.

    # Slot verdict: the cull stage already frustum-tested this FINE
    # cluster (its miss bit rides in the candidate entry — ops/cull.py),
    # so a skipped slot costs two scalar SMEM reads and nothing else.
    # ``early_out=False`` (small candidate counts): no done flag at all —
    # the per-step cross-lane max + SMEM round-trip is serial latency that
    # costs more than the few slots it could skip.
    cid0 = cand_ref[t, l]
    run = (l < cnt_ref[t]) & (cid0 < CAND_MISS)
    if early_out:
        run = run & (done_s[0] == 0)

    @pl.when(run)
    def _():
        cid = cid0
        coeff = coeff_ref[0]  # (K_ROWS, 4S)
        rays = rays_ref[0]  # (K_ROWS, tile)
        out = _dot_k(precision, coeff, rays)  # (4S, tile)
        det = out[0:S]
        tnum = out[S : 2 * S]
        unum = out[2 * S : 3 * S]
        vnum = out[3 * S : 4 * S]
        inv = 1.0 / det
        tt = tnum * inv
        u = unum * inv
        v = vnum * inv
        valid = (
            (tt >= np.float32(EPSILON5)) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        )

        if any_hit:
            t_lim = rays[10:11, :]  # R_TLIM row, (1, tile)
            occ_new = jnp.any(valid & (tt < t_lim), axis=0, keepdims=True)
            occ = jnp.maximum(t_ref[0], occ_new.astype(jnp.float32))
            t_ref[0] = occ
            if early_out:
                # Done once every not-yet-occluded ray's light distance is
                # nearer than the next cluster's entry bound (occluded
                # rays drop out via -BIG).
                watch = jnp.where(occ > 0.0, np.float32(-3.0e38), t_lim)
                done_s[0] = (
                    jnp.max(watch) <= tent_ref[t, l + 1]
                ).astype(jnp.int32)
        else:
            tt = jnp.where(valid, tt, INF)
            tmin = jnp.min(tt, axis=0, keepdims=True)  # (1, tile)
            rowid = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            fsub = jnp.min(
                jnp.where(tt == tmin, rowid, np.int32(2**30)), axis=0, keepdims=True
            )
            fid = cid * S + fsub  # (1, tile) global face id (clusters are
            # contiguous main-order runs)
            t_best = t_ref[0]
            f_best = f_ref[0]
            hit = tmin < INF
            better = hit & (
                (tmin < t_best) | ((tmin == t_best) & (fid < f_best))
            )
            t_new = jnp.where(better, tmin, t_best)
            t_ref[0] = t_new
            f_ref[0] = jnp.where(better, fid, f_best)
            if early_out:
                done_s[0] = (
                    jnp.max(t_new) <= tent_ref[t, l + 1]
                ).astype(jnp.int32)


def _kernel_masked(S, C, precision, any_hit,
                   mask_ref, coeff_ref, rays_ref, tin_ref, fin_ref,
                   t_ref, f_ref):
    """Masked sweep: the small/mid-scene variant (whole coefficient table
    VMEM-resident, grid over ray tiles only).

    The slotted kernel's per-step scalar chain (prefetched candidate
    reads, done flag, pipeline block fetches) is pure serial latency when
    a tile only needs a handful of clusters; here every cluster is a
    STATICALLY unrolled section gated by one prefetched verdict bit —
    straight-line code like the proven brute kernel, minus the clusters
    the tile's frustum misses. No candidate lists, no sort, no early-out.
    Bits pack 16/word (sign-safe int32 SMEM).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    t_ref[...] = tin_ref[...]
    f_ref[...] = fin_ref[...]
    rays = rays_ref[0]  # (K_ROWS, tile)
    if any_hit:
        t_lim = rays[10:11, :]

    for c in range(C):
        bit = (mask_ref[t, c // 16] >> (c % 16)) & 1

        @pl.when(bit != 0)
        def _(c=c):
            coeff = coeff_ref[c]  # (K_ROWS, 4S)
            out = _dot_k(precision, coeff, rays)  # (4S, tile)
            det = out[0:S]
            tnum = out[S : 2 * S]
            unum = out[2 * S : 3 * S]
            vnum = out[3 * S : 4 * S]
            inv = 1.0 / det
            tt = tnum * inv
            u = unum * inv
            v = vnum * inv
            valid = (
                (tt >= np.float32(EPSILON5))
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            if any_hit:
                occ_new = jnp.any(valid & (tt < t_lim), axis=0, keepdims=True)
                t_ref[0] = jnp.maximum(t_ref[0], occ_new.astype(jnp.float32))
            else:
                tt = jnp.where(valid, tt, INF)
                tmin = jnp.min(tt, axis=0, keepdims=True)
                rowid = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
                fsub = jnp.min(
                    jnp.where(tt == tmin, rowid, np.int32(2**30)),
                    axis=0, keepdims=True,
                )
                fid = np.int32(c * S) + fsub
                t_best = t_ref[0]
                f_best = f_ref[0]
                better = (tmin < INF) & (
                    (tmin < t_best) | ((tmin == t_best) & (fid < f_best))
                )
                t_ref[0] = jnp.where(better, tmin, t_best)
                f_ref[0] = jnp.where(better, fid, f_best)


@functools.lru_cache(maxsize=None)
def _build_call_masked(c: int, s: int, tile: int, n_tiles: int,
                       precision: str, any_hit: bool,
                       interpret: bool = False, vma: tuple = ()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # (T, W) verdict bit words
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((c, K_ROWS, 4 * s), lambda t, m: (0, 0, 0)),
            pl.BlockSpec((1, K_ROWS, tile), lambda t, m: (t, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t, m: (t, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t, m: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile), lambda t, m: (t, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t, m: (t, 0, 0)),
        ),
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        functools.partial(_kernel_masked, s, c, _precision(precision), any_hit),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32, **kw),
            jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32, **kw),
        ),
        interpret=interpret,
    )


def _vma_of(x):
    """Varying-axes metadata of ``x`` (inside shard_map), as a hashable
    tuple — pallas_call out_shapes must declare it explicitly."""
    try:
        import jax

        v = jax.typeof(x).vma
        return tuple(sorted(v)) if v else ()
    except Exception:
        return ()


@functools.lru_cache(maxsize=None)
def _build_call(n_clusters: int, s: int, tile: int, n_tiles: int, slots: int,
                precision: str, any_hit: bool, early_out: bool = True,
                interpret: bool = False, vma: tuple = ()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cand, cnt, tent
        grid=(n_tiles, slots),
        in_specs=[
            pl.BlockSpec(  # coefficient block of the step's candidate
                (1, K_ROWS, 4 * s),
                lambda t, l, cand, cnt, tent: (cand[t, l] & (CAND_MISS - 1), 0, 0),
            ),
            pl.BlockSpec((1, K_ROWS, tile), lambda t, l, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t, l, *_: (t, 0, 0)),  # t seed
            pl.BlockSpec((1, 1, tile), lambda t, l, *_: (t, 0, 0)),  # f seed
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile), lambda t, l, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t, l, *_: (t, 0, 0)),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        functools.partial(_kernel, s, slots, _precision(precision), any_hit, early_out),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32, **kw),
            jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32, **kw),
        ),
        interpret=interpret,
    )


_BIG_NEG = np.float32(-3.0e38)


def _sweep_rounds(jnp, call_fn, cand, cnt, tent, coeff, feats,
                  t0, f0, slots: int, any_hit: bool, watch_ref=None):
    """Run the sweep in rounds of ``slots`` candidate slots as ONE
    device-side ``lax.while_loop`` (one pallas node per pass regardless of
    the round count — the integrator calls this twice per bounce, so graph
    size and compile time scale with rounds otherwise). The loop stops as
    soon as every tile is done: exhausted its candidates, early-outed on
    the entry bounds, or (any-hit) fully occluded. ``watch_ref``: (T,
    tile) f32 of per-ray shadow distances (any-hit's early-out key).
    """
    import jax

    t_tiles, c = cand.shape
    l = min(slots, c)
    r_rounds = -(-c // l)
    pad_c = r_rounds * l - c
    if pad_c:
        cand = jnp.concatenate([cand, jnp.repeat(cand[:, -1:], pad_c, 1)], axis=1)
        tent_tail = jnp.full((t_tiles, pad_c), np.float32(3.0e38), jnp.float32)
        tent = jnp.concatenate([tent[:, :c], tent_tail, tent[:, c:]], axis=1)

    def tiles_done(lo, t_cur):
        # Tile-done criterion at the round boundary — exactly the kernel's
        # in-step early-out, evaluated in XLA.
        flat_t = t_cur.reshape(t_tiles, -1)
        if any_hit:
            key = jnp.where(flat_t > 0.0, _BIG_NEG, watch_ref)
        else:
            key = flat_t
        tmax = jnp.max(key, axis=1)
        tent_lo = jax.lax.dynamic_slice_in_dim(tent, lo, 1, 1)[:, 0]
        return (cnt <= lo) | (tmax <= tent_lo)

    def body(carry):
        r, t_cur, f_cur = carry
        lo = r * np.int32(l)
        cand_r = jax.lax.dynamic_slice_in_dim(cand, lo, l, 1)
        tent_r = jax.lax.dynamic_slice_in_dim(tent, lo, l + 1, 1)
        cnt_r = jnp.clip(cnt - lo, 0, l)
        done = tiles_done(lo, t_cur)
        # Done tiles: collapse their candidate row to one repeated entry
        # (the pipeline dedupes equal consecutive block fetches) and zero
        # their count.
        cand_r = jnp.where(done[:, None], cand_r[:, :1], cand_r)
        cnt_r = jnp.where(done, 0, cnt_r)
        t_cur, f_cur = call_fn(cand_r, cnt_r, tent_r, coeff, feats, t_cur, f_cur)
        return r + np.int32(1), t_cur, f_cur

    def cond(carry):
        r, t_cur, _ = carry
        in_range = r < np.int32(r_rounds)
        live = ~jnp.all(tiles_done(r * np.int32(l), t_cur))
        return in_range & live

    if r_rounds == 1:
        cnt_r = jnp.clip(cnt, 0, l)
        return call_fn(cand, cnt_r, tent, coeff, feats, t0, f0)
    _, t_cur, f_cur = jax.lax.while_loop(
        cond, body, (np.int32(0), t0, f0)
    )
    return t_cur, f_cur


# Rays per lax.map chunk: bounds the scalar-prefetch tables (cand/tent,
# SMEM-resident — v5e has ~1 MB of SMEM) and the (T, C) cull-stage arrays.
# 131072 rays at tile=256 is T=512 tiles: 512 x (slots+slots+2) x 4 B of
# prefetch data per call, ~530 KB at the default 128 slots.
CULL_CHUNK_RAYS = 131072

# Scenes up to this many clusters (x64 faces) use the masked sweep: the
# whole coefficient table is VMEM-resident (16 KB/cluster) and every
# cluster is a statically unrolled, bit-gated section — no candidate
# lists, no sort, no per-step scalar chain. Bounded by Mosaic program
# size (sections unroll) and VMEM, both comfortable at 48.
MASKED_MAX_CLUSTERS = 48


def intersect_cull(
    xp, o, d, cset, light_pos=None, alive=None, tile: int = 256,
    slots: int = 128, precision: str = "highest", sort=None,
    chunk_rays: int = CULL_CHUNK_RAYS, interpret: bool = False,
):
    """Nearest-hit over a ClusterSet via cull-and-sweep (jax + TPU only).

    Same contract as ``intersect_brute`` — ``(t, face)`` with face = -1 on
    miss and memory-order first-face-wins tie-breaking (exact, via the
    kernel's (t, face)-lexicographic minima). With ``light_pos`` (scalar
    Vec3, light 0) the NEE shadow any-hit runs as a second cull+sweep pass
    on the derived shadow rays and ``(t, face, occluded)`` is returned.

    ``alive``: optional per-ray liveness. Dead lanes keep their (stale)
    ray values — so tile frustums stay tight — but are seeded closed
    (t = -BIG), contribute no work, never block a tile's early-out, and
    report face = -1.

    ``sort``: one octant+Morton argsort per call. Bounce rays with
    hemisphere-spread directions leave tile direction intervals
    sign-mixed, which disables the slab constraint and costs 4x at 100k
    faces (measured 3397 vs 793 ms per 1M-bounce-ray pass); but the sort
    itself costs ~80 ms per 1M-ray call, which dwarfs everything at small
    cluster counts. Default (None): sort iff the scene exceeds one
    candidate round (C > 96). The derived NEE shadow pass reuses the
    sorted order (shadow origins inherit its locality).

    Batches beyond ``chunk_rays`` run as a device-side ``lax.map`` over
    ray chunks (one compiled body): the per-call scalar-prefetch tables
    must fit SMEM, and total work is chunk-invariant.
    """
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.cull import candidates, coherence_keys
    from pbr_tpu.ops.vec import Vec3

    c = cset.coeffs.shape[0]
    s = cset.coeffs.shape[2] // 4
    shape = o.x.shape
    flat = int(np.prod(shape)) if shape else 1
    chunk = min(
        max(tile, (chunk_rays // tile) * tile),
        -(-flat // tile) * tile,
    )
    pad = (-flat) % chunk
    total = flat + pad
    n_chunks = total // chunk
    n_tiles = chunk // tile
    slots = min(slots, c)
    if sort is None:
        sort = c > 96

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

    perm = inv_perm = None
    if sort:
        keys = coherence_keys(
            jnp, Vec3(ox, oy, oz), Vec3(dx, dy, dz), cset.scene_min, cset.scene_max
        )
        perm = jnp.argsort(keys)
        inv_perm = jnp.argsort(perm)
        ox, oy, oz, dx, dy, dz, alive_f = (
            a[perm] for a in (ox, oy, oz, dx, dy, dz, alive_f)
        )

    coeff = cset.coeffs
    nee = light_pos is not None
    if nee:
        lpx = jax.lax.stop_gradient(jnp.asarray(light_pos.x, jnp.float32))
        lpy = jax.lax.stop_gradient(jnp.asarray(light_pos.y, jnp.float32))
        lpz = jax.lax.stop_gradient(jnp.asarray(light_pos.z, jnp.float32))

    def feats_of(ox, oy, oz, dx, dy, dz, tlim):
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        ones = jnp.ones_like(ox)
        zeros = jnp.zeros_like(ox)
        rows = [ox, oy, oz, dx, dy, dz, cx, cy, cz, ones, tlim] + [zeros] * (
            K_ROWS - 11
        )
        f = jnp.stack(rows, axis=0)  # (K_ROWS, chunk)
        return f.reshape(K_ROWS, n_tiles, tile).transpose(1, 0, 2)

    def run_pass(ov, dv, tlim, seed_t, seed_f, any_hit, t_cap, watch):
        feats = feats_of(ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, tlim)
        if c <= MASKED_MAX_CLUSTERS:
            from pbr_tpu.ops.cull import fine_hit_mask

            hit = fine_hit_mask(jnp, ov, dv, cset, tile, t_cap=t_cap)
            w = -(-c // 16)
            pad_bits = w * 16 - c
            bits = hit.astype(jnp.int32)
            if pad_bits:
                bits = jnp.concatenate(
                    [bits, jnp.zeros((n_tiles, pad_bits), jnp.int32)], axis=1
                )
            words = jnp.sum(
                bits.reshape(n_tiles, w, 16)
                << jnp.arange(16, dtype=jnp.int32)[None, None, :],
                axis=2,
                dtype=jnp.int32,
            )
            call = _build_call_masked(
                c, s, tile, n_tiles, precision, any_hit,
                interpret=interpret, vma=_vma_of(ov.x),
            )
            return call(
                words, coeff, feats,
                seed_t.reshape(n_tiles, 1, tile), seed_f.reshape(n_tiles, 1, tile),
            )
        cand, cnt, tent = candidates(jnp, ov, dv, cset, tile, t_cap=t_cap)
        tent = jnp.concatenate(
            [tent, jnp.full((n_tiles, 1), np.float32(3.0e38), jnp.float32)], axis=1
        )
        call = _build_call(
            c, s, tile, n_tiles, slots, precision, any_hit,
            # Small candidate sets (single-round scenes): drop the per-step
            # done flag — its cross-lane max + SMEM round-trip is serial
            # latency worth more than the few slots it can skip.
            early_out=c > 96,
            interpret=interpret, vma=_vma_of(ov.x),
        )
        return _sweep_rounds(
            jnp, call, cand, cnt, tent, coeff, feats,
            seed_t.reshape(n_tiles, 1, tile), seed_f.reshape(n_tiles, 1, tile),
            slots, any_hit, watch_ref=watch,
        )

    def chunk_fn(args):
        ox, oy, oz, dx, dy, dz, alive_c = args
        zeros = jnp.zeros((chunk,), jnp.float32)
        t_seed = jnp.where(alive_c, INF, _BIG_NEG)
        f_seed = jnp.full((chunk,), -1, jnp.int32)
        t_out, f_out = run_pass(
            Vec3(ox, oy, oz), Vec3(dx, dy, dz), zeros, t_seed, f_seed,
            any_hit=False, t_cap=None, watch=None,
        )
        t_flat = t_out.reshape(-1)
        f_flat = f_out.reshape(-1)
        if not nee:
            return t_flat, f_flat, f_flat
        one = np.float32(1.0)
        # Shadow-ray derivation: the same guarded math as the fused NEE
        # kernels (pallas_intersect.py::_kernel_nee) so golden parity holds.
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
        t_cap = jnp.max(
            jnp.where(hit, t_light, 0.0).reshape(n_tiles, tile), axis=1
        )
        occ_seed = jnp.where(hit, 0.0, 1.0).astype(jnp.float32)
        watch = jnp.where(hit, t_light, _BIG_NEG).reshape(n_tiles, tile)
        occ_out, _ = run_pass(
            Vec3(hx, hy, hz), Vec3(sx, sy, sz), t_light, occ_seed, f_seed,
            any_hit=True, t_cap=t_cap, watch=watch,
        )
        return t_flat, f_flat, (occ_out.reshape(-1) > 0.0).astype(jnp.int32)

    args = tuple(
        a.reshape(n_chunks, chunk)
        for a in (ox, oy, oz, dx, dy, dz, alive_f)
    )
    if n_chunks == 1:
        outs = chunk_fn(tuple(a[0] for a in args))
    else:
        outs = jax.lax.map(chunk_fn, args)
    t_flat = outs[0].reshape(-1)
    f_flat = outs[1].reshape(-1)
    occ_flat = (outs[2].reshape(-1) != 0) if nee else None

    if sort:
        t_flat, f_flat = t_flat[inv_perm], f_flat[inv_perm]
        if occ_flat is not None:
            occ_flat = occ_flat[inv_perm]
    t_res = t_flat[:flat].reshape(shape)
    f_res = f_flat[:flat].reshape(shape)
    if nee:
        return t_res, f_res, occ_flat[:flat].reshape(shape)
    return t_res, f_res
