"""Row-sweep: the VPU-form, per-row-culled cull-and-sweep intersector.

Round-4 successor to the matmul sweep (ops/pallas_cull.py). Two measured
facts drive the redesign (docs/PERF.md):

1. **The thin-K MXU matmul is the wrong engine for Möller-Trumbore.** The
   old kernel contracts a (16, 4S) coefficient block against (16, tile)
   ray features — K = 16 of 128 MXU rows, and f32 HIGHEST costs ~6 bf16
   passes — so one ray-face test spends ~128 padded MACs x 6 where a plain
   VPU evaluation of the same hoisted linear form spends ~70 native-f32
   lane-ops. This kernel evaluates the linear form elementwise on
   (rows, 128) tiles: faces along LANES (one lin cluster = 128 faces =
   exactly one f32 lane row), rays along SUBLANES — per-test cost equal to
   the proven brute kernel's, at full f32 precision with no bf16 splits.

2. **The tile-union frustum over-collects 5-10x on bounce populations.**
   Candidate lists stay per-TILE (they drive the HBM block stream), but
   every entry carries per-ROW (tile/groups = 32 rays) frustum verdict
   bits (ops/cull.py::candidates_rows); each row is an independent
   ``pl.when`` section, so a cluster needed by one row costs 1/groups of
   the vector work — per-sublane-row culling, the reference's per-ray
   `t_best > t_near` cut (pt_bvh.cl:82-123) lifted to the finest
   granularity the VPU serves at native width.

Further structure:

- **Deferred reduction.** Per-(ray, lane) running (t, face) minima live in
  VMEM scratch across all slots of a tile; the cross-lane lexicographic
  (t, face) reduction runs ONCE per tile, not per step — the per-step
  epilogue that bounded the old kernel at ~0.8 us/step disappears.
- **Per-row occlusion early-out.** With near-to-far candidate lists, a
  row retires (scalar SMEM flag) as soon as every live ray's best hit is
  closer than the next slot's conservative entry bound — rows stop at
  their own depth instead of the tile's worst ray.
- **Same streaming plan.** PrefetchScalarGridSpec block indexing streams
  each candidate's (16, 128) block from HBM through the pipeline — no
  manual DMA, no VMEM cap on scene size; blocks are 8 KB compact (vs the
  old 32 KB at S=128).

Exact global (t, face)-lexicographic minima keep memory-order
first-face-wins parity with every other intersector.
"""

from __future__ import annotations

import functools

import numpy as np

from pbr_tpu.accel.clusters import LIN_ROWS, LIN_SIZE
from pbr_tpu.ops.intersect import INF
from pbr_tpu.utils.config import EPSILON5

_BIG = np.float32(3.0e38)
_BIG_NEG = np.float32(-3.0e38)
_SENT = np.int32(2**30)

# Ray "columns" of the (tile, RCOLS) per-tile ray block:
# [o.xyz, d.xyz, (o x d).xyz, t_limit]; the rest is padding.
RCOLS = 16
_NB = 10  # broadcast scratch rows (the 10 live columns)

# Scenes up to this many lin clusters (x128 faces) keep the whole lin
# table VMEM-resident and statically unroll every (cluster, row) section —
# no candidate lists, no sort, no per-step scalar chain.
MASKED_MAX_LIN = 48


def _init_state(jnp, any_hit, tin, fin, tile, s, tstate, fstate):
    """Seed the deferred per-lane state: lane 0 carries the (t, f) seed
    (previous round / alive mask encoding), other lanes are neutral.
    Dead rays arrive with t seed = -BIG; every lane inherits it so no
    update (strict <) can ever fire on their stale ray data."""
    import jax

    lane0 = jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1) == 0
    if any_hit:
        tstate[...] = jnp.where(lane0, tin, np.float32(0.0))
    else:
        dead = tin <= _BIG_NEG  # (tile, 1)
        tstate[...] = jnp.where(lane0, tin, jnp.where(dead, _BIG_NEG, INF))
        fstate[...] = jnp.where(lane0, fin, _SENT)


def _finalize(jnp, any_hit, tstate, fstate, fin, t_ref, f_ref):
    """Cross-lane reduction, once per tile: any-hit ORs the occlusion
    lanes; nearest takes the exact (t, face)-lexicographic minimum."""
    if any_hit:
        t_ref[0] = jnp.max(tstate[...], axis=1, keepdims=True)
        f_ref[0] = fin
    else:
        ts = tstate[...]
        tmin = jnp.min(ts, axis=1, keepdims=True)
        fmin = jnp.min(
            jnp.where(ts == tmin, fstate[...], _SENT), axis=1, keepdims=True
        )
        t_ref[0] = tmin
        f_ref[0] = fmin


def _section(jnp, s, cid, row, bc, lo, rg, any_hit, tstate, fstate):
    """Test one row-group (``rg`` rays, sublanes) against one lin cluster
    (``s`` faces, lanes). ``row(k)`` -> the (1, s) coefficient row
    (sublane-broadcast, effectively free); ray components come
    pre-lane-broadcast from the ``bc`` scratch. Linear-form quantities as
    in ops/pallas_intersect.py::_sweep_lin."""
    import jax

    sl = slice(lo, lo + rg)
    ox, oy, oz = bc[0, sl], bc[1, sl], bc[2, sl]
    dx, dy, dz = bc[3, sl], bc[4, sl], bc[5, sl]
    cx, cy, cz = bc[6, sl], bc[7, sl], bc[8, sl]
    det = dx * row(0) + dy * row(1) + dz * row(2)
    inv = 1.0 / det
    tt = (row(3) - (ox * row(0) + oy * row(1) + oz * row(2))) * inv
    uu = (
        (row(13) * cx + row(14) * cy + row(15) * cz)
        - (dx * row(4) + dy * row(5) + dz * row(6))
    ) * inv
    vv = (
        -(row(10) * cx + row(11) * cy + row(12) * cz)
        - (dx * row(7) + dy * row(8) + dz * row(9))
    ) * inv
    valid = (
        (tt >= np.float32(EPSILON5)) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
    )
    if any_hit:
        tl = bc[9, sl]
        occ = tstate[sl]
        tstate[sl] = jnp.where(valid & (tt < tl), np.float32(1.0), occ)
    else:
        ts = tstate[sl]
        fs = fstate[sl]
        fid = cid * np.int32(s) + jax.lax.broadcasted_iota(
            jnp.int32, (rg, s), 1
        )
        better = valid & ((tt < ts) | ((tt == ts) & (fid < fs)))
        tstate[sl] = jnp.where(better, tt, ts)
        fstate[sl] = jnp.where(better, fid, fs)


def _row_done(jnp, any_hit, tstate, bc, lo, rg, bound):
    """Scalar row-retire check: every live ray's key is already closer
    than ``bound`` (the next slot's conservative entry lower bound)."""
    if any_hit:
        occ = jnp.max(tstate[lo : lo + rg], axis=1, keepdims=True)  # (rg, 1)
        watch = jnp.where(occ > 0.0, _BIG_NEG, bc[9, lo : lo + rg, 0:1])
        return (jnp.max(watch) <= bound).astype(jnp.int32)
    tmin = jnp.min(tstate[lo : lo + rg], axis=1, keepdims=True)
    return (jnp.max(tmin) <= bound).astype(jnp.int32)


def _kernel_rows(s, slots, tile, groups, any_hit, early_out,
                 cand_ref, cnt_ref, tent_ref,
                 coeff_ref, rays_ref, tin_ref, fin_ref,
                 t_ref, f_ref, bc, tstate, fstate, done_s):
    """Slotted row-sweep step: tile ``t``, candidate slot ``l``."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    l = pl.program_id(1)
    rg = tile // groups

    @pl.when(l == 0)
    def _():
        rays = rays_ref[0]  # (tile, RCOLS)
        for k in range(_NB):
            bc[k] = jnp.broadcast_to(rays[:, k : k + 1], (tile, s))
        _init_state(jnp, any_hit, tin_ref[0], fin_ref[0], tile, s, tstate, fstate)
        for g in range(groups):
            if early_out:
                # Rows whose seeds already beat the first entry bound
                # (fully occluded / previous-round hits) skip everything.
                done_s[g] = _row_done(
                    jnp, any_hit, tstate, bc, g * rg, rg, tent_ref[t, 0]
                )
            else:
                done_s[g] = 0

    entry = cand_ref[t, l]
    cid = entry & np.int32(0xFFFF)
    mask = entry >> 16
    run0 = l < cnt_ref[t]
    row = lambda k: coeff_ref[0, k : k + 1, :]  # noqa: E731
    for g in range(groups):
        live = run0 & (((mask >> g) & 1) != 0)
        if early_out:
            live = live & (done_s[g] == 0)

        @pl.when(live)
        def _(g=g):
            _section(jnp, s, cid, row, bc, g * rg, rg, any_hit, tstate, fstate)
            if early_out:
                done_s[g] = _row_done(
                    jnp, any_hit, tstate, bc, g * rg, rg, tent_ref[t, l + 1]
                )

    @pl.when(l == slots - 1)
    def _():
        _finalize(jnp, any_hit, tstate, fstate, fin_ref[0], t_ref, f_ref)


def _kernel_masked_rows(s, cl, tile, groups, any_hit,
                        words_ref, lin_ref, rays_ref, tin_ref, fin_ref,
                        t_ref, f_ref, bc, tstate, fstate):
    """Masked row-sweep: whole lin table VMEM-resident, every
    (cluster, row) pair a statically-unrolled section gated by one
    prefetched verdict bit (two clusters' 8-bit row masks per int32)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    rg = tile // groups
    rays = rays_ref[0]
    for k in range(_NB):
        bc[k] = jnp.broadcast_to(rays[:, k : k + 1], (tile, s))
    _init_state(jnp, any_hit, tin_ref[0], fin_ref[0], tile, s, tstate, fstate)

    for c in range(cl):
        w = words_ref[t, c // 2]
        sh = (c % 2) * 8
        for g in range(groups):
            bit = (w >> (sh + g)) & 1

            @pl.when(bit != 0)
            def _(c=c, g=g):
                row = lambda k: lin_ref[c, k : k + 1, :]  # noqa: E731
                _section(
                    jnp, s, np.int32(c), row, bc, g * rg, rg, any_hit,
                    tstate, fstate,
                )

    _finalize(jnp, any_hit, tstate, fstate, fin_ref[0], t_ref, f_ref)


def _vma_of(x):
    try:
        import jax

        v = jax.typeof(x).vma
        return tuple(sorted(v)) if v else ()
    except Exception:
        return ()


@functools.lru_cache(maxsize=None)
def _build_call(cl: int, s: int, tile: int, groups: int, n_tiles: int,
                slots: int, any_hit: bool, early_out: bool,
                interpret: bool = False, vma: tuple = ()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cand, cnt, tent
        grid=(n_tiles, slots),
        in_specs=[
            pl.BlockSpec(  # lin coefficient block of the step's candidate
                (1, LIN_ROWS, s),
                lambda t, l, cand, cnt, tent: (cand[t, l] & 0xFFFF, 0, 0),
            ),
            pl.BlockSpec((1, tile, RCOLS), lambda t, l, *_: (t, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, l, *_: (t, 0, 0)),  # t seed
            pl.BlockSpec((1, tile, 1), lambda t, l, *_: (t, 0, 0)),  # f seed
        ],
        out_specs=(
            pl.BlockSpec((1, tile, 1), lambda t, l, *_: (t, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, l, *_: (t, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NB, tile, s), jnp.float32),
            pltpu.VMEM((tile, s), jnp.float32),
            pltpu.VMEM((tile, s), jnp.int32),
            pltpu.SMEM((groups,), jnp.int32),
        ],
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        functools.partial(_kernel_rows, s, slots, tile, groups, any_hit, early_out),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.float32, **kw),
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.int32, **kw),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_call_masked(cl: int, s: int, tile: int, groups: int, n_tiles: int,
                       any_hit: bool, interpret: bool = False, vma: tuple = ()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # (T, W) packed row-verdict words
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cl, LIN_ROWS, s), lambda t, w: (0, 0, 0)),
            pl.BlockSpec((1, tile, RCOLS), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, w: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, 1), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, w: (t, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NB, tile, s), jnp.float32),
            pltpu.VMEM((tile, s), jnp.float32),
            pltpu.VMEM((tile, s), jnp.int32),
        ],
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        functools.partial(_kernel_masked_rows, s, cl, tile, groups, any_hit),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.float32, **kw),
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.int32, **kw),
        ),
        interpret=interpret,
    )


# Rays per lax.map chunk — same SMEM-bound reasoning as the matmul sweep
# (ops/pallas_cull.py::CULL_CHUNK_RAYS).
SWEEP_CHUNK_RAYS = 131072


def intersect_sweep(
    xp, o, d, cset, light_pos=None, alive=None, tile: int = 256,
    groups: int = 8, slots: int = 128, sort=None,
    chunk_rays: int = SWEEP_CHUNK_RAYS, interpret: bool = False,
    with_counts: bool = False,
):
    """Nearest-hit over a ClusterSet via the row-sweep (jax + TPU only).

    Contract identical to ``intersect_cull`` (ops/pallas_cull.py): returns
    ``(t, face)`` — face -1 on miss, memory-order first-face-wins — or
    ``(t, face, occluded)`` when ``light_pos`` requests the fused NEE
    shadow any-hit second pass. ``alive`` closes dead lanes out of the
    sweep. ``sort`` (default: scenes beyond one candidate round) performs
    one octant+Morton argsort per call so 32-ray rows stay coherent.

    ``with_counts``: additionally return a per-ray int32 of ray-face
    tests the sweep *would* execute for that ray (its row's swept faces —
    the reference's per-ray intersection-test debug counter,
    pt_bvh.cl:23,89, at row granularity). Computed from the cull verdicts
    in XLA, so the kernel is untouched; early-out savings are not
    subtracted (the counter is the reference's "work upper bound" shape).
    Appended as the last element of the returned tuple.
    """
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.cull import candidates_rows, coherence_keys, row_hit_words
    from pbr_tpu.ops.vec import Vec3

    cl = cset.lin.shape[0]
    s = cset.lin.shape[2]
    rg = tile // groups
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
    slots = min(slots, cl)
    if sort is None:
        sort = cl > 96

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

    lin = cset.lin
    nee = light_pos is not None
    if nee:
        lpx = jax.lax.stop_gradient(jnp.asarray(light_pos.x, jnp.float32))
        lpy = jax.lax.stop_gradient(jnp.asarray(light_pos.y, jnp.float32))
        lpz = jax.lax.stop_gradient(jnp.asarray(light_pos.z, jnp.float32))

    def rays_of(ox, oy, oz, dx, dy, dz, tlim):
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        zeros = jnp.zeros_like(ox)
        cols = [ox, oy, oz, dx, dy, dz, cx, cy, cz, tlim] + [zeros] * (
            RCOLS - 10
        )
        r = jnp.stack(cols, axis=-1)  # (chunk, RCOLS)
        return r.reshape(n_tiles, tile, RCOLS)

    def run_pass(ov, dv, tlim, seed_t, seed_f, any_hit, t_cap_rows, live):
        rays = rays_of(ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, tlim)
        seed_t3 = seed_t.reshape(n_tiles, tile, 1)
        seed_f3 = seed_f.reshape(n_tiles, tile, 1)
        counts_per_ray = None
        if cl <= MASKED_MAX_LIN:
            words = row_hit_words(
                jnp, ov, dv, cset, tile, groups, t_cap=t_cap_rows, live=live
            )
            if with_counts:
                # Unpack each row's verdict popcount back out of the words:
                # word w holds cluster 2w's row bits 0-7 and 2w+1's at 8-15.
                wv = words[:, :, None]  # (T, W, 1)
                g_sh = jnp.arange(groups, dtype=jnp.int32)[None, None, :]
                bits = ((wv >> g_sh) & 1) + ((wv >> (g_sh + 8)) & 1)
                per_row = jnp.sum(bits, axis=1)  # (T, groups)
                counts_per_ray = jnp.repeat(
                    per_row.reshape(-1), rg
                ) * np.int32(s)
            call = _build_call_masked(
                cl, s, tile, groups, n_tiles, any_hit,
                interpret=interpret, vma=_vma_of(ov.x),
            )
            t_out, f_out = call(words, lin, rays, seed_t3, seed_f3)
            return t_out, f_out, counts_per_ray
        cand, cnt, tent = candidates_rows(
            jnp, ov, dv, cset, tile, groups, t_cap=t_cap_rows, live=live
        )
        if with_counts:
            j = jnp.arange(cand.shape[1], dtype=jnp.int32)[None, :]
            live_slot = j < cnt[:, None]  # (T, CL)
            rowbits = (cand >> 16)[:, None, :] >> jnp.arange(
                groups, dtype=jnp.int32
            )[None, :, None]  # (T, groups, CL)
            per_row = jnp.sum(
                (rowbits & 1) * live_slot[:, None, :].astype(jnp.int32),
                axis=2,
            )  # (T, groups) clusters swept per row
            counts_per_ray = jnp.repeat(per_row.reshape(-1), rg) * np.int32(s)
        tent = jnp.concatenate(
            [tent, jnp.full((n_tiles, 1), _BIG, jnp.float32)], axis=1
        )
        from pbr_tpu.ops.pallas_cull import _sweep_rounds

        call = _build_call(
            cl, s, tile, groups, n_tiles, slots, any_hit,
            early_out=cl > 96, interpret=interpret, vma=_vma_of(ov.x),
        )
        watch = None
        if any_hit:
            watch = jnp.where(
                seed_t.reshape(n_tiles, tile) > 0.0, _BIG_NEG,
                tlim.reshape(n_tiles, tile),
            )
        t_out, f_out = _sweep_rounds(
            jnp, call, cand, cnt, tent, lin, rays, seed_t3, seed_f3,
            slots, any_hit, watch_ref=watch,
        )
        return t_out, f_out, counts_per_ray

    def chunk_fn(args):
        ox, oy, oz, dx, dy, dz, alive_c = args
        zeros = jnp.zeros((chunk,), jnp.float32)
        t_seed = jnp.where(alive_c, INF, _BIG_NEG)
        f_seed = jnp.full((chunk,), -1, jnp.int32)
        t_out, f_out, n_tests = run_pass(
            Vec3(ox, oy, oz), Vec3(dx, dy, dz), zeros, t_seed, f_seed,
            any_hit=False, t_cap_rows=None, live=alive_c,
        )
        t_flat = t_out.reshape(-1)
        f_flat = f_out.reshape(-1)
        if n_tests is None:
            n_tests = jnp.zeros((chunk,), jnp.int32)
        if not nee:
            return t_flat, f_flat, f_flat, n_tests
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
        t_cap_rows = jnp.max(
            jnp.where(hit, t_light, 0.0).reshape(-1, rg), axis=1
        )
        occ_seed = jnp.where(hit, 0.0, 1.0).astype(jnp.float32)
        occ_out, _, n_tests_sh = run_pass(
            Vec3(hx, hy, hz), Vec3(sx, sy, sz), t_light, occ_seed, f_seed,
            any_hit=True, t_cap_rows=t_cap_rows, live=hit,
        )
        if n_tests_sh is not None:
            n_tests = n_tests + n_tests_sh
        return (
            t_flat, f_flat,
            (occ_out.reshape(-1) > 0.0).astype(jnp.int32),
            n_tests,
        )

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
    tests_flat = outs[3].reshape(-1)

    if sort:
        t_flat, f_flat = t_flat[inv_perm], f_flat[inv_perm]
        if occ_flat is not None:
            occ_flat = occ_flat[inv_perm]
        tests_flat = tests_flat[inv_perm]
    t_res = t_flat[:flat].reshape(shape)
    f_res = f_flat[:flat].reshape(shape)
    out = [t_res, f_res]
    if nee:
        out.append(occ_flat[:flat].reshape(shape))
    if with_counts:
        out.append(tests_flat[:flat].reshape(shape))
    return tuple(out)
