"""Cull stage of the cull-and-sweep intersector: dense candidate selection.

Replaces per-ray BVH *descent* with one vectorized, conservative test of
every ray tile against every cluster AABB (accel/clusters.py). There is no
serial walk anywhere: tiles are (tile,) runs of the Morton/octant-sorted
ray batch, each reduced to an interval frustum (origin AABB x per-axis
direction interval), and a cluster is a candidate for a tile iff the
interval slab test cannot rule out an intersection. Conservative means a
candidate list may contain extra clusters (swept harmlessly by the exact
per-ray Möller-Trumbore stage) but NEVER misses one that any ray of the
tile could hit — the property the parity tests pin.

All plain XLA (or NumPy — backend-generic), differentiation-free (the
nearest-face search is detached by contract, ops/traverse.py).
"""

from __future__ import annotations

import numpy as np

from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import ClusterSet
from pbr_tpu.utils.config import EPSILON5

F32 = np.float32
_BIG = F32(3.0e38)  # finite stand-in for +/-inf (keeps 0*inf NaNs out)

# Candidate entries are fine-cluster ids with this bit set when the tile's
# frustum misses that fine cluster: the sweep kernel skips the slot with
# two scalar reads (no per-step vector work), and its index_map masks the
# bit off for the (harmless) block prefetch.
CAND_MISS = np.int32(1 << 20)


def coherence_keys(xp, o: Vec3, d: Vec3, lo: Vec3, hi: Vec3):
    """Octant+Morton sort keys against explicit scene bounds (the BVH-free
    generalization of ops.traverse._coherence_keys)."""
    from pbr_tpu.ops.traverse import _part1by2

    inv = Vec3(
        1.0 / xp.maximum(hi.x - lo.x, 1e-9),
        1.0 / xp.maximum(hi.y - lo.y, 1e-9),
        1.0 / xp.maximum(hi.z - lo.z, 1e-9),
    )

    def q(c, mn, iv):
        return xp.clip((c - mn) * iv * 1023.0, 0.0, 1023.0).astype(xp.int32)

    morton = (
        _part1by2(xp, q(o.x, lo.x, inv.x))
        | (_part1by2(xp, q(o.y, lo.y, inv.y)) << 1)
        | (_part1by2(xp, q(o.z, lo.z, inv.z)) << 2)
    )
    octant = (
        (d.x < 0).astype(xp.int32)
        + 2 * (d.y < 0).astype(xp.int32)
        + 4 * (d.z < 0).astype(xp.int32)
    )
    return (octant << 27) | (morton >> 3)


def _tile_minmax(xp, a, tile: int):
    a2 = a.reshape(-1, tile)
    return xp.min(a2, axis=1), xp.max(a2, axis=1)


def frustum_hits(
    xp, o_lo, o_hi, d_lo, d_hi, bb_min: Vec3, bb_max: Vec3, t_cap=None
):
    """Conservative tile-frustum vs cluster-AABB test.

    ``o_lo``/``o_hi``/``d_lo``/``d_hi``: Vec3 of (T,) per-tile component
    bounds. ``bb_min``/``bb_max``: Vec3 of (C,). Returns (T, C) bool.

    Per axis, the slab-crossing parameter t = (slab - o) / d is bounded by
    interval arithmetic: with sign-pure direction intervals the eight
    products of {slab_lo - o_hi, slab_lo - o_lo, slab_hi - o_hi,
    slab_hi - o_lo} x {1/d_lo, 1/d_hi} bound every ray's [t_lo, t_hi];
    a direction interval spanning 0 gives that axis no constraint
    (conservative). A frustum hits iff max-entry <= min-exit and the exit
    is in front (the same gate as the per-ray slab test,
    ops/intersect.py::slab_box). ``t_cap`` (T,): optional conservative
    upper bound on useful t (e.g. max shadow-ray length per tile).

    The entry bound additionally takes the Euclidean box-to-box distance —
    valid for UNIT ray directions (every integrator ray is normalized) and
    independent of the direction interval entirely, so tiles with mixed
    direction signs (e.g. diffuse-bounce tiles reusing the primary pixel
    order) still get a useful near-to-far ordering and early-out key.
    """
    t_entry = xp.full((o_lo.x.shape[0], bb_min.x.shape[0]), -_BIG, dtype=xp.float32)
    t_exit = xp.full_like(t_entry, _BIG)

    for ol, oh, dl, dh, sl, sh in (
        (o_lo.x, o_hi.x, d_lo.x, d_hi.x, bb_min.x, bb_max.x),
        (o_lo.y, o_hi.y, d_lo.y, d_hi.y, bb_min.y, bb_max.y),
        (o_lo.z, o_hi.z, d_lo.z, d_hi.z, bb_min.z, bb_max.z),
    ):
        pure = (dl > 0.0) | (dh < 0.0)  # (T,)
        # Guarded reciprocals (value unused when not pure).
        safe = lambda v: xp.where(pure, v, F32(1.0))  # noqa: E731
        inv_a = (1.0 / safe(dl))[:, None]
        inv_b = (1.0 / safe(dh))[:, None]
        e_ll = sl[None, :] - oh[:, None]  # slab lo minus origin hi, etc.
        e_lh = sl[None, :] - ol[:, None]
        e_hl = sh[None, :] - oh[:, None]
        e_hh = sh[None, :] - ol[:, None]
        p = [
            e_ll * inv_a, e_ll * inv_b, e_lh * inv_a, e_lh * inv_b,
            e_hl * inv_a, e_hl * inv_b, e_hh * inv_a, e_hh * inv_b,
        ]
        t_lo = p[0]
        t_hi = p[0]
        for v in p[1:]:
            t_lo = xp.minimum(t_lo, v)
            t_hi = xp.maximum(t_hi, v)
        pure_c = pure[:, None]
        t_entry = xp.maximum(t_entry, xp.where(pure_c, t_lo, -_BIG))
        t_exit = xp.minimum(t_exit, xp.where(pure_c, t_hi, _BIG))

    # Box-to-box distance lower bound (unit directions): per-axis gap.
    d2 = xp.zeros_like(t_entry)
    for ol, oh, sl, sh in (
        (o_lo.x, o_hi.x, bb_min.x, bb_max.x),
        (o_lo.y, o_hi.y, bb_min.y, bb_max.y),
        (o_lo.z, o_hi.z, bb_min.z, bb_max.z),
    ):
        gap = xp.maximum(
            xp.maximum(sl[None, :] - oh[:, None], ol[:, None] - sh[None, :]),
            F32(0.0),
        )
        # Clamp before squaring: empty octant groups carry +/-BIG bounds
        # whose squared gaps overflow f32 (harmless but noisy); clamping
        # DOWN only lowers the entry bound, which stays conservative.
        gap = xp.minimum(gap, F32(1.0e18))
        d2 = d2 + gap * gap
    dist = xp.sqrt(d2)
    t_entry = xp.maximum(t_entry, dist)

    hit = (t_entry <= t_exit) & (t_exit > F32(EPSILON5))
    if t_cap is not None:
        hit = hit & (t_entry <= t_cap[:, None])
    # Inverted (empty) cluster AABBs never hit; with sign-pure directions
    # the interval test already rejects them, but an all-axes-unconstrained
    # tile would pass, so gate explicitly.
    nonempty = (bb_min.x <= bb_max.x)[None, :]
    # t_entry doubles as the sweep's early-out key: a lower bound on any
    # tile ray's entry into the cluster (clamped up to 0 — entries behind
    # the origin can still produce forward hits, but never closer than 0).
    return hit & nonempty, xp.maximum(t_entry, F32(0.0))


def candidates(xp, o: Vec3, d: Vec3, cset: ClusterSet, tile: int, t_cap=None):
    """Per-tile candidate cluster lists (supercluster-ordered).

    ``o``/``d``: flat (N,) SORTED ray components, N a multiple of ``tile``.
    The frustum test and near-to-far argsort run at SUPERcluster
    granularity — (T, C/SUPER) work; a full (T, C) argsort was the
    measured cost center of the whole intersect at 100k faces — and the
    fine candidate list expands arithmetically: each hit supercluster
    contributes its SUPER consecutive fine clusters in ascending id order.
    The sweep kernel box-gates each fine cluster itself (the AABB rides in
    the coefficient block), so the only cost of the coarser enumeration is
    slot/DMA budget, not compute.

    Returns ``(cand, counts, tent)``:

    - ``cand`` (T, C) int32 — fine cluster ids, supercluster-near-to-far
      (determinism comes from the sweep's exact global-face-id
      tie-breaking, not processing order), padding slots repeating the
      last valid entry;
    - ``counts`` (T,) int32 — valid entries per tile (0 = tile hits
      nothing);
    - ``tent`` (T, C) f32 — each slot's conservative entry lower bound,
      inherited from its supercluster (a child box is inside its super
      box, so the bound stays sound; +BIG on padding slots): the sweep
      stops a tile once every ray's best hit is closer than the next
      slot's ``tent``.
    """
    from pbr_tpu.accel.clusters import SUPER

    c2 = cset.sup_min.x.shape[0]
    c = c2 * SUPER
    ox = _tile_minmax(xp, o.x, tile)
    oy = _tile_minmax(xp, o.y, tile)
    oz = _tile_minmax(xp, o.z, tile)
    dx = _tile_minmax(xp, d.x, tile)
    dy = _tile_minmax(xp, d.y, tile)
    dz = _tile_minmax(xp, d.z, tile)
    o_lo, o_hi = Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1])
    d_lo, d_hi = Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1])
    hit, t_entry = frustum_hits(
        xp, o_lo, o_hi, d_lo, d_hi, cset.sup_min, cset.sup_max, t_cap
    )
    counts2 = xp.sum(hit.astype(xp.int32), axis=1)
    # Near-to-far enumeration; argsort is stable, so ties keep ascending id.
    key = xp.where(hit, t_entry, _BIG)
    order = xp.argsort(key, axis=1).astype(xp.int32)
    j2 = xp.arange(c2, dtype=xp.int32)[None, :]
    take = xp.minimum(j2, xp.maximum(counts2[:, None] - 1, 0))
    sup = xp.take_along_axis(order, take, axis=1)  # (T, C2)
    tent2 = xp.where(
        j2 < counts2[:, None], xp.take_along_axis(t_entry, sup, axis=1), _BIG
    )
    # Arithmetic fine expansion: super s -> fine [s*SUPER, (s+1)*SUPER).
    fine_off = xp.arange(SUPER, dtype=xp.int32)[None, None, :]
    cand = (sup[:, :, None] * np.int32(SUPER) + fine_off).reshape(-1, c)
    tent = xp.broadcast_to(tent2[:, :, None], tent2.shape + (SUPER,)).reshape(
        -1, c
    )
    counts = counts2 * np.int32(SUPER)
    # Fine-granularity verdict per slot (the same dense frustum test at
    # fine-cluster resolution — cheap; only SORTING at fine granularity
    # was expensive), packed into the entry as a miss bit.
    hit_f, _ = frustum_hits(
        xp, o_lo, o_hi, d_lo, d_hi, cset.bb_min, cset.bb_max, t_cap
    )
    ok = xp.take_along_axis(hit_f, cand, axis=1)
    cand = xp.where(ok, cand, cand + CAND_MISS)
    return cand, counts, tent


def candidates_fine(xp, o: Vec3, d: Vec3, cset: ClusterSet, tile: int, t_cap=None):
    """Fine-granularity candidate lists: near-to-far argsort directly over
    the fine clusters — for small-C consumers (the curved Phong-tess path
    runs dense per-tile rounds, one cluster per round, so supercluster
    expansion with miss-bit slots would waste whole rounds; the full
    (T, C) sort is cheap at curved-scene sizes). Same return contract as
    ``candidates`` minus the packing: ``(cand, counts, tent)``, entries
    all valid.
    """
    c = cset.bb_min.x.shape[0]
    ox = _tile_minmax(xp, o.x, tile)
    oy = _tile_minmax(xp, o.y, tile)
    oz = _tile_minmax(xp, o.z, tile)
    dx = _tile_minmax(xp, d.x, tile)
    dy = _tile_minmax(xp, d.y, tile)
    dz = _tile_minmax(xp, d.z, tile)
    o_lo, o_hi = Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1])
    d_lo, d_hi = Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1])
    hit, t_entry = frustum_hits(
        xp, o_lo, o_hi, d_lo, d_hi, cset.bb_min, cset.bb_max, t_cap
    )
    counts = xp.sum(hit.astype(xp.int32), axis=1)
    key = xp.where(hit, t_entry, _BIG)
    order = xp.argsort(key, axis=1).astype(xp.int32)
    j = xp.arange(c, dtype=xp.int32)[None, :]
    take = xp.minimum(j, xp.maximum(counts[:, None] - 1, 0))
    cand = xp.take_along_axis(order, take, axis=1)
    tent = xp.where(
        j < counts[:, None], xp.take_along_axis(t_entry, cand, axis=1), _BIG
    )
    return cand, counts, tent


def frustum_hits_octants(
    xp, o: Vec3, d: Vec3, g: int, bb_min: Vec3, bb_max: Vec3, t_cap=None,
    live=None,
):
    """Octant-split conservative group-frustum vs cluster-AABB test.

    The plain per-group interval frustum loses the slab constraint the
    moment a group mixes direction signs — exactly the bounce-ray
    population (hemisphere-scattered directions over spatially-local
    origins), where culling matters most (docs/PERF.md round-3 "honest
    bounds": tile-union over-collects 5-10x there). This computes EIGHT
    sign-pure sub-frustums per group — lanes masked by direction octant,
    masked min/max origin/direction bounds — and ORs their verdicts: every
    sub-frustum has sign-pure direction intervals, so the slab test
    constrains all three axes again, and clusters behind a bounce row's
    local tangent plane (roughly half the scene) fail the sub-frustum of
    every octant actually present.

    ``o``/``d``: flat (N,) ray components, N a multiple of ``g`` (the
    group size — a sweep row or a gated tile). ``t_cap``: optional (T,)
    per-group bound. Returns ``(hit, t_entry)`` of (T, C) — hit is the OR
    over octants; t_entry the min over hitting octants (a sound lower
    bound for near-to-far ordering / early-out keys).

    Octants with no lanes are gated off explicitly (their masked bounds
    are inverted boxes, which the distance term already rejects, but the
    gate keeps the reasoning local). Conservative in exactly the
    ``frustum_hits`` sense: may over-include, never misses a cluster any
    live lane of the group could hit.
    """
    t = o.x.shape[0] // g

    def grp(a):
        return a.reshape(t, 1, g)

    oct_id = (
        (d.x < 0).astype(xp.int32)
        + 2 * (d.y < 0).astype(xp.int32)
        + 4 * (d.z < 0).astype(xp.int32)
    )
    m = grp(oct_id) == xp.arange(8, dtype=xp.int32)[None, :, None]  # (T,8,g)
    if live is not None:
        # Dead lanes (terminated paths / missed-shadow seeds) contribute
        # no constraint demand: their (stale) o/d would otherwise inflate
        # the sub-frustums — on miss-heavy scenes most of a late bounce's
        # cluster demand is pure ghosts. Groups with no live lane get no
        # clusters at all, so their sweep sections vanish.
        m = m & grp(live)
    occ = xp.any(m, axis=2).reshape(-1)  # (T*8,)

    def mm(a):
        lo = xp.min(xp.where(m, grp(a), _BIG), axis=2).reshape(-1)
        hi = xp.max(xp.where(m, grp(a), -_BIG), axis=2).reshape(-1)
        return lo, hi

    ox, oy, oz = mm(o.x), mm(o.y), mm(o.z)
    dx, dy, dz = mm(d.x), mm(d.y), mm(d.z)
    cap8 = None
    if t_cap is not None:
        cap8 = xp.broadcast_to(t_cap[:, None], (t, 8)).reshape(-1)
    hit8, te8 = frustum_hits(
        xp,
        Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1]),
        Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1]),
        bb_min, bb_max, cap8,
    )  # (T*8, C)
    hit8 = hit8 & occ[:, None]
    c = bb_min.x.shape[0]
    hit = xp.any(hit8.reshape(t, 8, c), axis=1)
    t_entry = xp.min(
        xp.where(hit8, te8, _BIG).reshape(t, 8, c), axis=1
    )
    return hit, t_entry


def _row_minmax_v(xp, o: Vec3, d: Vec3, rg: int):
    ox = _tile_minmax(xp, o.x, rg)
    oy = _tile_minmax(xp, o.y, rg)
    oz = _tile_minmax(xp, o.z, rg)
    dx = _tile_minmax(xp, d.x, rg)
    dy = _tile_minmax(xp, d.y, rg)
    dz = _tile_minmax(xp, d.z, rg)
    return (
        Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1]),
        Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1]),
    )


def candidates_rows(
    xp, o: Vec3, d: Vec3, cset: ClusterSet, tile: int, groups: int,
    t_cap=None, octants: bool = True, live=None,
):
    """Row-culled candidate lists for the row-sweep kernel
    (ops/pallas_sweep.py): per-TILE near-to-far lists at LIN-cluster
    granularity, with per-ROW (tile/groups rays) frustum verdict bits
    packed into bits 16..16+groups of each entry — the per-sublane-row
    culling that kills the tile-union over-collection (a 32-ray row's
    frustum is far tighter than a 256-ray tile's on bounce populations).

    ``t_cap``: optional (T*groups,) per-ROW conservative upper bound on
    useful t. Returns ``(cand, counts, tent)`` with the ``candidates``
    contract; entries whose row mask is 0 are skipped by the kernel with
    one scalar read.
    """
    rg = tile // groups
    cl = cset.lin.shape[0]
    c2 = cset.sup_min.x.shape[0]
    lps = cl // c2
    if octants:
        hit8s, te8s = frustum_hits_octants(
            xp, o, d, rg, cset.sup_min, cset.sup_max, t_cap, live=live
        )  # (T8, C2)
    else:
        o_lo, o_hi, d_lo, d_hi = _row_minmax_v(xp, o, d, rg)
        hit8s, te8s = frustum_hits(
            xp, o_lo, o_hi, d_lo, d_hi, cset.sup_min, cset.sup_max, t_cap
        )  # (T8, C2)
    t = hit8s.shape[0] // groups
    hit_s = xp.any(hit8s.reshape(t, groups, c2), axis=1)  # (T, C2)
    te_s = xp.min(
        xp.where(hit8s, te8s, _BIG).reshape(t, groups, c2), axis=1
    )  # (T, C2) — min over hitting rows: a sound per-tile entry bound
    counts2 = xp.sum(hit_s.astype(xp.int32), axis=1)
    key = xp.where(hit_s, te_s, _BIG)
    order = xp.argsort(key, axis=1).astype(xp.int32)
    j2 = xp.arange(c2, dtype=xp.int32)[None, :]
    take = xp.minimum(j2, xp.maximum(counts2[:, None] - 1, 0))
    sup = xp.take_along_axis(order, take, axis=1)  # (T, C2)
    tent2 = xp.where(
        j2 < counts2[:, None], xp.take_along_axis(te_s, sup, axis=1), _BIG
    )
    fine_off = xp.arange(lps, dtype=xp.int32)[None, None, :]
    cand = (sup[:, :, None] * np.int32(lps) + fine_off).reshape(-1, cl)
    tent = xp.broadcast_to(tent2[:, :, None], tent2.shape + (lps,)).reshape(-1, cl)
    counts = counts2 * np.int32(lps)
    # Per-row verdicts at lin granularity, packed as bits 16..16+groups.
    if octants:
        hit8l, _ = frustum_hits_octants(
            xp, o, d, rg, cset.lbb_min, cset.lbb_max, t_cap, live=live
        )  # (T8, CL)
    else:
        hit8l, _ = frustum_hits(
            xp, o_lo, o_hi, d_lo, d_hi, cset.lbb_min, cset.lbb_max, t_cap
        )  # (T8, CL)
    hit8l = hit8l.reshape(t, groups, cl)
    bits = xp.take_along_axis(
        hit8l, xp.broadcast_to(cand[:, None, :], (t, groups, cl)), axis=2
    ).astype(xp.int32)  # (T, groups, CL)
    mask = xp.sum(
        bits << xp.arange(groups, dtype=xp.int32)[None, :, None], axis=1,
        dtype=xp.int32,
    )
    return cand | (mask << 16), counts, tent


def row_hit_words(
    xp, o: Vec3, d: Vec3, cset: ClusterSet, tile: int, groups: int,
    t_cap=None, octants: bool = True, live=None,
):
    """(T, W) int32 packed per-row lin-cluster verdicts for the masked
    row-sweep kernel: cluster ``c`` row ``g`` lives in word ``c // 2`` at
    bit ``(c % 2) * 8 + g`` (two clusters per word keeps the sign bit
    clear — SMEM int32 is sign-safe). ``octants``: sign-pure sub-frustum
    verdicts (see ``frustum_hits_octants``)."""
    rg = tile // groups
    cl = cset.lin.shape[0]
    if octants:
        hit8, _ = frustum_hits_octants(
            xp, o, d, rg, cset.lbb_min, cset.lbb_max, t_cap, live=live
        )  # (T8, CL)
    else:
        o_lo, o_hi, d_lo, d_hi = _row_minmax_v(xp, o, d, rg)
        hit8, _ = frustum_hits(
            xp, o_lo, o_hi, d_lo, d_hi, cset.lbb_min, cset.lbb_max, t_cap
        )  # (T8, CL)
    t = hit8.shape[0] // groups
    bits = hit8.reshape(t, groups, cl).astype(xp.int32)
    bits = bits << xp.arange(groups, dtype=xp.int32)[None, :, None]
    per_c = xp.sum(bits, axis=1, dtype=xp.int32)  # (T, CL) 8-bit masks
    if cl % 2:
        per_c = xp.concatenate(
            [per_c, xp.zeros((t, 1), dtype=xp.int32)], axis=1
        )
    w = per_c.shape[1] // 2
    pc = per_c.reshape(t, w, 2)
    return pc[:, :, 0] | (pc[:, :, 1] << 8)


def fine_hit_mask(
    xp, o: Vec3, d: Vec3, cset: ClusterSet, tile: int, t_cap=None,
    octants: bool = True, live=None,
):
    """(T, C) fine-cluster frustum verdicts (no ordering, no lists) — the
    gated-brute kernel's input: it visits clusters in static ascending
    order gated by these bits, so small scenes skip candidate
    selection/sorting entirely. ``octants`` (default): sign-pure
    sub-frustum verdicts (``frustum_hits_octants``) — the difference
    between gating bounce tiles and not."""
    if octants:
        hit, _ = frustum_hits_octants(
            xp, o, d, tile, cset.bb_min, cset.bb_max, t_cap, live=live
        )
        return hit
    ox = _tile_minmax(xp, o.x, tile)
    oy = _tile_minmax(xp, o.y, tile)
    oz = _tile_minmax(xp, o.z, tile)
    dx = _tile_minmax(xp, d.x, tile)
    dy = _tile_minmax(xp, d.y, tile)
    dz = _tile_minmax(xp, d.z, tile)
    hit, _ = frustum_hits(
        xp,
        Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1]),
        Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1]),
        cset.bb_min, cset.bb_max, t_cap,
    )
    return hit
