"""Scene intersection: brute-force sweep and stackless BVH traversal.

The reference's per-ray stackless BVH walk (pt_bvh.cl:82-123) becomes a
*vectorized* walk here: every ray in the batch carries its own node index;
each step gathers one node per ray, does the slab test, and selects the next
index ("hit ⇒ index+1, miss ⇒ escape") — the exact encoding the reference
linearized on the host (BVH.cpp:671-729). The loop runs until every ray has
walked off the end of the node array.

Two intersectors with one contract — ``(t, face_idx)`` nearest hit:

- ``intersect_brute``: tests *all* triangles. No gathers, no divergence —
  pure fused VPU math. On TPU this wins for small scenes (a Cornell box is
  ~32 triangles) because control flow costs more than brute FLOPs.
- ``intersect_bvh``: the vectorized stackless walk, for large scenes.

Both use identical Möller-Trumbore math and first-wins tie-breaking, so they
are interchangeable (tested against each other), mirroring how the reference
could swap acceleration structures (ACCEL_STRUCT, Cfg ``accel_struct``).
"""

from __future__ import annotations

import os

import numpy as np

from pbr_tpu.ops.intersect import INF, gather_vec3, moller_trumbore, slab_box
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import LinearBVH, TrianglesSoA
from pbr_tpu.utils.config import EPSILON5


def _is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def intersect_brute(xp, o: Vec3, d: Vec3, tris: TrianglesSoA):
    """Nearest-hit over all triangles.

    Rays are (B,); triangles (F,). Returns ``(t, face)`` with t = +inf and
    face = -1 on miss. First face in memory order wins ties (strict-<
    update, matching the reference's intersectFace update rule,
    pt_bvh.cl:17-21).
    """
    if _is_jax(xp):
        import jax

        nf = int(tris.mtl.shape[0])
        # full_like keeps shard_map varying-axes metadata attached to o.x
        # (a plain xp.full constant would mismatch the loop carry's vma).
        t0 = xp.full_like(o.x, INF)
        f0 = xp.full_like(o.x, -1, dtype=xp.int32)

        def body(f, state):
            t_best, face_best = state
            v0 = gather_vec3(tris.v0, f)
            e1 = gather_vec3(tris.e1, f)
            e2 = gather_vec3(tris.e2, f)
            t, valid = moller_trumbore(xp, o, d, v0, e1, e2)
            better = valid & (t < t_best)
            return (
                xp.where(better, t, t_best),
                xp.where(better, f.astype(xp.int32), face_best),
            )

        return jax.lax.fori_loop(0, nf, body, (t0, f0))

    # NumPy: broadcast (B, F) and reduce. Identical math and tie-breaking
    # (argmin picks the first minimal face).
    with np.errstate(all="ignore"):
        ob = Vec3(o.x[..., None], o.y[..., None], o.z[..., None])
        db = Vec3(d.x[..., None], d.y[..., None], d.z[..., None])
        v0 = Vec3(tris.v0.x[None, :], tris.v0.y[None, :], tris.v0.z[None, :])
        e1 = Vec3(tris.e1.x[None, :], tris.e1.y[None, :], tris.e1.z[None, :])
        e2 = Vec3(tris.e2.x[None, :], tris.e2.y[None, :], tris.e2.z[None, :])
        t, valid = moller_trumbore(np, ob, db, v0, e1, e2)
        t = np.where(valid, t, INF).astype(np.float32)
        face = np.argmin(t, axis=-1).astype(np.int32)
        t_best = np.take_along_axis(t, face[..., None].astype(np.int64), axis=-1)[..., 0]
        face = np.where(np.isfinite(t_best), face, np.int32(-1))
        return t_best, face


def _bvh_step(xp, o, d, inv_d, bvh: LinearBVH, tris: TrianglesSoA, max_leaf, state):
    """One synchronized traversal step for the whole ray batch.

    Matches the reference loop body (pt_bvh.cl:88-122): box test with the
    gates ``t_far > EPSILON5`` and ``t_best > t_near``; on hit of a leaf,
    test its faces; next index = hit ? i+1 : exit[i].
    """
    idx, t_best, face_best, tests, visits = state
    n = bvh.count
    walking = idx < n
    safe = xp.minimum(idx, n - 1)

    bb_min = gather_vec3(bvh.bb_min, safe)
    bb_max = gather_vec3(bvh.bb_max, safe)
    leaf_first = bvh.leaf_first[safe]
    leaf_count = bvh.leaf_count[safe]
    exit_i = bvh.exit[safe]

    t_near, t_far, hit_box = slab_box(xp, o, inv_d, bb_min, bb_max)
    hit_box = hit_box & (t_far > np.float32(EPSILON5)) & (t_best > t_near)

    is_leaf = leaf_first >= 0
    do_leaf = hit_box & is_leaf
    nf = int(tris.mtl.shape[0])
    for k in range(max_leaf):
        fidx = xp.minimum(leaf_first + k, nf - 1)
        v0 = gather_vec3(tris.v0, fidx)
        e1 = gather_vec3(tris.e1, fidx)
        e2 = gather_vec3(tris.e2, fidx)
        t, valid = moller_trumbore(xp, o, d, v0, e1, e2)
        better = do_leaf & (k < leaf_count) & valid & (t < t_best)
        t_best = xp.where(better, t, t_best)
        face_best = xp.where(better, fidx.astype(xp.int32), face_best)

    visits = visits + walking.astype(xp.int32)
    tests = tests + xp.where(
        walking & do_leaf, xp.minimum(leaf_count, max_leaf), np.int32(0)
    )
    nxt = xp.where(hit_box, safe + 1, exit_i)
    idx = xp.where(idx >= n, n, nxt).astype(xp.int32)
    return idx, t_best, face_best, tests, visits


def _part1by2(xp, x):
    """Spread 10 bits over 30 (Morton interleave helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _coherence_keys(xp, o: Vec3, d: Vec3, bvh: LinearBVH):
    """Sort key grouping rays that will traverse similar subtrees:
    direction octant (3 bits) then a Morton code of the origin quantized
    into the root AABB. Traversal results are per-ray and order-invariant,
    so sorting is exact — it only shortens each chunk's divergence."""
    root_min = Vec3(bvh.bb_min.x[0], bvh.bb_min.y[0], bvh.bb_min.z[0])
    root_max = Vec3(bvh.bb_max.x[0], bvh.bb_max.y[0], bvh.bb_max.z[0])
    inv_ext = Vec3(
        1.0 / xp.maximum(root_max.x - root_min.x, 1e-9),
        1.0 / xp.maximum(root_max.y - root_min.y, 1e-9),
        1.0 / xp.maximum(root_max.z - root_min.z, 1e-9),
    )

    def q(c, mn, inv):
        return xp.clip(((c - mn) * inv * 1023.0), 0.0, 1023.0).astype(xp.int32)

    morton = (
        _part1by2(xp, q(o.x, root_min.x, inv_ext.x))
        | (_part1by2(xp, q(o.y, root_min.y, inv_ext.y)) << 1)
        | (_part1by2(xp, q(o.z, root_min.z, inv_ext.z)) << 2)
    )
    octant = (
        (d.x < 0).astype(xp.int32)
        + 2 * (d.y < 0).astype(xp.int32)
        + 4 * (d.z < 0).astype(xp.int32)
    )
    # octant dominates; then locality within the octant (top Morton bits).
    return (octant << 27) | (morton >> 3)


def intersect_bvh_chunked(
    xp, o: Vec3, d: Vec3, bvh: LinearBVH, tris: TrianglesSoA,
    max_leaf: int = 2, chunk: int = 8192, with_counts: bool = False,
):
    """Coherence-sorted, chunked BVH traversal (jax only).

    The vectorized walk is lockstep: the whole batch pays the *longest*
    ray's node count. Sorting by octant+Morton and mapping the walk over
    chunks bounds the lockstep to each (coherent) chunk. Results are
    bitwise identical to the unchunked walk (pure per-ray computation,
    exact permutation)."""
    import jax
    import jax.numpy as jnp

    shape = o.x.shape
    flat = int(np.prod(shape)) if shape else 1
    ox, oy, oz = o.x.reshape(-1), o.y.reshape(-1), o.z.reshape(-1)
    dx, dy, dz = d.x.reshape(-1), d.y.reshape(-1), d.z.reshape(-1)
    pad = (-flat) % chunk
    if pad:
        far = jnp.full((pad,), 1.0e30, dtype=jnp.float32)
        one = jnp.ones((pad,), dtype=jnp.float32)
        ox, oy, oz = (jnp.concatenate([a, far]) for a in (ox, oy, oz))
        dx, dy, dz = (jnp.concatenate([a, one]) for a in (dx, dy, dz))
    of = Vec3(ox, oy, oz)
    df = Vec3(dx, dy, dz)

    keys = _coherence_keys(jnp, of, df, bvh)
    perm = jnp.argsort(keys)
    take = lambda a: a[perm].reshape(-1, chunk)  # noqa: E731

    def chunk_fn(args):
        cox, coy, coz, cdx, cdy, cdz = args
        return intersect_bvh(
            jnp, Vec3(cox, coy, coz), Vec3(cdx, cdy, cdz), bvh, tris,
            max_leaf=max_leaf, with_counts=with_counts,
        )

    outs = jax.lax.map(
        chunk_fn, (take(of.x), take(of.y), take(of.z), take(df.x), take(df.y), take(df.z))
    )
    inv_perm = jnp.argsort(perm)

    def unsort(a):
        return a.reshape(-1)[inv_perm][:flat].reshape(shape)

    if with_counts:
        t_s, f_s, tests, visits = outs
        return unsort(t_s), unsort(f_s), unsort(tests), unsort(visits)
    t_s, f_s = outs
    return unsort(t_s), unsort(f_s)


def intersect_bvh(xp, o: Vec3, d: Vec3, bvh: LinearBVH, tris: TrianglesSoA,
                  max_leaf: int = 2, with_counts: bool = False):
    """Nearest-hit via the stackless linear BVH. Same contract as
    ``intersect_brute``. ``max_leaf`` must be a static bound ≥ the builder's
    ``max_faces`` (the reference's compile-time 2-face leaf assumption,
    pt_bvh.cl:35-46, generalized).

    ``with_counts``: additionally return exact per-ray ``(tests, visits)``
    int32 counters — ray-face intersection tests and BVH nodes visited,
    the reference's two per-ray debug counters (pt_bvh.cl:23 increments
    per leaf-face test, :89 per node step)."""
    n = bvh.count
    inv_d = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    idx0 = xp.full_like(o.x, 0, dtype=xp.int32)
    t0 = xp.full_like(o.x, INF)
    f0 = xp.full_like(o.x, -1, dtype=xp.int32)
    c0 = xp.zeros_like(idx0)
    v0_cnt = xp.zeros_like(idx0)

    if _is_jax(xp):
        import jax

        # Pack node and triangle records so each traversal step issues two
        # coherent row-gathers instead of ~15 scalar-array gathers — the
        # per-step cost is gather-bound, and XLA turns an (N, 8)-row gather
        # into one contiguous 32-byte load per ray. Packing is traced once
        # per jit and hoisted out of the frame/scan loops.
        nodes = xp.concatenate(
            [
                xp.stack(
                    [bvh.bb_min.x, bvh.bb_min.y, bvh.bb_min.z,
                     bvh.bb_max.x, bvh.bb_max.y, bvh.bb_max.z],
                    axis=1,
                ),
                xp.stack(
                    [
                        bvh.leaf_first.astype(xp.float32),
                        bvh.leaf_count.astype(xp.float32),
                        bvh.exit.astype(xp.float32),
                    ],
                    axis=1,
                ),
            ],
            axis=1,
        )  # (N, 9): bbmin, bbmax, leaf_first, leaf_count, exit (as f32)
        trisrow = xp.stack(
            [
                tris.v0.x, tris.v0.y, tris.v0.z,
                tris.e1.x, tris.e1.y, tris.e1.z,
                tris.e2.x, tris.e2.y, tris.e2.z,
            ],
            axis=1,
        )  # (F, 9)
        nf = int(tris.mtl.shape[0])

        def body(state):
            idx, t_best, face_best, tests, visits = state
            walking = idx < n
            safe = xp.minimum(idx, n - 1)
            rec = nodes[safe]  # (B, 9) one coherent gather
            bb_min = Vec3(rec[..., 0], rec[..., 1], rec[..., 2])
            bb_max = Vec3(rec[..., 3], rec[..., 4], rec[..., 5])
            leaf_first = rec[..., 6].astype(xp.int32)
            leaf_count = rec[..., 7].astype(xp.int32)
            exit_i = rec[..., 8].astype(xp.int32)

            t_near, t_far, hit_box = slab_box(xp, o, inv_d, bb_min, bb_max)
            hit_box = hit_box & (t_far > np.float32(EPSILON5)) & (t_best > t_near)

            do_leaf = hit_box & (leaf_first >= 0)
            for k in range(max_leaf):
                fidx = xp.clip(leaf_first + k, 0, nf - 1)
                tri = trisrow[fidx]  # (B, 9) one coherent gather
                v0 = Vec3(tri[..., 0], tri[..., 1], tri[..., 2])
                e1 = Vec3(tri[..., 3], tri[..., 4], tri[..., 5])
                e2 = Vec3(tri[..., 6], tri[..., 7], tri[..., 8])
                t, valid = moller_trumbore(xp, o, d, v0, e1, e2)
                better = do_leaf & (k < leaf_count) & valid & (t < t_best)
                t_best = xp.where(better, t, t_best)
                face_best = xp.where(better, fidx.astype(xp.int32), face_best)

            if with_counts:
                # Exact counters, gated on still-walking lanes (a finished
                # lane clamps to node n-1 and must not keep counting while
                # others walk): a node visit per step (pt_bvh.cl:89), a
                # test per REAL leaf face (the walk executes max_leaf
                # lockstep MT evals, but only leaf_count are demanded —
                # pt_bvh.cl:23 semantics).
                visits = visits + walking.astype(xp.int32)
                tests = tests + xp.where(
                    walking & do_leaf,
                    xp.minimum(leaf_count, max_leaf),
                    np.int32(0),
                )

            nxt = xp.where(hit_box, safe + 1, exit_i)
            idx = xp.where(idx >= n, n, nxt).astype(xp.int32)
            return idx, t_best, face_best, tests, visits

        def cond(state):
            return xp.any(state[0] < n)

        idx, t_best, face_best, tests, visits = jax.lax.while_loop(
            cond, body, (idx0, t0, f0, c0, v0_cnt)
        )
        if with_counts:
            return t_best, face_best, tests, visits
        return t_best, face_best

    state = (idx0, t0, f0, c0, v0_cnt)
    with np.errstate(all="ignore"):
        while np.any(state[0] < n):
            state = _bvh_step(np, o, d, inv_d, bvh, tris, max_leaf, state)
    if with_counts:
        return state[1], state[2], state[3], state[4]
    return state[1], state[2]


def _stop_grad3(xp, v: Vec3) -> Vec3:
    if _is_jax(xp):
        import jax

        return Vec3(
            jax.lax.stop_gradient(v.x),
            jax.lax.stop_gradient(v.y),
            jax.lax.stop_gradient(v.z),
        )
    return v


def intersect_scene(
    xp, o: Vec3, d: Vec3, scene, max_leaf: int = 2, mode: str = "auto",
    light_pos=None, alive=None, with_counts: bool = False,
):
    """Nearest-hit dispatch (the analog of the reference's ACCEL_STRUCT
    kernel specialization, pathtracing.cl:217-219).

    ``mode``: 'auto' (BVH if the scene has one, else brute), 'brute'
    (elementwise sweep), 'gemm' (MXU matmul formulation), 'pallas' (fused
    on-chip brute kernel, jax+TPU only), 'bvh' (chunked XLA gather walk),
    'pallas_bvh' (tile-uniform packet traversal kernel, jax+TPU only;
    tables must fit VMEM — ops/pallas_bvh.py).

    Differentiability contract (shared by every mode): the *search* for the
    nearest face runs detached — visibility is non-differentiable by
    convention (and the BVH while_loop has no reverse mode) — then the
    winning face's ``t`` is re-evaluated with one differentiable
    Möller-Trumbore, through which gradients w.r.t. ray origin/direction
    and geometry flow exactly. This also keeps the *backward* pass cheap:
    it never replays the all-faces competition, only the single re-eval.
    Both backends re-evaluate identically so numpy/jax parity holds.

    ``light_pos`` (scalar Vec3, light 0): request the NEE shadow any-hit
    fused into the same device pass. Returns ``(t, face, occluded)`` where
    ``occluded`` is None when the selected mode has no fused path (the
    caller falls back to a separate shadow intersect).

    ``alive``: optional per-ray liveness mask. The cull-and-sweep mode
    uses it to close dead lanes out of the sweep (they cost nothing and
    cannot block a tile's occlusion early-out); other modes ignore it.

    ``with_counts``: additionally return ``(tests, visits)`` as the LAST
    tuple element — per-ray int32 counters matching the reference's two
    debug channels (pt_bvh.cl:23 intersection tests, :89 node visits).
    ``tests`` is EXACT on every mode auto-dispatch selects: per-leaf
    demanded counts on the tree walks, full-sweep constants (F, or 2F
    with fused NEE) on the brute family, per-row executed counts on
    'sweep', per-tile executed real-face counts on 'gated'. ``visits``
    is exact on the tree walks and None on sweeps (no nodes exist to
    visit). ``tests`` is None only on the explicit-opt-in packet/forest
    kernels and 'cull' (tile-dynamic early-outs; use 'sweep'/'gated'
    for instrumented runs at those scales).
    """
    o_s = _stop_grad3(xp, o)
    d_s = _stop_grad3(xp, d)
    occ = None
    counts = None
    visits = None
    if mode == "auto":
        on_tpu = False
        if _is_jax(xp):
            import jax

            on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            # MEASURED policy — the committed evidence is the round-5
            # band table, docs/BENCH_EXTRA_r05.json (END-TO-END fwd+bwd
            # frames at 1024², auto AND per-mode, reference structured
            # scenes + soups; intersect-only rankings invert on full
            # frames, so e2e is the arbiter): brute's straight-line SMEM
            # sweep wins small scenes (Cornell-class); the gated-brute
            # (same engine with per-tile cluster skip bits and NO
            # unrolled-program compile ceiling, ops/pallas_gated.py)
            # serves the 1k-12k band; the slotted matmul cull wins above
            # the gated SMEM cap (near-to-far slot ordering + early-out
            # beat the row-sweep's finer verdicts at scale). The packet
            # BVH kernel and the forest never win anywhere (r2:
            # tile-uniform cursors serialize) and remain explicit modes
            # only. Per-band numbers live in the artifact, not here.
            from pbr_tpu.ops.pallas_gated import GATED_MAX_FACES
            from pbr_tpu.ops.pallas_intersect import BRUTE_SMEM_MAX_FACES

            nf = scene.tris.count
            if scene.clusters is not None and 1024 < nf <= GATED_MAX_FACES:
                mode = "gated"
            elif scene.clusters is not None and nf > GATED_MAX_FACES:
                mode = "cull"
            elif nf <= BRUTE_SMEM_MAX_FACES:
                mode = "pallas"
            elif scene.forest is not None:
                mode = "pallas_bvh_forest"
            else:
                # Last resort: the chunked XLA gather walk (slow but runs
                # everywhere).
                mode = "bvh"
        elif scene.bvh is not None:
            # CPU/tests: the XLA walk keeps numpy/jax parity.
            mode = "bvh"
        else:
            mode = "brute"
    if mode == "bvh":
        if _is_jax(xp) and o.x.size >= 16384:
            out = intersect_bvh_chunked(
                xp, o_s, d_s, scene.bvh, scene.tris, max_leaf=max_leaf,
                with_counts=with_counts,
            )
        else:
            out = intersect_bvh(xp, o_s, d_s, scene.bvh, scene.tris,
                                max_leaf=max_leaf, with_counts=with_counts)
        if with_counts:
            _, face, counts, visits = out
        else:
            _, face = out
    elif mode == "pallas_bvh":
        from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet

        if light_pos is not None:
            _, face, occ = intersect_bvh_packet(
                xp, o_s, d_s, scene.bvh, scene.tris, max_leaf=max_leaf,
                light_pos=light_pos,
            )
        else:
            _, face = intersect_bvh_packet(
                xp, o_s, d_s, scene.bvh, scene.tris, max_leaf=max_leaf
            )
    elif mode == "pallas_bvh_forest":
        from pbr_tpu.accel.forest import FOREST_MAX_LEAF
        from pbr_tpu.ops.pallas_bvh import intersect_bvh_forest

        if scene.forest is None:
            raise ValueError(
                "mode='pallas_bvh_forest' needs a scene with a BVH forest; "
                "this scene has none (forests are built only when the "
                "single-tree packet kernel cannot hold the scene — "
                "scene/build.py — or explicitly via accel.forest."
                "build_forest)."
            )

        if light_pos is not None:
            _, face, occ = intersect_bvh_forest(
                xp, o_s, d_s, scene.forest, scene.bvh,
                max_leaf=FOREST_MAX_LEAF, light_pos=light_pos,
            )
        else:
            _, face = intersect_bvh_forest(
                xp, o_s, d_s, scene.forest, scene.bvh,
                max_leaf=FOREST_MAX_LEAF,
            )
    elif mode == "sweep":
        from pbr_tpu.ops.pallas_sweep import intersect_sweep

        if scene.clusters is None or scene.clusters.lin is None:
            raise ValueError(
                "mode='sweep' needs a scene whose clusters carry row-sweep "
                "lin tables; rebuild via scene/build.py (build_scene "
                "attaches them) or accel.clusters.build_clusters."
            )
        interp = False
        if _is_jax(xp):
            import jax

            interp = jax.default_backend() != "tpu"
        out = intersect_sweep(
            xp, o_s, d_s, scene.clusters, light_pos=light_pos,
            alive=alive, interpret=interp, with_counts=with_counts,
        )
        if light_pos is not None:
            occ = out[2]
        if with_counts:
            counts = out[-1]
        face = out[1]
    elif mode == "gated":
        from pbr_tpu.ops.pallas_gated import intersect_gated

        if scene.clusters is None:
            raise ValueError(
                "mode='gated' needs a scene with clusters (the fine AABBs "
                "are the gate targets); rebuild via scene/build.py."
            )
        interp = False
        if _is_jax(xp):
            import jax

            interp = jax.default_backend() != "tpu"
        out = intersect_gated(
            xp, o_s, d_s, scene.tris, scene.clusters, light_pos=light_pos,
            alive=alive, interpret=interp, with_counts=with_counts,
        )
        if light_pos is not None:
            occ = out[2]
        if with_counts:
            counts = out[-1]
        face = out[1]
    elif mode == "cull":
        from pbr_tpu.ops.pallas_cull import intersect_cull

        if scene.clusters is None:
            raise ValueError(
                "mode='cull' needs a scene with clusters; rebuild via "
                "scene/build.py (build_scene attaches them) or "
                "accel.clusters.build_clusters."
            )
        interp = False
        if _is_jax(xp):
            import jax

            interp = jax.default_backend() != "tpu"
        if light_pos is not None:
            _, face, occ = intersect_cull(
                xp, o_s, d_s, scene.clusters, light_pos=light_pos,
                alive=alive, interpret=interp,
            )
        else:
            _, face = intersect_cull(
                xp, o_s, d_s, scene.clusters, alive=alive, interpret=interp
            )
    elif mode == "pallas_bvh_hbm":
        from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet_hbm

        if light_pos is not None:
            _, face, occ = intersect_bvh_packet_hbm(
                xp, o_s, d_s, scene.bvh, scene.tris, max_leaf=max_leaf,
                light_pos=light_pos,
            )
        else:
            _, face = intersect_bvh_packet_hbm(
                xp, o_s, d_s, scene.bvh, scene.tris, max_leaf=max_leaf
            )
    elif mode == "gemm":
        from pbr_tpu.ops.gemm_intersect import intersect_gemm

        _, face = intersect_gemm(xp, o_s, d_s, scene.tris)
    elif mode == "pallas":
        from pbr_tpu.ops.pallas_intersect import intersect_pallas

        if light_pos is not None:
            _, face, occ = intersect_pallas(
                xp, o_s, d_s, scene.tris, light_pos=light_pos
            )
        else:
            _, face = intersect_pallas(xp, o_s, d_s, scene.tris)
    else:
        _, face = intersect_brute(xp, o_s, d_s, scene.tris)

    # Differentiable re-evaluation of the winner. Geometry is detached
    # (gradient targets are materials/lights/camera — BASELINE.json; a
    # gather's transpose is a giant scatter-add, so detaching the triangle
    # arrays also keeps the backward pass cheap); o and d stay live, which
    # is where camera gradients flow.
    safe = xp.maximum(face, 0)
    tris_s = scene.tris
    if _is_jax(xp):
        import jax

        tris_s = jax.tree_util.tree_map(jax.lax.stop_gradient, tris_s)
    v0 = gather_vec3(tris_s.v0, safe)
    e1 = gather_vec3(tris_s.e1, safe)
    e2 = gather_vec3(tris_s.e2, safe)
    mt = moller_trumbore
    if _is_jax(xp) and os.environ.get("PBR_TPU_CKPT_REEVAL", "0") == "1":
        # Micro-scope remat of the re-eval: measured a LOSS (21.35 vs
        # 20.81 ms/frame, docs/PERF.md round 5) — the re-eval's 15 input
        # arrays cost more to keep live for recompute than the handful of
        # intermediates AD stores. Opt-in kept for reproduction; contrast
        # with the BRDF-eval/gather scopes where the same trick WINS.
        import jax

        mt = jax.checkpoint(moller_trumbore, static_argnums=(0,))
    t_re, _ = mt(xp, o, d, v0, e1, e2)
    t = xp.where(face >= 0, t_re, INF)
    if with_counts and counts is None and mode in ("brute", "pallas", "gemm"):
        # Full-sweep intersectors test every face; the fused NEE leg
        # sweeps them again for the shadow ray.
        nf = np.int32(scene.tris.count * (2 if occ is not None else 1))
        counts = xp.full_like(face, nf)
    out = [t, face]
    if light_pos is not None:
        out.append(occ)  # occ is None unless a fused mode produced it
    if with_counts:
        out.append((counts, visits))
    return tuple(out)
