"""Cull-and-sweep intersector correctness (interpret mode on CPU).

The cull stage (ops/cull.py) must be CONSERVATIVE: a tile's candidate list
may carry extra clusters but never miss one any of its rays truly hits,
and each slot's entry bound must lower-bound every true hit distance in
that cluster (the sweep's early-out soundness). The sweep
(ops/pallas_cull.py) must then match the brute-force oracle exactly —
same faces, memory-order first-face-wins — regardless of candidate order,
round splitting, or liveness masking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbr_tpu.accel.clusters import build_clusters
from pbr_tpu.ops.cull import CAND_MISS, candidates, coherence_keys
from pbr_tpu.ops.pallas_cull import intersect_cull
from pbr_tpu.ops.traverse import intersect_brute
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import random_soup


def _scene(n=400, seed=0, csize=64):
    scene, _ = scene_from_text(random_soup(n, seed=seed), use_bvh=True)
    cset = build_clusters(scene.tris, size=csize)
    return scene, cset


def _rays(n, seed=1, adversarial=True):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-2.5, 2.5, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    if adversarial:
        # Axis-aligned directions and zero components hit the slab-test
        # edge cases (division by zero, origin on plane).
        k = n // 8
        d[:k, :2] = 0.0
        d[k : 2 * k, 2] = 0.0
        o[2 * k : 3 * k, 0] = 0.0
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    return o, d


def _sorted_vec(o, d, cset, tile):
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    keys = coherence_keys(np, ov, dv, cset.scene_min, cset.scene_max)
    perm = np.argsort(keys, kind="stable")
    return o[perm], d[perm]


def test_candidates_conservative_and_entry_sound():
    scene, cset = _scene(400, csize=64)
    tile = 64
    o, d = _rays(512, seed=3)
    o, d = _sorted_vec(o, d, cset, tile)
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    cand, counts, tent = candidates(np, ov, dv, cset, tile)

    # Per-ray truth: all hit faces (not just nearest) via every-face MT.
    from pbr_tpu.ops.intersect import moller_trumbore

    ob = Vec3(o[:, 0:1], o[:, 1:2], o[:, 2:3])
    db = Vec3(d[:, 0:1], d[:, 1:2], d[:, 2:3])
    tr = scene.tris
    v0 = Vec3(tr.v0.x[None, :], tr.v0.y[None, :], tr.v0.z[None, :])
    e1 = Vec3(tr.e1.x[None, :], tr.e1.y[None, :], tr.e1.z[None, :])
    e2 = Vec3(tr.e2.x[None, :], tr.e2.y[None, :], tr.e2.z[None, :])
    with np.errstate(all="ignore"):
        t_all, valid = moller_trumbore(np, ob, db, v0, e1, e2)  # (N, F)
    t_all = np.where(valid, t_all, np.inf)

    size = cset.size
    for t in range(o.shape[0] // tile):
        rows = slice(t * tile, (t + 1) * tile)
        tt = t_all[rows]  # (tile, F)
        hit_faces = np.where(np.isfinite(tt).any(axis=0))[0]
        hit_clusters = np.unique(hit_faces // size)
        # Entries carry a miss bit for fine clusters the tile's frustum
        # rejects (ops/cull.py CAND_MISS); truly-hit clusters must be
        # listed UNMASKED.
        entries = cand[t, : counts[t]].tolist()
        listed = {e for e in entries if e < int(CAND_MISS)}
        for cl in hit_clusters:
            assert cl in listed, f"tile {t}: cluster {cl} missed by cull"
            slot = entries.index(cl)
            t_min_cl = tt[:, cl * size : (cl + 1) * size].min()
            assert tent[t, slot] <= t_min_cl + 1e-4, (
                f"tile {t} cluster {cl}: entry bound {tent[t, slot]} above "
                f"true nearest {t_min_cl}"
            )


def test_candidates_jax_matches_numpy():
    _, cset = _scene(300, csize=64)
    tile = 64
    o, d = _rays(256, seed=5)
    o, d = _sorted_vec(o, d, cset, tile)
    ov_np = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv_np = Vec3(d[:, 0], d[:, 1], d[:, 2])
    c_np, n_np, t_np = candidates(np, ov_np, dv_np, cset, tile)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov_j = Vec3(*(jnp.asarray(a) for a in ov_np))
    dv_j = Vec3(*(jnp.asarray(a) for a in dv_np))
    c_j, n_j, t_j = candidates(jnp, ov_j, dv_j, jset, tile)
    np.testing.assert_array_equal(np.asarray(n_j), n_np)
    # Entry-distance ties can order differently across argsort backends;
    # compare as sets per tile plus counts.
    for t in range(c_np.shape[0]):
        assert set(np.asarray(c_j)[t, : n_np[t]]) == set(c_np[t, : n_np[t]])
    np.testing.assert_allclose(np.asarray(t_j), t_np, rtol=1e-6, atol=1e-6)


def _cull_vs_brute(n_faces, n_rays, csize, tile, slots, seed=7, sort=False, precision="highest"):
    scene, cset = _scene(n_faces, seed=seed, csize=csize)
    o, d = _rays(n_rays, seed=seed + 1)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    t_c, f_c = intersect_cull(
        jnp, ov, dv, jset, tile=tile, slots=slots, sort=sort,
        precision=precision, interpret=True,
    )
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_b))
    hit = np.asarray(f_b) >= 0
    # Face identity is the contract (intersect_scene re-evaluates t exactly
    # from the winner); the kernel's own t is only the search/early-out key,
    # so the bf16x3 variant gets a looser t gate (grazing-hit cancellation).
    rtol = 5e-3 if precision == "tri" else 1e-4
    np.testing.assert_allclose(
        np.asarray(t_c)[hit], np.asarray(t_b)[hit], rtol=rtol, atol=1e-5
    )


def test_cull_matches_brute():
    _cull_vs_brute(400, 512, csize=64, tile=64, slots=128)


def test_cull_matches_brute_sorted():
    _cull_vs_brute(400, 512, csize=64, tile=64, slots=128, sort=True)


def test_cull_matches_brute_multi_round():
    # C > MASKED_MAX_CLUSTERS forces the slotted kernel, and slots < C
    # forces its round loop.
    _cull_vs_brute(2000, 256, csize=32, tile=64, slots=16)


def test_cull_masked_vs_slotted_same_results():
    # The masked sweep (small C) and the slotted kernel must agree exactly;
    # force the slotted path by shrinking slots on a small-C scene via the
    # internal builder threshold (chunk through both by face count).
    scene, cset = _scene(400, seed=3, csize=64)
    o, d = _rays(384, seed=21)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    import pbr_tpu.ops.pallas_cull as pc

    _, f_masked = intersect_cull(jnp, ov, dv, jset, tile=64, interpret=True)
    old = pc.MASKED_MAX_CLUSTERS
    try:
        pc.MASKED_MAX_CLUSTERS = 0  # force slotted
        _, f_slotted = intersect_cull(jnp, ov, dv, jset, tile=64, interpret=True)
    finally:
        pc.MASKED_MAX_CLUSTERS = old
    np.testing.assert_array_equal(np.asarray(f_masked), np.asarray(f_slotted))


def test_cull_odd_batch_padding():
    _cull_vs_brute(200, 333, csize=64, tile=64, slots=8)


def test_cull_chunked_matches_unchunked():
    # chunk_rays below the batch size forces the lax.map chunk loop.
    scene, cset = _scene(300, seed=6, csize=64)
    o, d = _rays(640, seed=13)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    t1, f1 = intersect_cull(
        jnp, ov, dv, jset, tile=64, slots=8, chunk_rays=128, interpret=True
    )
    t2, f2 = intersect_cull(
        jnp, ov, dv, jset, tile=64, slots=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_cull_alive_mask():
    scene, cset = _scene(300, seed=2, csize=64)
    o, d = _rays(256, seed=9)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    alive = jnp.asarray((np.arange(256) % 3) != 0)
    t_c, f_c = intersect_cull(
        jnp, ov, dv, jset, alive=alive, tile=64, slots=128, interpret=True
    )
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    _, f_b = intersect_brute(jnp, ov, dv, jtris)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(f_c)[a], np.asarray(f_b)[a])
    assert np.all(np.asarray(f_c)[~a] == -1)


def test_cull_nee_occlusion_matches_separate():
    scene, cset = _scene(400, seed=4, csize=64)
    o, d = _rays(384, seed=11)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    lp = Vec3(
        jnp.float32(0.0), jnp.float32(2.4), jnp.float32(0.0)
    )
    t_c, f_c, occ = intersect_cull(
        jnp, ov, dv, jset, light_pos=lp, tile=64, slots=64, interpret=True
    )
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_b))
    # Reference occlusion: guarded hit-point/shadow math + brute any-hit.
    t_b = np.asarray(t_b)
    f_bn = np.asarray(f_b)
    hit = f_bn >= 0
    ts = np.where(hit, t_b, 1.0)
    on = np.stack([o[:, i] + d[:, i] * ts for i in range(3)], 1)
    lv = np.array([0.0, 2.4, 0.0]) - on
    t_light = np.linalg.norm(lv, axis=1)
    sd = lv / np.maximum(t_light, 1e-12)[:, None]
    ovs = Vec3(*(jnp.asarray(on[:, i].astype(np.float32)) for i in range(3)))
    dvs = Vec3(*(jnp.asarray(sd[:, i].astype(np.float32)) for i in range(3)))
    t_s, _ = intersect_brute(jnp, ovs, dvs, jtris)
    occ_ref = np.asarray(t_s) < t_light.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(occ)[hit], occ_ref[hit])


def test_cull_integrator_end_to_end_matches_bvh():
    """Full integrator frame with intersector='cull' (fused NEE occlusion,
    alive masking, dead-lane handling across bounces) vs the XLA walk."""
    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.scene.build import bvh_max_leaf
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.utils.config import RenderSettings

    mtl = (
        "newmtl grey\nKd 0.62 0.62 0.62\nKs 1.0 1.0 1.0\nrough 1.0\np 1.0\n"
        "nu 0\nnv 0\nRs 0.05\nRd 0.95\n"
    )
    li = "newlight orb\ntype 2\nrgb 1.6 1.5 1.4\npos 0.0 2.4 0.0\nradius 0.09\n"
    obj = random_soup(400, seed=11).replace("o soup\n", "o soup\nusemtl grey\n", 1)
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
    assert scene.clusters is not None
    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    base = dict(
        width=32, height=32, samples=1, max_depth=3, max_added_depth=2,
        shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
        bounce_loop="scan",
    )
    js = jax.tree_util.tree_map(jnp.asarray, scene)
    jc = jax.tree_util.tree_map(jnp.asarray, cam)
    ids = jnp.arange(32 * 32, dtype=jnp.int32)
    ml = bvh_max_leaf(scene)
    r_cull = jax.jit(
        lambda: trace_rays(
            jnp, js, jc, RenderSettings(**base, intersector="cull"), ids,
            jnp.uint32(4), max_leaf=ml,
        )
    )()
    r_bvh = jax.jit(
        lambda: trace_rays(
            jnp, js, jc, RenderSettings(**base, intersector="bvh"), ids,
            jnp.uint32(4), max_leaf=ml,
        )
    )()
    d = np.abs(np.asarray(r_cull.color.x) - np.asarray(r_bvh.color.x))
    assert (d > 1e-4).mean() < 0.01  # ULP-flip budget (chaotic decisions)
    assert np.median(d) == 0.0


def test_cull_tri_precision_matches_brute():
    # bf16x3 hand-rolled matmul (~f32 accuracy) must keep face parity.
    _cull_vs_brute(400, 512, csize=64, tile=64, slots=128, precision="tri")


def test_octant_verdicts_conservative_and_tighter():
    """frustum_hits_octants must never miss a cluster any group ray truly
    slab-hits, and must be at least as tight as the sign-mixed interval
    frustum (it is a refinement: every octant sub-frustum is contained in
    the group frustum)."""
    from pbr_tpu.ops.cull import _tile_minmax, frustum_hits, frustum_hits_octants
    from pbr_tpu.ops.intersect import slab_box

    scene, cset = _scene(n=700, seed=3)
    o, d = _rays(2048, seed=9)
    # Make half the batch bounce-like: 32-ray groups with TIGHT origins
    # (a surface patch) and hemisphere-scattered directions — the
    # population where sign-pure sub-frustums actually bite (a wide
    # origin box containing the scene hits everything in any frame).
    rs = np.random.RandomState(17)
    g = 32
    half = o.shape[0] // 2
    centers = rs.uniform(-1.2, 1.2, size=(half // g, 3)).astype(np.float32)
    o[:half] = (
        np.repeat(centers, g, axis=0)
        + rs.uniform(-0.02, 0.02, size=(half, 3)).astype(np.float32)
    )
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    hit_o, te_o = frustum_hits_octants(
        np, ov, dv, g, cset.bb_min, cset.bb_max
    )
    mm = lambda a: _tile_minmax(np, a, g)  # noqa: E731
    ox, oy, oz = mm(o[:, 0]), mm(o[:, 1]), mm(o[:, 2])
    dx, dy, dz = mm(d[:, 0]), mm(d[:, 1]), mm(d[:, 2])
    hit_m, _ = frustum_hits(
        np,
        Vec3(ox[0], oy[0], oz[0]), Vec3(ox[1], oy[1], oz[1]),
        Vec3(dx[0], dy[0], dz[0]), Vec3(dx[1], dy[1], dz[1]),
        cset.bb_min, cset.bb_max,
    )
    # Refinement: octant verdicts are a subset of the mixed-frustum ones.
    assert not (hit_o & ~hit_m).any()
    # ...and a strict improvement somewhere on this adversarial mix.
    assert (hit_m & ~hit_o).sum() > 0

    # Conservativeness + entry-bound soundness vs per-ray ground truth.
    c = cset.bb_min.x.shape[0]
    with np.errstate(all="ignore"):
        inv = Vec3(1.0 / dv.x, 1.0 / dv.y, 1.0 / dv.z)
        for ci in range(c):
            if cset.bb_min.x[ci] > cset.bb_max.x[ci]:
                # Padding cluster (inverted AABB, zero faces): the scalar
                # slab oracle with a d==0 axis yields a spurious
                # (-inf, inf) interval there; production gates these with
                # the explicit nonempty check.
                continue
            bmn = Vec3(
                np.full_like(ov.x, cset.bb_min.x[ci]),
                np.full_like(ov.x, cset.bb_min.y[ci]),
                np.full_like(ov.x, cset.bb_min.z[ci]),
            )
            bmx = Vec3(
                np.full_like(ov.x, cset.bb_max.x[ci]),
                np.full_like(ov.x, cset.bb_max.y[ci]),
                np.full_like(ov.x, cset.bb_max.z[ci]),
            )
            t_near, t_far, hb = slab_box(np, ov, inv, bmn, bmx)
            ray_hits = hb & (t_far > 0)
            grp_hit = ray_hits.reshape(-1, g).any(axis=1)
            miss = grp_hit & ~hit_o[:, ci]
            assert not miss.any(), f"cluster {ci}: octant verdict missed a true hit"
            # Entry bound lower-bounds every true forward hit distance.
            tn = np.where(ray_hits, np.maximum(t_near, 0.0), np.inf).reshape(
                -1, g
            ).min(axis=1)
            ok = ~grp_hit | (te_o[:, ci] <= tn + 1e-4)
            assert ok.all(), f"cluster {ci}: entry bound not sound"
