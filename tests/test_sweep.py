"""Row-sweep intersector correctness (ops/pallas_sweep.py, interpret mode).

Same contract battery as test_cull.py, against the brute oracle: exact
face agreement with memory-order first-face-wins, through the masked and
slotted kernels, round splitting, chunking, liveness masks, and the fused
NEE occlusion pass. Plus the row-culling helpers' conservativeness.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pbr_tpu.accel.clusters import build_clusters
from pbr_tpu.ops.cull import candidates_rows, coherence_keys, row_hit_words
from pbr_tpu.ops.pallas_sweep import intersect_sweep
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
        k = n // 8
        d[:k, :2] = 0.0
        d[k : 2 * k, 2] = 0.0
        o[2 * k : 3 * k, 0] = 0.0
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    return o, d


def _vecs(o, d):
    return (
        Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
    )


def test_candidates_rows_conservative():
    """Every truly-hit lin cluster must be listed with its ray's row bit
    set (the row-culling analog of the tile-conservativeness law)."""
    scene, cset = _scene(700, seed=3, csize=64)
    tile, groups = 64, 8
    rg = tile // groups
    o, d = _rays(512, seed=3)
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    cand, counts, tent = candidates_rows(np, ov, dv, cset, tile, groups)

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

    s = cset.lin.shape[2]
    for t in range(o.shape[0] // tile):
        entries = cand[t, : counts[t]]
        cids = entries & 0xFFFF
        masks = entries >> 16
        for g in range(groups):
            rows = slice(t * tile + g * rg, t * tile + (g + 1) * rg)
            tt = t_all[rows]
            hit_faces = np.where(np.isfinite(tt).any(axis=0))[0]
            for cl in np.unique(hit_faces // s):
                idx = np.where(cids == cl)[0]
                assert idx.size, f"tile {t}: lin cluster {cl} unlisted"
                assert (masks[idx[0]] >> g) & 1, (
                    f"tile {t} row {g}: cluster {cl} row bit clear but hit"
                )
                # Entry bound soundness for this row's true hits.
                t_min = tt[:, cl * s : (cl + 1) * s].min()
                assert tent[t, idx[0]] <= t_min + 1e-4


def test_row_hit_words_conservative():
    scene, cset = _scene(500, seed=5, csize=64)
    tile, groups = 64, 8
    rg = tile // groups
    o, d = _rays(256, seed=7)
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    words = row_hit_words(np, ov, dv, cset, tile, groups)

    from pbr_tpu.ops.intersect import moller_trumbore

    ob = Vec3(o[:, 0:1], o[:, 1:2], o[:, 2:3])
    db = Vec3(d[:, 0:1], d[:, 1:2], d[:, 2:3])
    tr = scene.tris
    v0 = Vec3(tr.v0.x[None, :], tr.v0.y[None, :], tr.v0.z[None, :])
    e1 = Vec3(tr.e1.x[None, :], tr.e1.y[None, :], tr.e1.z[None, :])
    e2 = Vec3(tr.e2.x[None, :], tr.e2.y[None, :], tr.e2.z[None, :])
    with np.errstate(all="ignore"):
        t_all, valid = moller_trumbore(np, ob, db, v0, e1, e2)
    t_all = np.where(valid, t_all, np.inf)

    s = cset.lin.shape[2]
    for t in range(o.shape[0] // tile):
        for g in range(groups):
            rows = slice(t * tile + g * rg, t * tile + (g + 1) * rg)
            tt = t_all[rows]
            hit_faces = np.where(np.isfinite(tt).any(axis=0))[0]
            for cl in np.unique(hit_faces // s):
                w = words[t, cl // 2]
                bit = (w >> ((cl % 2) * 8 + g)) & 1
                assert bit, f"tile {t} row {g}: cluster {cl} bit clear"


def _sweep_vs_brute(n_faces, n_rays, csize, tile, slots, seed=7, sort=False,
                    force_slotted=False, chunk_rays=None):
    scene, cset = _scene(n_faces, seed=seed, csize=csize)
    o, d = _rays(n_rays, seed=seed + 1)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov, dv = _vecs(o, d)
    kw = {}
    if chunk_rays:
        kw["chunk_rays"] = chunk_rays
    import pbr_tpu.ops.pallas_sweep as ps

    old = ps.MASKED_MAX_LIN
    try:
        if force_slotted:
            ps.MASKED_MAX_LIN = 0
        t_c, f_c = intersect_sweep(
            jnp, ov, dv, jset, tile=tile, slots=slots, sort=sort,
            interpret=True, **kw,
        )
    finally:
        ps.MASKED_MAX_LIN = old
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_b))
    hit = np.asarray(f_b) >= 0
    np.testing.assert_allclose(
        np.asarray(t_c)[hit], np.asarray(t_b)[hit], rtol=1e-4, atol=1e-5
    )


def test_sweep_masked_matches_brute():
    _sweep_vs_brute(400, 512, csize=64, tile=64, slots=128)


def test_sweep_slotted_matches_brute():
    _sweep_vs_brute(400, 512, csize=64, tile=64, slots=128, force_slotted=True)


def test_sweep_slotted_sorted():
    _sweep_vs_brute(400, 512, csize=64, tile=64, slots=128, sort=True,
                    force_slotted=True)


def test_sweep_multi_round():
    # slots below the lin-cluster count forces the round loop.
    _sweep_vs_brute(2000, 256, csize=64, tile=64, slots=4, force_slotted=True)


def test_sweep_odd_batch_padding():
    _sweep_vs_brute(200, 333, csize=64, tile=64, slots=8, force_slotted=True)


def test_sweep_chunked_matches_unchunked():
    _sweep_vs_brute(300, 640, csize=64, tile=64, slots=8, force_slotted=True,
                    chunk_rays=128)


def test_sweep_alive_mask():
    scene, cset = _scene(300, seed=2, csize=64)
    o, d = _rays(256, seed=9)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov, dv = _vecs(o, d)
    alive = jnp.asarray((np.arange(256) % 3) != 0)
    t_c, f_c = intersect_sweep(
        jnp, ov, dv, jset, alive=alive, tile=64, interpret=True
    )
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    _, f_b = intersect_brute(jnp, ov, dv, jtris)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(f_c)[a], np.asarray(f_b)[a])
    assert np.all(np.asarray(f_c)[~a] == -1)


def test_sweep_nee_occlusion_matches_separate():
    """Fused NEE occlusion == explicitly tracing the derived shadow rays
    with the brute any-hit oracle."""
    scene, cset = _scene(400, seed=4, csize=64)
    o, d = _rays(384, seed=11)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov, dv = _vecs(o, d)
    lp = Vec3(jnp.float32(0.1), jnp.float32(2.0), jnp.float32(-0.2))
    t_c, f_c, occ = intersect_sweep(
        jnp, ov, dv, jset, light_pos=lp, tile=64, interpret=True
    )
    # Oracle occlusion from the brute nearest + any-hit re-derivation.
    from pbr_tpu.ops.intersect import INF, moller_trumbore

    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    t_b = np.asarray(t_b)
    f_b = np.asarray(f_b)
    np.testing.assert_array_equal(np.asarray(f_c), f_b)
    hit = (t_b < INF) & (t_b > 0.0)
    ts = np.where(hit, t_b, 1.0)
    hp = o + d * ts[:, None]
    lpn = np.array([0.1, 2.0, -0.2], dtype=np.float32)
    lv = lpn[None, :] - hp
    t_light = np.linalg.norm(lv, axis=1)
    sd = lv / np.maximum(t_light, 1e-12)[:, None]
    tr = scene.tris
    v0 = Vec3(tr.v0.x[None, :], tr.v0.y[None, :], tr.v0.z[None, :])
    e1 = Vec3(tr.e1.x[None, :], tr.e1.y[None, :], tr.e1.z[None, :])
    e2 = Vec3(tr.e2.x[None, :], tr.e2.y[None, :], tr.e2.z[None, :])
    ob = Vec3(hp[:, 0:1], hp[:, 1:2], hp[:, 2:3])
    db = Vec3(sd[:, 0:1], sd[:, 1:2], sd[:, 2:3])
    with np.errstate(all="ignore"):
        t_all, valid = moller_trumbore(np, ob, db, v0, e1, e2)
    occ_ref = np.where(
        hit, (valid & (t_all < t_light[:, None])).any(axis=1), True
    )
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_sweep_with_counts():
    """The per-ray test counter upper-bounds real work and is consistent
    between the masked and slotted paths' accounting."""
    scene, cset = _scene(400, seed=8, csize=64)
    o, d = _rays(256, seed=15)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    ov, dv = _vecs(o, d)
    t1, f1, n1 = intersect_sweep(
        jnp, ov, dv, jset, tile=64, interpret=True, with_counts=True
    )
    import pbr_tpu.ops.pallas_sweep as ps

    old = ps.MASKED_MAX_LIN
    try:
        ps.MASKED_MAX_LIN = 0
        t2, f2, n2 = intersect_sweep(
            jnp, ov, dv, jset, tile=64, interpret=True, with_counts=True
        )
    finally:
        ps.MASKED_MAX_LIN = old
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    n1 = np.asarray(n1)
    n2 = np.asarray(n2)
    s = cset.lin.shape[2]
    assert np.all(n1 % s == 0) and np.all(n2 % s == 0)
    # Slotted counts only live slots; masked counts every verdict bit —
    # both upper-bound the faces a hitting ray needed.
    hit = np.asarray(f1) >= 0
    assert np.all(n1[hit] >= s) and np.all(n2[hit] >= s)


def test_sweep_dispatch_through_intersect_scene():
    from pbr_tpu.ops.traverse import intersect_scene
    from pbr_tpu.scene.build import scene_from_text

    scene, _ = scene_from_text(random_soup(500, seed=6), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(256, seed=17)
    ov, dv = _vecs(o, d)
    t_s, f_s = intersect_scene(jnp, ov, dv, jscene, mode="sweep")
    t_b, f_b = intersect_scene(jnp, ov, dv, jscene, mode="brute")
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_b))
