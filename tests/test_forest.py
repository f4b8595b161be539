"""BVH-forest correctness (interpret mode on CPU).

The forest (accel/forest.py + ops/pallas_bvh.py::intersect_bvh_forest) is
the big-scene intersector: K VMEM-sized sub-BVHs over contiguous runs of
the main BVH's leaf order, each walked by the proven packet kernel, results
min-combined. Ground truth is the brute sweep — the forest is a pure search
acceleration, so nearest face/t must match exactly. Tests use a tiny chunk
size so interpret mode stays fast while every forest mechanism (chunk
padding, node padding, slot→main-order id mapping, cross-chunk min-combine,
fused NEE any-hit across chunks) is exercised.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pbr_tpu.accel.forest import build_forest
from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.pallas_bvh import intersect_bvh_forest
from pbr_tpu.ops.traverse import intersect_brute
from pbr_tpu.ops.vec import Vec3, safe_div, safe_sqrt
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import random_soup


def _rays(n, seed, lo=-1.2, hi=1.2):
    rng = np.random.default_rng(seed)
    o = Vec3(*[jnp.asarray(rng.uniform(lo, hi, n), jnp.float32) for _ in range(3)])
    dn = rng.normal(size=(3, n)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*[jnp.asarray(c) for c in dn])
    return o, d


def _soup_forest(n_tris=700, seed=0, chunk=256):
    """Soup scene with a small-chunk forest (3 sub-BVHs at 700/256, one
    partial chunk → exercises triangle-slot padding too)."""
    scene, _ = scene_from_text(random_soup(n_tris, seed=seed), use_bvh=True)
    forest = build_forest(scene.tris, chunk=chunk)
    scene = scene._replace(forest=forest)
    return jax.tree_util.tree_map(jnp.asarray, scene)


def test_forest_build_invariants():
    jscene = _soup_forest(700, chunk=256)
    forest = jscene.forest
    assert len(forest.bvhs) == 3
    assert forest.chunk_size == 256
    # All sub-BVHs padded to one node count → one compiled kernel.
    counts = {b.count for b in forest.bvhs}
    assert len(counts) == 1
    # face_ids' real slots are a permutation of the main-order face range.
    ids = np.asarray(forest.face_ids)
    assert sorted(ids[:700].tolist()) == list(range(700))
    # Forest-ordered geometry matches the main arrays through face_ids.
    np.testing.assert_array_equal(
        np.asarray(forest.v0.x)[:700], np.asarray(jscene.tris.v0.x)[ids[:700]]
    )
    # Padding slots are degenerate (never intersectable).
    assert np.all(np.asarray(forest.e1.x)[700:] == 0.0)


def test_forest_matches_brute_soup():
    jscene = _soup_forest(700, seed=2, chunk=256)
    o, d = _rays(1100, 7)
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_f, f_f = intersect_bvh_forest(
        jnp, o, d, jscene.forest, jscene.bvh, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_b))
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_b), rtol=1e-6, atol=1e-6)


def test_forest_unsorted_matches_sorted():
    jscene = _soup_forest(500, seed=5, chunk=128)
    o, d = _rays(700, 3)
    t_s, f_s = intersect_bvh_forest(
        jnp, o, d, jscene.forest, jscene.bvh, sort=True, interpret=True
    )
    t_u, f_u = intersect_bvh_forest(
        jnp, o, d, jscene.forest, jscene.bvh, sort=False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_u))
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_u), rtol=1e-6, atol=0)


def test_forest_nee_fused_occlusion():
    jscene = _soup_forest(500, seed=1, chunk=128)
    o, d = _rays(800, 9)
    lp = Vec3(jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2))
    t_f, f_f, occ = intersect_bvh_forest(
        jnp, o, d, jscene.forest, jscene.bvh, light_pos=lp, interpret=True
    )
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_b))

    hit = jnp.isfinite(t_f)
    ts = jnp.where(hit, t_f, jnp.float32(1.0))
    hit_p = o + d * ts
    ones = jnp.ones_like(o.x)
    l_vec = Vec3(lp.x * ones, lp.y * ones, lp.z * ones) - hit_p
    t_light = safe_sqrt(l_vec.length2())
    l_dir = l_vec * safe_div(jnp.float32(1.0), t_light)
    t_sh, _ = intersect_brute(jnp, hit_p, l_dir, jscene.tris)
    occ_ref = t_sh < t_light
    agree = np.mean(np.asarray(occ) == np.asarray(occ_ref))
    assert agree > 0.999, f"occlusion agreement {agree}"


def test_forest_miss_is_inf():
    jscene = _soup_forest(300, seed=3, chunk=128)
    o, d = _rays(64, 1)
    far = Vec3(o.x + 100.0, o.y + 100.0, o.z + 100.0)
    up = Vec3(jnp.zeros_like(o.x), jnp.ones_like(o.x), jnp.zeros_like(o.x))
    t, f = intersect_bvh_forest(
        jnp, far, up, jscene.forest, jscene.bvh, interpret=True
    )
    assert np.all(np.asarray(t) == INF)
    assert np.all(np.asarray(f) == -1)


def test_intersect_scene_dispatches_forest():
    """mode='pallas_bvh_forest' routes through the dispatcher and returns
    main-order faces + the differentiable re-eval t (kernel in interpret
    mode via monkeypatch, same technique as test_pallas_bvh.py)."""
    from pbr_tpu.ops import pallas_bvh as pb
    from pbr_tpu.ops.traverse import intersect_scene

    jscene = _soup_forest(500, seed=8, chunk=128)
    o, d = _rays(600, 5)

    orig = pb.intersect_bvh_forest

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pb.intersect_bvh_forest = interp
    try:
        t, face = intersect_scene(jnp, o, d, jscene, mode="pallas_bvh_forest")
    finally:
        pb.intersect_bvh_forest = orig
    t_ref, f_ref = intersect_scene(jnp, o, d, jscene, mode="brute")
    np.testing.assert_array_equal(np.asarray(face), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-6, atol=1e-6)


def test_big_scene_builds_forest():
    """build_scene attaches cluster tables to big scenes (the cull
    intersector auto-dispatch target); the forest is the explicit-build
    fallback only (auto-dispatch never walks it — it loses to cull at
    every measured size) and its sub-tables respect the packet kernel's
    VMEM row budget when built."""
    from pbr_tpu.accel.forest import build_forest
    from pbr_tpu.ops.pallas_bvh import PALLAS_BVH_MAX_ROWS

    scene, _ = scene_from_text(random_soup(16_000, seed=0), use_bvh=True)
    assert scene.clusters is not None
    assert scene.forest is None  # clusters supersede it
    forest = build_forest(scene.tris)
    assert len(forest.bvhs) == 2
    for b in forest.bvhs:
        assert b.count + forest.chunk_size <= PALLAS_BVH_MAX_ROWS
    small, _ = scene_from_text(random_soup(200, seed=0), use_bvh=True)
    assert small.forest is None and small.clusters is None
