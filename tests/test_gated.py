"""Gated-brute intersector correctness (ops/pallas_gated.py, interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbr_tpu.accel.clusters import build_clusters
from pbr_tpu.ops.pallas_gated import intersect_gated
from pbr_tpu.ops.traverse import intersect_brute, intersect_scene
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import random_soup


def _scene(n=400, seed=0):
    scene, _ = scene_from_text(random_soup(n, seed=seed), use_bvh=True)
    cset = build_clusters(scene.tris, size=64)
    return scene, cset


def _rays(n, seed=1):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-2.5, 2.5, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    k = n // 8
    d[:k, :2] = 0.0
    o[k : 2 * k, 0] = 0.0
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    return (
        Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
    )


def _check(n_faces, n_rays, rows=1, seed=7, chunk_rays=None, static=False):
    # static=False: the fori body is cheap to compile under interpret; one
    # dedicated test covers the static-unroll variant on a tiny scene.
    scene, cset = _scene(n_faces, seed=seed)
    ov, dv = _rays(n_rays, seed=seed + 1)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    kw = {"chunk_rays": chunk_rays} if chunk_rays else {}
    t_g, f_g = intersect_gated(
        jnp, ov, dv, jtris, jset, rows=rows, interpret=True,
        static_unroll=static, **kw
    )
    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    np.testing.assert_array_equal(np.asarray(f_g), np.asarray(f_b))
    hit = np.asarray(f_b) >= 0
    np.testing.assert_allclose(
        np.asarray(t_g)[hit], np.asarray(t_b)[hit], rtol=1e-4, atol=1e-5
    )


def test_gated_matches_brute():
    _check(400, 512, rows=1)


@pytest.mark.slow  # interpret-mode compile of the unrolled sections ~3 min
def test_gated_static_unroll_small():
    _check(150, 256, rows=1, static=True)


def test_gated_rows2():
    _check(700, 512, rows=2)


def test_gated_odd_batch():
    _check(200, 333, rows=1)


def test_gated_chunked():
    _check(300, 640, rows=1, chunk_rays=256)


def test_gated_alive_and_counts():
    scene, cset = _scene(300, seed=2)
    ov, dv = _rays(256, seed=9)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    alive = jnp.asarray((np.arange(256) % 3) != 0)
    t_g, f_g, n_tests = intersect_gated(
        jnp, ov, dv, jtris, jset, alive=alive, rows=1, interpret=True,
        with_counts=True, static_unroll=False,
    )
    _, f_b = intersect_brute(jnp, ov, dv, jtris)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(f_g)[a], np.asarray(f_b)[a])
    assert np.all(np.asarray(f_g)[~a] == -1)
    # EXACT executed-test counts (VERDICT r4 item 5, equality not bounds):
    # each lane sweeps its tile's gated-in clusters' real faces — 64 per
    # cluster minus the zero-padding faces of the last cluster.
    from pbr_tpu.ops.cull import fine_hit_mask

    nt = np.asarray(n_tests)
    hit = np.asarray(
        fine_hit_mask(jnp, ov, dv, jset, 128, t_cap=None, live=alive)
    )
    n_clusters = hit.shape[1]
    real_per_cluster = np.clip(300 - np.arange(n_clusters) * 64, 0, 64)
    per_tile = hit.astype(np.int64) @ real_per_cluster
    np.testing.assert_array_equal(nt, np.repeat(per_tile, 128))
    assert np.all(nt[np.asarray(f_g) >= 0] >= 44)  # >= one real cluster


def test_gated_nee_matches_separate():
    scene, cset = _scene(400, seed=4)
    ov, dv = _rays(384, seed=11)
    jset = jax.tree_util.tree_map(jnp.asarray, cset)
    jtris = jax.tree_util.tree_map(jnp.asarray, scene.tris)
    lp = Vec3(jnp.float32(0.1), jnp.float32(2.0), jnp.float32(-0.2))
    t_g, f_g, occ = intersect_gated(
        jnp, ov, dv, jtris, jset, light_pos=lp, rows=1, interpret=True,
        static_unroll=False,
    )
    from pbr_tpu.ops.intersect import INF, moller_trumbore

    t_b, f_b = intersect_brute(jnp, ov, dv, jtris)
    t_b, f_b = np.asarray(t_b), np.asarray(f_b)
    np.testing.assert_array_equal(np.asarray(f_g), f_b)
    o = np.stack([np.asarray(ov.x), np.asarray(ov.y), np.asarray(ov.z)], 1)
    d = np.stack([np.asarray(dv.x), np.asarray(dv.y), np.asarray(dv.z)], 1)
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


def test_gated_dispatch(monkeypatch):
    import pbr_tpu.ops.pallas_gated as pg

    monkeypatch.setattr(pg, "STATIC_MAX_CLUSTERS", 0)
    scene, _ = scene_from_text(random_soup(500, seed=6), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    ov, dv = _rays(256, seed=17)
    t_s, f_s = intersect_scene(jnp, ov, dv, jscene, mode="gated")
    t_b, f_b = intersect_scene(jnp, ov, dv, jscene, mode="brute")
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_b))
