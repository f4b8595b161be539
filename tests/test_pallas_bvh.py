"""Packet Pallas BVH traversal correctness (interpret mode on CPU).

Ground truth is the vectorized XLA walk (``intersect_bvh``) and the brute
sweep — all three must agree on nearest hit (`tests/test_intersectors.py`
already proves XLA-walk ≡ brute). The NEE-fused variant is checked against
the integrator's separate-shadow formulation, same as the brute Pallas
kernel's test.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet
from pbr_tpu.ops.traverse import intersect_brute, intersect_bvh
from pbr_tpu.ops.vec import Vec3, safe_div, safe_sqrt
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import cornell_box, random_soup


def _rays(n, seed, lo=-0.8, hi=0.8):
    rng = np.random.default_rng(seed)
    o = Vec3(*[jnp.asarray(rng.uniform(lo, hi, n), jnp.float32) for _ in range(3)])
    dn = rng.normal(size=(3, n)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*[jnp.asarray(c) for c in dn])
    return o, d


def _cornell_bvh():
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
    return jax.tree_util.tree_map(jnp.asarray, scene)


def _soup_bvh(n_tris=300, seed=0):
    scene, _ = scene_from_text(random_soup(n_tris, seed=seed), use_bvh=True)
    return jax.tree_util.tree_map(jnp.asarray, scene)


@pytest.mark.parametrize("sort", [True, False], ids=["sorted", "unsorted"])
def test_packet_matches_xla_walk_cornell(sort):
    jscene = _cornell_bvh()
    o, d = _rays(1500, 3)
    t_w, f_w = intersect_bvh(jnp, o, d, jscene.bvh, jscene.tris)
    t_p, f_p = intersect_bvh_packet(
        jnp, o, d, jscene.bvh, jscene.tris, sort=sort, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_w))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_w), rtol=1e-6, atol=1e-6)


def test_packet_matches_brute_soup():
    """Random soup exercises deep/unbalanced trees and 1-face leaves."""
    jscene = _soup_bvh()
    o, d = _rays(1100, 7, lo=-1.2, hi=1.2)
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_p, f_p = intersect_bvh_packet(
        jnp, o, d, jscene.bvh, jscene.tris, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_b), rtol=1e-6, atol=1e-6)


def test_packet_nee_fused_occlusion():
    jscene = _cornell_bvh()
    o, d = _rays(1100, 9)
    lp = Vec3(jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2))
    t_p, f_p, occ = intersect_bvh_packet(
        jnp, o, d, jscene.bvh, jscene.tris, light_pos=lp, interpret=True
    )
    hit = jnp.isfinite(t_p)
    ts = jnp.where(hit, t_p, jnp.float32(1.0))
    hit_p = o + d * ts
    ones = jnp.ones_like(o.x)
    l_vec = Vec3(lp.x * ones, lp.y * ones, lp.z * ones) - hit_p
    t_light = safe_sqrt(l_vec.length2())
    l_dir = l_vec * safe_div(jnp.float32(1.0), t_light)
    t_sh, _ = intersect_brute(jnp, hit_p, l_dir, jscene.tris)
    occ_ref = t_sh < t_light

    t_w, f_w = intersect_bvh(jnp, o, d, jscene.bvh, jscene.tris)
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_w))
    agree = np.mean(np.asarray(occ) == np.asarray(occ_ref))
    assert agree > 0.999, f"occlusion agreement {agree}"


def test_packet_miss_is_inf():
    jscene = _cornell_bvh()
    o, d = _rays(64, 1)
    far = Vec3(o.x + 100.0, o.y + 100.0, o.z + 100.0)
    up = Vec3(jnp.zeros_like(o.x), jnp.ones_like(o.x), jnp.zeros_like(o.x))
    t, f = intersect_bvh_packet(
        jnp, far, up, jscene.bvh, jscene.tris, interpret=True
    )
    assert np.all(np.asarray(t) == INF)
    assert np.all(np.asarray(f) == -1)


def test_intersect_scene_mode_pallas_bvh_interpretable():
    """mode='pallas_bvh' is reachable through the dispatcher (on CPU only
    via explicit mode + interpret inside the kernel wrapper is TPU-gated,
    so call the wrapper directly; here we check the dispatcher wiring by
    monkeypatching the kernel to interpret mode)."""
    from pbr_tpu.ops import pallas_bvh as pb
    from pbr_tpu.ops.traverse import intersect_scene

    jscene = _cornell_bvh()
    o, d = _rays(600, 5)

    orig = pb.intersect_bvh_packet

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pb.intersect_bvh_packet = interp
    try:
        t, face = intersect_scene(jnp, o, d, jscene, mode="pallas_bvh")
    finally:
        pb.intersect_bvh_packet = orig
    t_ref, f_ref = intersect_scene(jnp, o, d, jscene, mode="bvh")
    np.testing.assert_array_equal(np.asarray(face), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-6, atol=1e-6)


def test_packet_coarse_leaves_matches_brute():
    """Big-scene mode: a 16-face-leaf BVH (the adaptive build for scenes
    over 20k faces, scene/build.py) traversed with max_leaf=16 — exercised
    here on a small soup so interpret mode stays fast."""
    from pbr_tpu.utils.config import BVHConfig

    scene, _ = scene_from_text(
        random_soup(600, seed=4), bvh_cfg=BVHConfig(max_faces=16), use_bvh=True
    )
    from pbr_tpu.scene.build import bvh_max_leaf

    ml = bvh_max_leaf(scene)
    assert 2 < ml <= 16
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(700, seed=12, lo=-1.1, hi=1.1)
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_p, f_p = intersect_bvh_packet(
        jnp, o, d, jscene.bvh, jscene.tris, max_leaf=ml, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_b), rtol=1e-6, atol=1e-6)


def test_packet_hbm_matches_brute():
    """HBM-slab big-scene variant (interpret mode; DMA emulated). A small
    soup with an explicit 64-face-leaf build stands in for the >20k-face
    scenes that trigger this path for real."""
    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet_hbm
    from pbr_tpu.scene.build import bvh_max_leaf
    from pbr_tpu.utils.config import BVHConfig

    scene, _ = scene_from_text(
        random_soup(800, seed=6), bvh_cfg=BVHConfig(max_faces=64), use_bvh=True
    )
    ml = bvh_max_leaf(scene)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(700, seed=13, lo=-1.1, hi=1.1)
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_p, f_p = intersect_bvh_packet_hbm(
        jnp, o, d, jscene.bvh, jscene.tris, max_leaf=ml, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_b), rtol=1e-6, atol=1e-6)


def test_packet_hbm_nee_matches_separate():
    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet_hbm
    from pbr_tpu.scene.build import bvh_max_leaf
    from pbr_tpu.utils.config import BVHConfig

    scene, _ = scene_from_text(
        random_soup(500, seed=8), bvh_cfg=BVHConfig(max_faces=64), use_bvh=True
    )
    ml = bvh_max_leaf(scene)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(600, seed=14, lo=-1.1, hi=1.1)
    lp = Vec3(jnp.float32(0.0), jnp.float32(2.0), jnp.float32(0.1))
    t_p, f_p, occ = intersect_bvh_packet_hbm(
        jnp, o, d, jscene.bvh, jscene.tris, max_leaf=ml, light_pos=lp,
        interpret=True,
    )
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    # Shadow leg vs the integrator's separate formulation.
    hit = jnp.isfinite(t_p)
    ts = jnp.where(hit, t_p, jnp.float32(1.0))
    hp = o + d * ts
    ones = jnp.ones_like(o.x)
    lv = Vec3(lp.x * ones, lp.y * ones, lp.z * ones) - hp
    t_light = safe_sqrt(lv.length2())
    l_dir = lv * safe_div(jnp.float32(1.0), t_light)
    t_sh, _ = intersect_brute(jnp, hp, l_dir, jscene.tris)
    occ_ref = t_sh < t_light
    agree = np.mean(np.asarray(occ) == np.asarray(occ_ref))
    assert agree > 0.999, f"occlusion agreement {agree}"
