"""Pallas brute-force intersector correctness (interpret mode on CPU).

The fused kernels are TPU-only at runtime; ``interpret=True`` runs the same
kernel logic through the Pallas interpreter so CI validates them without a
chip. Ground truth is the XLA sweep (``intersect_brute``) and the
integrator's separate-shadow formulation.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.pallas_intersect import intersect_pallas
from pbr_tpu.ops.traverse import intersect_brute
from pbr_tpu.ops.vec import Vec3, safe_div, safe_sqrt
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import cornell_box


def _scene_and_rays(n=1500, seed=3):
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    rng = np.random.default_rng(seed)
    # Origins inside the box, directions on the sphere.
    o = Vec3(*[jnp.asarray(rng.uniform(-0.8, 0.8, n), jnp.float32) for _ in range(3)])
    dn = rng.normal(size=(3, n)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*[jnp.asarray(c) for c in dn])
    return jscene, o, d


def test_pallas_mt_matches_brute():
    """The classic-sweep kernel computes the exact same expressions as the
    XLA brute sweep, so the winning face must match bitwise."""
    jscene, o, d = _scene_and_rays()
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_p, f_p = intersect_pallas(jnp, o, d, jscene.tris, interpret=True, variant="mt")
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    np.testing.assert_allclose(
        np.asarray(t_p), np.asarray(t_b), rtol=1e-6, atol=1e-6
    )


def test_pallas_lin_matches_brute():
    """The linear-form sweep regroups the triple products (hoisted per-face
    constants), so f32 rounding differs near triangle edges / grazing
    angles: the contract is near-total face agreement on adversarial random
    rays, exact t agreement wherever the face agrees, and (separately
    measured) a ≤0.13% pixel-flip rate end-to-end — inside the golden
    tests' 1% budget."""
    jscene, o, d = _scene_and_rays()
    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    t_p, f_p = intersect_pallas(jnp, o, d, jscene.tris, interpret=True, variant="lin")
    f_b, f_p = np.asarray(f_b), np.asarray(f_p)
    agree = f_p == f_b
    assert agree.mean() > 0.97, f"face agreement {agree.mean():.4f}"
    np.testing.assert_allclose(
        np.asarray(t_p)[agree], np.asarray(t_b)[agree], rtol=1e-5, atol=1e-5
    )


def test_pallas_nee_fused_occlusion():
    jscene, o, d = _scene_and_rays(n=1100, seed=9)
    lp = Vec3(
        jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2)
    )  # inside the box, near the ceiling
    t_p, f_p, occ = intersect_pallas(
        jnp, o, d, jscene.tris, light_pos=lp, interpret=True, variant="mt"
    )
    # Reference: the integrator's separate-shadow math on the kernel's t.
    hit = jnp.isfinite(t_p)
    ts = jnp.where(hit, t_p, jnp.float32(1.0))
    hit_p = o + d * ts
    ones = jnp.ones_like(o.x)
    l_vec = Vec3(lp.x * ones, lp.y * ones, lp.z * ones) - hit_p
    t_light = safe_sqrt(l_vec.length2())
    l_dir = l_vec * safe_div(jnp.float32(1.0), t_light)
    t_sh, _ = intersect_brute(jnp, hit_p, l_dir, jscene.tris)
    occ_ref = t_sh < t_light

    t_b, f_b = intersect_brute(jnp, o, d, jscene.tris)
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_b))
    agree = np.mean(np.asarray(occ) == np.asarray(occ_ref))
    # ULP-level differences in the recomputed hit point can flip grazing
    # occlusions; require near-total agreement.
    assert agree > 0.999, f"occlusion agreement {agree}"


def test_pallas_nee_fused_occlusion_lin():
    """Same fused-NEE contract for the linear-form sweep, with the lin
    face-agreement gate in place of bitwise equality."""
    jscene, o, d = _scene_and_rays(n=1100, seed=9)
    lp = Vec3(jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2))
    t_l, f_l, occ_l = intersect_pallas(
        jnp, o, d, jscene.tris, light_pos=lp, interpret=True, variant="lin"
    )
    t_m, f_m, occ_m = intersect_pallas(
        jnp, o, d, jscene.tris, light_pos=lp, interpret=True, variant="mt"
    )
    assert (np.asarray(f_l) == np.asarray(f_m)).mean() > 0.97
    assert (np.asarray(occ_l) == np.asarray(occ_m)).mean() > 0.99


def test_pallas_miss_is_inf():
    jscene, o, d = _scene_and_rays(n=64)
    # Rays pointing away from everything (outside the box, facing out).
    far = Vec3(o.x + 100.0, o.y + 100.0, o.z + 100.0)
    up = Vec3(
        jnp.zeros_like(o.x), jnp.ones_like(o.x), jnp.zeros_like(o.x)
    )
    t, f = intersect_pallas(jnp, far, up, jscene.tris, interpret=True)
    assert np.all(np.asarray(t) == INF)
    assert np.all(np.asarray(f) == -1)
