"""Cross-checks between the intersector implementations (brute / GEMM /
chunked-BVH) and the differentiable re-evaluation contract."""

import numpy as np
import pytest

from pbr_tpu.ops.gemm_intersect import intersect_gemm
from pbr_tpu.ops.traverse import intersect_brute, intersect_bvh_chunked, intersect_scene
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import cornell_box, random_soup


def _rays(n, seed=0):
    r = np.random.RandomState(seed)
    o = r.uniform(-2, 3, size=(3, n)).astype(np.float32)
    d = r.randn(3, n).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return Vec3(*o), Vec3(*d)


def test_gemm_matches_brute_numpy():
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    o, d = _rays(50000)
    with np.errstate(all="ignore"):
        t1, f1 = intersect_brute(np, o, d, scene.tris)
        t2, f2 = intersect_gemm(np, o, d, scene.tris)
    # Different float association → rare flips at grazing hits.
    agree = f1 == f2
    assert agree.mean() > 0.995
    m = agree & np.isfinite(t1)
    np.testing.assert_allclose(t2[m], t1[m], rtol=1e-4, atol=1e-4)


def test_chunked_bvh_matches_unchunked():
    import jax
    import jax.numpy as jnp

    obj_text = random_soup(500, seed=3)
    scene, _ = scene_from_text(obj_text, use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(3000, seed=4)  # NOT a multiple of the chunk → exercises padding
    jo = jax.tree_util.tree_map(jnp.asarray, o)
    jd = jax.tree_util.tree_map(jnp.asarray, d)
    from pbr_tpu.ops.traverse import intersect_bvh

    t1, f1 = intersect_bvh(jnp, jo, jd, jscene.bvh, jscene.tris)
    t2, f2 = intersect_bvh_chunked(jnp, jo, jd, jscene.bvh, jscene.tris, chunk=512)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(
        np.nan_to_num(np.asarray(t1), posinf=-1), np.nan_to_num(np.asarray(t2), posinf=-1)
    )


def test_reeval_t_matches_search_t():
    """intersect_scene re-evaluates the winner differentiably; the re-eval t
    must equal the search t (same face, same formula)."""
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
    o, d = _rays(20000, seed=7)
    with np.errstate(all="ignore"):
        t_scene, f_scene = intersect_scene(np, o, d, scene)
        t_brute, f_brute = intersect_brute(np, o, d, scene.tris)
    np.testing.assert_array_equal(f_scene, f_brute)
    m = np.isfinite(t_brute)
    np.testing.assert_allclose(t_scene[m], t_brute[m], rtol=1e-6, atol=1e-6)


def test_grads_flow_through_reeval_only():
    """d loss/d origin exists (via re-eval) even on the BVH path, and no
    gradient reaches the triangle arrays (geometry is detached)."""
    import jax
    import jax.numpy as jnp

    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)

    def f(oz, trisx):
        o = Vec3(jnp.zeros((16,)), jnp.full((16,), 1.0), jnp.full((16,), oz))
        d = Vec3(jnp.zeros((16,)), jnp.zeros((16,)), jnp.full((16,), -1.0))
        tris = jscene.tris._replace(v0=jscene.tris.v0._replace(x=trisx))
        sc = jscene._replace(tris=tris)
        t, _ = intersect_scene(jnp, o, d, sc)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g_oz, g_tris = jax.grad(f, argnums=(0, 1))(jnp.float32(3.2), jscene.tris.v0.x)
    assert abs(float(g_oz)) > 0.5  # dt/d eye_z ≈ -1 per hit ray
    assert float(jnp.abs(g_tris).max()) == 0.0  # geometry detached
