"""Per-pixel work-counter channels (VERDICT r3 item 4).

The reference's debug image records intersection tests per ray (the
``uint debugCounter`` of pt_bvh.cl:23,89 surfaced via writeDebugImage,
pathtracing.cl:73-78). Here the integrator accumulates ``heat_tests``
(per-pixel ray-face tests) next to ``heat_bounces``; these tests pin the
channel to the scalar work counters so the heatmap is a measurement, not
an illustration.

Invariants by intersector family:
- brute family (counts = full-sweep constants): every live lane tests all
  F faces per bounce, so sum(heat_tests) == F * n_path exactly when the
  NEE leg is unfused (CPU brute), and 2*F*n_path when fused.
- gated/sweep (counts = cull-verdict work bounds): bounded above by the
  full-sweep constant and below by zero; nonzero wherever paths ran.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.scene.procedural import cornell_box, random_soup
from pbr_tpu.utils.config import RenderSettings


def _trace(scene, cam, settings, size):
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    ids = jnp.arange(size * size, dtype=jnp.int32)
    return trace_rays(
        jnp, jscene, jcam, settings, ids, jnp.uint32(3), with_stats=True
    )


def test_brute_tests_channel_equals_counter_invariant():
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
    size = 16
    settings = RenderSettings(
        width=size, height=size, samples=1, max_depth=2, max_added_depth=2,
        shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
        intersector="brute",
    )
    res = _trace(scene, cam, settings, size)
    nf = scene.tris.count
    total = int(np.asarray(res.heat_tests).sum())
    n_path = int(res.n_path_rays)
    # CPU brute has no fused NEE -> counts cover the nearest sweep only.
    assert total == nf * n_path
    # The bounce channel is consistent: sum(heat_bounces) == n_path.
    assert int(np.asarray(res.heat_bounces).sum()) == n_path


@pytest.mark.slow
def test_gated_tests_channel_bounded_and_live():
    scene, _ = scene_from_text(random_soup(512, seed=5), use_bvh=True)
    assert scene.clusters is not None
    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    size = 16
    settings = RenderSettings(
        width=size, height=size, samples=1, max_depth=2, max_added_depth=1,
        shadow_rays=0, anti_aliasing=0.0, sky_light=(0.85, 0.9, 1.0),
        intersector="gated",
    )
    res = _trace(scene, cam, settings, size)
    tests = np.asarray(res.heat_tests)
    bounces = np.asarray(res.heat_bounces)
    nf_padded = scene.clusters.size * scene.clusters.bb_min.x.shape[0]
    # Work bound: per bounce a ray tests at most every (padded) face once.
    assert (tests <= nf_padded * bounces).all()
    assert (tests >= 0).all()
    # Culling must actually cut work somewhere on a 512-tri soup...
    assert tests.sum() < nf_padded * bounces.sum()
    # ...and every traced pixel must have tested *something* (camera rays
    # pass through the soup's bounding region at this framing).
    assert tests.sum() > 0


def test_heatmap_png_has_tests_channel(tmp_path):
    from pbr_tpu.app import _write_heatmap
    from pbr_tpu.utils.image import read_png

    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
    size = 8
    settings = RenderSettings(
        width=size, height=size, samples=1, max_depth=2, max_added_depth=1,
        shadow_rays=1, anti_aliasing=0.0, sky_light=(0.85, 0.9, 1.0),
        intersector="brute",
    )
    out = str(tmp_path / "heat.png")
    _write_heatmap(out, scene, cam, settings)
    img = read_png(out)
    assert img.shape == (size, size, 3)
    # R carries tests, G carries bounces, B is zeroed: on a Cornell
    # interior every camera ray hits, so both channels must be live.
    assert img[..., 0].max() > 0
    assert img[..., 1].max() > 0
    assert img[..., 2].max() == 0
