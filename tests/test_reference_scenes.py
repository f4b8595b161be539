"""End-to-end loading + rendering of the reference's own test scenes.

These use the reference repo's *data* (resources/models/testing — curated
manual-QA scenes, SURVEY.md §4) as parser/loader fixtures. Skipped when the
reference checkout isn't present.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/resources/models/testing"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference scenes not available"
)


def test_parse_suzanne():
    from pbr_tpu.io.loader import load_model
    from pbr_tpu.utils.config import RenderSettings

    settings = RenderSettings(width=64, height=64, shadow_rays=1)
    scene, settings, obj = load_model(os.path.join(REF, "suzanne.obj"), settings)
    # 13 materials declared in suzanne.mtl; one orb light in suzanne.lights.
    assert len(obj.mtl.materials) == 13
    assert len(obj.lights) == 1 and obj.lights[0].type == 2
    assert obj.num_faces > 900  # cornell-suzanne is ~1000 faces
    assert scene.bvh is not None and scene.bvh.count > obj.num_faces // 2
    # custom MTL extensions parsed (mirror cube: nu=nv=100000, Rs=1, Rd=0)
    mirror = obj.mtl.find("Cube_med0")
    assert mirror is not None and mirror.nu == 100000.0 and mirror.Rs == 1.0
    assert mirror.rough == 0.0


def test_render_suzanne_cpu():
    from pbr_tpu.io.loader import load_model
    from pbr_tpu.reference.cpu import render_cpu
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.utils.config import RenderSettings

    settings = RenderSettings(
        width=32, height=32, samples=1, max_depth=2, max_added_depth=1,
        shadow_rays=1, anti_aliasing=0.7,
    )
    scene, settings, obj = load_model(os.path.join(REF, "suzanne.obj"), settings)
    cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
    rgb, focus = render_cpu(scene, cam, settings, frame_seed=1)
    assert np.isfinite(rgb).all()
    assert rgb.std() > 1e-3  # non-trivial image
    assert np.isfinite(focus).any()


def test_parse_all_reference_scenes():
    from pbr_tpu.io.obj import parse_obj_file

    for name in ["spheres", "pillars", "squirrels", "squirrel-mirror", "applejack2"]:
        obj = parse_obj_file(os.path.join(REF, f"{name}.obj"))
        assert obj.num_faces > 0, name
        assert len(obj.mtl.materials) > 0, name
        # every face's material index resolves (or is -1 → default)
        assert obj.faces_mtl.max() < len(obj.mtl.materials), name


def test_render_suzanne_jit_golden():
    """The BVH + 13-material + orb-light path end-to-end on the compiled
    XLA backend vs the CPU oracle (VERDICT r1: reference scenes were
    CPU-only). 64x64, fixed seed, the golden percentile gate."""
    import functools

    import jax
    import jax.numpy as jnp

    from pbr_tpu.io.loader import load_model
    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.reference.cpu import render_cpu
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.utils.config import RenderSettings

    settings = RenderSettings(
        width=64, height=64, samples=1, max_depth=2, max_added_depth=1,
        shadow_rays=1, anti_aliasing=0.7,
    )
    scene, settings, obj = load_model(os.path.join(REF, "suzanne.obj"), settings)
    assert scene.bvh is not None
    cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
    rgb_np, _ = render_cpu(scene, cam, settings, frame_seed=5)

    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    ids = jnp.arange(64 * 64, dtype=jnp.int32)
    f = jax.jit(functools.partial(trace_rays, jnp), static_argnames=("settings",))
    res = f(jscene, jcam, settings=settings, pixel_ids=ids, frame_seed=jnp.uint32(5))
    rgb_j = np.stack(
        [np.asarray(res.color.x), np.asarray(res.color.y), np.asarray(res.color.z)], -1
    ).reshape(64, 64, 3)
    assert np.isfinite(rgb_j).all()
    d = np.abs(rgb_j - rgb_np).max(axis=-1)
    # ~1000-face scene with a mirror cube: allow the golden flip budget.
    assert (d > 1e-3).mean() <= 0.02, f"flips {(d > 1e-3).mean():.2%}"
    agree = d <= 1e-3
    assert np.abs(rgb_j - rgb_np).max(axis=-1)[agree].mean() < 1e-2
