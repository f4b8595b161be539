"""Lane-order auto-resolution and the production-default tuning path.

VERDICT r4 item 2: the CLI must ship the measured-best configuration —
``lane_order='auto'`` + ``compact_schedule='auto'`` resolved by the
occupancy probe — instead of leaving the tuned path reachable only from
bench.py. These tests pin:

- the probe-subset helper (ADVICE r4: the morton probe must cost a band,
  not a full frame),
- the dual-order probe picking morton on a scene whose deaths cluster
  spatially (and its render agreeing with the scanline one),
- the CLI render path actually routing through the probe.
"""

import io

import numpy as np
import pytest

from pbr_tpu.models.pathtracer import (
    PathTracer,
    probe_subset_ids,
    schedule_cost,
)
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.utils.config import BRDF_SCHLICK, RenderSettings


def test_probe_subset_ids_block_aligned():
    ids = np.random.default_rng(0).permutation(1024).astype(np.int32)
    sub = probe_subset_ids(ids, block=128, target_lanes=256)
    assert sub.size == 256
    # Whole blocks, in order: each 128-lane chunk of the subset is one of
    # the permutation's aligned 128-lane blocks.
    blocks = ids.reshape(-1, 128)
    for chunk in sub.reshape(-1, 128):
        assert any(np.array_equal(chunk, b) for b in blocks)


def test_probe_subset_ids_spread_and_cap():
    ids = np.arange(4096, dtype=np.int32)
    sub = probe_subset_ids(ids, block=64, target_lanes=512)
    assert sub.size == 512
    # Evenly spread: first and last block sampled.
    assert sub[0] == 0 and sub[-1] == 4095
    # target >= frame: returns everything.
    assert probe_subset_ids(ids, 64, 10**9).size == 4096
    # Non-dividing block halves down instead of failing.
    assert probe_subset_ids(np.arange(96, dtype=np.int32), 64, 64).size in (32, 64, 96)


def test_schedule_cost():
    assert schedule_cost((), 8) == 8.0
    assert schedule_cost(((4, 0.5),), 8) == 4 + 4 * 0.5
    # Later tighter caps take over from their bounce on.
    assert schedule_cost(((2, 0.5), (4, 0.25)), 6) == pytest.approx(
        2 * 1.0 + 2 * 0.5 + 2 * 0.25
    )


SIZE = 32


def _triangle_scene():
    # A small centered triangle against the sky: everything off the
    # triangle dies at bounce 0, deaths cluster spatially -> morton blocks
    # (square patches) empty out, scanline strips (block spans >1 image
    # row at this size) stay live.
    obj = (
        "o tri\nusemtl white\n"
        "v -0.4 0.6 0.0\nv 0.4 0.6 0.0\nv 0.0 1.4 0.0\n"
        "f 1 2 3\n"
    )
    mtl = "newmtl white\nKd 0.7 0.7 0.7\nrough 1.0\np 1.0\nRd 1.0\nRs 0.0\n"
    li = "newlight l\ntype 1\nrgb 1 1 1\npos 0 2 2\nradius 0.1\n"
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
    return scene, cam


def _settings():
    return RenderSettings(
        width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=2,
        shadow_rays=1, brdf=BRDF_SCHLICK, sky_light=(0.6, 0.7, 0.9),
        bounce_loop="scan", sample_loop="scan", compact_block=64,
    )


def test_auto_order_dual_probe_picks_morton():
    scene, cam = _triangle_scene()
    base = _settings().replace(compact_schedule="auto")
    pt = PathTracer(scene, base, donate=False, lane_order="auto")
    pt.render(cam, frame_seed=5)
    assert pt.lane_order == "morton"
    assert pt.settings.compact_schedule != ()

    # The morton render agrees with the scanline-pinned one: the
    # integrator is pixel-id-keyed, so order changes nothing per pixel.
    pt_s = PathTracer(scene, base, donate=False, lane_order="scanline")
    pt_s.render(cam, frame_seed=5)
    np.testing.assert_allclose(pt.image(), pt_s.image(), atol=1e-5)


def test_auto_order_with_pinned_schedule_is_scanline():
    scene, cam = _triangle_scene()
    pinned = _settings().replace(compact_schedule=((4, 0.9),))
    pt = PathTracer(scene, pinned, donate=False, lane_order="auto")
    assert pt.lane_order == "scanline"


def test_cli_render_routes_through_probe(tmp_path, monkeypatch, capsys):
    """VERDICT r4 item 2 done-criterion: `pbr-tpu render` with defaults
    resolves lane order + compaction via the probe (not fixed constants)."""
    from pbr_tpu.app import main
    from pbr_tpu.utils.log import Logger

    out = tmp_path / "r.png"
    stream = io.StringIO()
    monkeypatch.setattr(Logger, "stream", stream)
    monkeypatch.setattr(
        "sys.argv",
        ["pbr-tpu", "render", "--scene", "cornell", "--size", "32",
         "--frames", "2", "--out", str(out)],
    )
    main()
    log = stream.getvalue()
    assert "lane-order probe" in log
    assert "auto compaction schedule" in log
    assert out.exists()


def test_no_transparency_specialization_bitwise():
    """Opaque-only scenes auto-set no_transparency and render BITWISE
    identically to the unspecialized program (the transmit branch is
    statically dead; RNG streams are independently keyed so skipping the
    transmit draws changes nothing)."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.scene.build import derive_static_flags, scene_from_text
    from pbr_tpu.scene.procedural import cornell_box

    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
    base = RenderSettings(
        width=16, height=16, samples=1, max_depth=3, max_added_depth=2,
        shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
        bounce_loop="scan", sample_loop="scan",
    )
    spec = derive_static_flags(scene, base)
    assert spec.no_transparency  # all cornell materials are opaque

    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    ids = jnp.arange(16 * 16, dtype=jnp.int32)

    def run(s):
        r = jax.jit(
            lambda sc, c, i: trace_rays(jnp, sc, c, s, i, jnp.uint32(9))
        )(jscene, jcam, ids)
        return np.stack([np.asarray(r.color.x), np.asarray(r.color.y),
                         np.asarray(r.color.z)])

    np.testing.assert_array_equal(run(base), run(spec))


def test_transparent_scene_keeps_refraction_flag_off():
    from pbr_tpu.scene.build import derive_static_flags, scene_from_text

    obj = "o t\nusemtl glass\nv -1 0 -1\nv 1 0 -1\nv 0 1.5 -1\nf 1 2 3\n"
    mtl = "newmtl glass\nd 0.0\nNi 1.5\nKd 0.9 0.9 0.9\n"
    scene, _ = scene_from_text(obj, mtl, "", use_bvh=False)
    s = derive_static_flags(scene, RenderSettings())
    assert not s.no_transparency
