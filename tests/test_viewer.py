"""Interactive viewer (pbr_tpu/viewer.py): scripted-key loop, camera →
progressive restart, light-move mode, terminal blit plumbing. The reference
tested this surface by hand in its Qt window (Window.cpp:178-242,
GLWidget.cpp:80-84); here the loop is scriptable and asserted."""

import io

import numpy as np

from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.procedural import cornell_box
from pbr_tpu.utils.config import CameraConfig, RenderSettings
from pbr_tpu.viewer import Viewer, ansi_halfblocks, downsample, tonemap_u8


def _make_viewer(**kw):
    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
    settings = RenderSettings(
        width=32, height=32, samples=1, max_depth=2, max_added_depth=0,
        shadow_rays=1, anti_aliasing=0.0,
    )
    cfg = CameraConfig(eye=(0.0, 1.0, 3.2), center=(0.0, 0.0, 1.0))
    return Viewer(scene, settings, cfg, out=io.StringIO(), **kw)


def test_scripted_loop_renders_and_accumulates():
    v = _make_viewer()
    v.run(max_frames=3, keys="", draw=True)
    assert v.frame == 3
    assert v.tracer.sample_count == 3
    out = v.out.getvalue()
    assert "▀" in out and "spp" in out


def test_camera_move_restarts_accumulation():
    v = _make_viewer()
    v.run(max_frames=2, keys="", draw=False)
    assert v.tracer.sample_count == 2
    eye0 = list(v.camera.eye)
    v.run(max_frames=4, keys="w", draw=False)
    # 'w' moved the camera forward and reset the accumulator
    assert v.camera.eye != eye0
    assert v._resets >= 1
    assert v.tracer.sample_count < 4


def test_rotation_and_speed_keys():
    v = _make_viewer()
    v.handle_key("f")
    assert abs(v.camera.speed - (CameraConfig().speed + 0.1)) < 1e-9
    rx0 = v.camera.rot_x
    v.handle_key("LEFT")
    assert v.camera.rot_x != rx0
    v.handle_key("r")
    assert v.camera.rot_x == 0.0


def test_light_move_mode_moves_orb():
    v = _make_viewer()
    x0 = float(np.asarray(v.tracer.scene.lights.pos.x)[0])
    v.handle_key("l")
    assert v.move_light
    v.handle_key("d")
    x1 = float(np.asarray(v.tracer.scene.lights.pos.x)[0])
    assert abs(x1 - x0 - 0.25) < 1e-6
    assert v._resets >= 1
    # toggling back returns WASD to the camera
    v.handle_key("l")
    assert not v.move_light


def test_quit_key_stops_loop():
    v = _make_viewer()
    v.run(max_frames=100, keys="  x", draw=False)
    assert v.quit and v.frame <= 3


def test_focus_keys():
    v = _make_viewer()
    v.run(max_frames=1, keys="", draw=False)
    v.handle_key("p")
    assert v.focus > 0.0  # center pixel hits the back wall
    v.handle_key("o")
    assert v.focus == -1.0


def test_blit_helpers():
    img = np.linspace(0, 2.0, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    u8 = tonemap_u8(img, exposure=2.0)
    assert u8.dtype == np.uint8 and u8.max() == 255
    small = downsample(u8.astype(np.float32), 4, 8)
    assert small.shape == (4, 8, 3)
    txt = ansi_halfblocks(small.astype(np.uint8))
    assert txt.count("▀") == 2 * 8 and "38;2;" in txt


def test_cli_view_smoke():
    from pbr_tpu.app import main

    main([
        "view", "--scene", "cornell", "--size", "16", "--frames", "2",
        "--keys", "w", "--no-draw",
    ])
