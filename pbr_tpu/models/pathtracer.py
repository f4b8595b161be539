"""Progressive path tracer: the flagship renderer model.

The TPU-side equivalent of the reference's render orchestration
(``PathTracer.{h,cpp}`` + the GLWidget timer loop): each frame traces
``samples`` paths per pixel and blends into a device-resident accumulator
with weight n/(n+1) (PathTracer.cpp:44, pt_rgb.cl:17). Unlike the reference
— which round-tripped the accumulated image GPU→CPU→GPU every frame
(PathTracer.cpp:61-67, SURVEY.md §3.3) — the accumulator here *stays on
device*: the jitted step donates it in and gets the updated one back, and
only explicit ``image()`` calls transfer pixels to host.

A camera change resets the accumulation (sample count → 0), matching
GLWidget::cameraUpdate → resetSampleCount (GLWidget.cpp:80-84,
PathTracer.cpp:576-578).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import CameraState, Scene
from pbr_tpu.utils.config import RenderSettings


class FrameState(NamedTuple):
    """Device-resident progressive accumulation state (the reference's
    imageIn/imageOut pair + sample counter, with the first-hit distance kept
    as a separate channel instead of alpha punning)."""

    rgb: Vec3  # (B,) accumulated color
    depth: object  # (B,) previous-frame first-hit t (DoF focus source)
    sample_count: object  # () int32


def init_frame_state(xp, num_pixels: int) -> FrameState:
    return FrameState(
        rgb=Vec3.full(xp, (num_pixels,), (0.0, 0.0, 0.0)),
        depth=xp.zeros((num_pixels,), dtype=xp.float32),
        sample_count=xp.zeros((), dtype=xp.int32),
    )


def render_frame(
    xp,
    scene: Scene,
    cam: CameraState,
    settings: RenderSettings,
    state: FrameState,
    pixel_ids,
    frame_seed,
    max_leaf: int = 2,
) -> FrameState:
    """One progressive frame: trace + blend (setColors, pt_rgb.cl:9-21).

    Backend-generic and functional — under JAX wrap in jit with
    ``settings`` static and ``state`` donated.
    """
    res = trace_rays(
        xp,
        scene,
        cam,
        settings,
        pixel_ids,
        frame_seed,
        prev_t=state.depth,
        max_leaf=max_leaf,
    )
    n = state.sample_count.astype(xp.float32)
    weight = n / (n + 1.0)  # pixelWeight = n/(n+1), PathTracer.cpp:44
    rgb = Vec3(
        res.color.x * (1.0 - weight) + state.rgb.x * weight,
        res.color.y * (1.0 - weight) + state.rgb.y * weight,
        res.color.z * (1.0 - weight) + state.rgb.z * weight,
    )
    return FrameState(rgb=rgb, depth=res.focus_t, sample_count=state.sample_count + 1)


class PathTracer:
    """Stateful convenience wrapper around the functional renderer.

    Owns the jitted frame step (compiled once per (scene-shapes, settings)),
    the device accumulator, and the progressive sample counter.
    """

    def __init__(
        self,
        scene: Scene,
        settings: RenderSettings,
        max_leaf: int = None,
        donate: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.settings = settings
        if max_leaf is None:
            # Derive the static traversal bound from the scene's BVH (big
            # scenes build coarser leaves — scene/build.py bvh_max_leaf).
            from pbr_tpu.scene.build import bvh_max_leaf

            max_leaf = bvh_max_leaf(scene)
        self.scene = jax.tree_util.tree_map(jnp.asarray, scene)
        self.max_leaf = max_leaf
        npx = settings.width * settings.height
        self.pixel_ids = jnp.arange(npx, dtype=jnp.int32)
        self.state = init_frame_state(jnp, npx)

        @functools.partial(
            jax.jit,
            static_argnames=("settings", "max_leaf"),
            donate_argnames=("state",) if donate else (),
        )
        def _step(scene, cam, settings, state, pixel_ids, frame_seed, max_leaf):
            return render_frame(
                jnp, scene, cam, settings, state, pixel_ids, frame_seed, max_leaf=max_leaf
            )

        self._step = _step

    def reset_sample_count(self) -> None:
        """Restart progressive accumulation (PathTracer.cpp:576-578)."""
        self.state = init_frame_state(self._jnp, self.settings.width * self.settings.height)

    def move_light(self, index: int, dx: float, dy: float, dz: float) -> None:
        """Translate light ``index`` and restart accumulation — the
        completed PathTracer::moveSun (stubbed upstream,
        PathTracer.cpp:544-565). Scene edits retrace nothing: lights are
        traced arrays, so the compiled step sees the new values directly."""
        lights = self.scene.lights
        pos = lights.pos
        new_pos = type(pos)(
            pos.x.at[index].add(dx), pos.y.at[index].add(dy), pos.z.at[index].add(dz)
        )
        self.scene = self.scene._replace(lights=lights._replace(pos=new_pos))
        self.reset_sample_count()

    def render(self, cam: CameraState, frame_seed: int = 0) -> None:
        """Trace one frame and fold it into the accumulator."""
        seed = self._jnp.uint32(frame_seed)
        self.state = self._step(
            self.scene,
            cam,
            self.settings,
            self.state,
            self.pixel_ids,
            seed,
            self.max_leaf,
        )

    def warmup(self, cam: CameraState) -> None:
        """Compile the frame step without executing it (AOT lower+compile).

        With the persistent XLA cache enabled (utils/cache.py) the
        compiled program lands on disk, so the next ``render`` — even
        from a different thread or process — resolves it in seconds.
        The viewer's draft-then-refine startup compiles the production
        step here, in a background thread, while draft frames display.
        """
        jcam = self._jax.tree_util.tree_map(self._jnp.asarray, cam)
        self._step.lower(
            self.scene, jcam, self.settings, self.state, self.pixel_ids,
            self._jnp.uint32(0), self.max_leaf,
        ).compile()

    @property
    def sample_count(self) -> int:
        return int(self.state.sample_count)

    def image(self) -> np.ndarray:
        """Fetch the accumulated image as (H, W, 3) float32 on host,
        top row first (pixel row 0 is the camera-space bottom — +v is up —
        so rows are flipped for display, as the GL blit did implicitly)."""
        h, w = self.settings.height, self.settings.width
        rgb = np.stack(
            [np.asarray(self.state.rgb.x), np.asarray(self.state.rgb.y), np.asarray(self.state.rgb.z)],
            axis=-1,
        )
        return rgb.reshape(h, w, 3)[::-1]

    def depth_image(self) -> np.ndarray:
        h, w = self.settings.height, self.settings.width
        return np.asarray(self.state.depth).reshape(h, w)[::-1]
