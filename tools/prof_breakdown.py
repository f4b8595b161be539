"""Ad-hoc perf breakdown: time intersect / shadow / shade components
separately on the bench config (1024x1024 cornell, fwd only)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.ops.pallas_intersect import intersect_pallas
from pbr_tpu.ops.traverse import intersect_brute
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.scene.procedural import cornell_box
from pbr_tpu.utils.config import RenderSettings

SIZE = 1024
K = 8

obj, mtl, li = cornell_box()
scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
jscene = jax.tree_util.tree_map(jnp.asarray, scene)
jcam = jax.tree_util.tree_map(jnp.asarray, cam)
npx = SIZE * SIZE
ids = jnp.arange(npx, dtype=jnp.int32)

print(f"tris: {scene.tris.v0.x.shape[0]}")


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[0], out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[0], out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


key = jax.random.PRNGKey(0)
o = Vec3(*[jax.random.normal(jax.random.fold_in(key, i), (npx,)) for i in range(3)])
d = Vec3(*[jax.random.normal(jax.random.fold_in(key, 3 + i), (npx,)) for i in range(3)])


@jax.jit
def pallas_x8(o, d):
    def body(acc, k):
        t, f = intersect_pallas(jnp, o, d, jscene.tris)
        return acc + t.sum() + f.sum(), None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(8))
    return acc


@jax.jit
def brute_x8(o, d):
    def body(acc, k):
        t, f = intersect_brute(jnp, o, d, jscene.tris)
        return acc + t.sum() + f.sum(), None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(8))
    return acc


timeit("pallas intersect x8 (1M rays)", pallas_x8, o, d)
timeit("xla brute intersect x8 (1M rays)", brute_x8, o, d)


def frame(settings):
    @functools.partial(jax.jit, static_argnames=("settings",))
    def f(scene, cam, ids, seed, settings):
        res = trace_rays(jnp, scene, cam, settings, ids, seed)
        return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

    return lambda: f(jscene, jcam, ids, jnp.uint32(1), settings)


base = dict(
    width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=5,
    shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll",
    compact_schedule=((3, 0.25), (4, 0.0625)),
)

timeit("frame full (nee on)", frame(RenderSettings(**base)))
timeit("frame no NEE", frame(RenderSettings(**{**base, "shadow_rays": 0})))
timeit(
    "frame depth1 no NEE",
    frame(RenderSettings(**{**base, "shadow_rays": 0, "max_depth": 1, "max_added_depth": 0, "compact_schedule": ()})),
)
timeit(
    "frame depth3 only no-ext no NEE",
    frame(RenderSettings(**{**base, "shadow_rays": 0, "max_added_depth": 0, "compact_schedule": ()})),
)
timeit(
    "frame full-width 8 bounces no NEE",
    frame(RenderSettings(**{**base, "shadow_rays": 0, "compact_schedule": ()})),
)
timeit(
    "frame full-width 8 bounces NEE",
    frame(RenderSettings(**{**base, "compact_schedule": ()})),
)

timeit(
    "frame compact 3 only no NEE",
    frame(RenderSettings(**{**base, "shadow_rays": 0, "compact_schedule": ((3, 0.25),)})),
)
timeit(
    "frame compact 4 only no NEE",
    frame(RenderSettings(**{**base, "shadow_rays": 0, "compact_schedule": ((4, 0.0625),)})),
)
timeit(
    "frame scan full-width NEE",
    frame(RenderSettings(**{**base, "bounce_loop": "scan", "compact_schedule": ()})),
)

from pbr_tpu.models.integrator import _compact_rows  # noqa: E402


@jax.jit
def compact_x8(alive):
    def body(acc, k):
        src, slot, n_ok, n_drop = _compact_rows(jnp, alive, 128, 2048)
        return acc + src.sum() + slot.sum() + n_ok + n_drop, None

    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(8))
    return acc


alive = (o.x > 0.5)
timeit("compact_rows x8 (1M lanes)", compact_x8, alive)
