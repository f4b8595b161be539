"""Forward/backward split + remat/loop-mode profile of the bench config.

Each configuration logs compile time and steady-state ms/frame as it goes
(partial output stays useful if the tunnel dies). Run on the real chip:

    python tools/prof_fwdbwd.py [--size 1024] [--iters 5] [--frames 4]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.ops import rng as rng_mod
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.scene.procedural import cornell_box
from pbr_tpu.scene.types import Scene
from pbr_tpu.utils.cache import enable_persistent_cache
from pbr_tpu.utils.config import RenderSettings

enable_persistent_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=1024)
ap.add_argument("--iters", type=int, default=5)
ap.add_argument("--frames", type=int, default=4, help="frames per jit step")
args = ap.parse_args()

SIZE, K = args.size, args.frames

obj, mtl, li = cornell_box()
scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
jscene = jax.tree_util.tree_map(jnp.asarray, scene)
jcam = jax.tree_util.tree_map(jnp.asarray, cam)
npx = SIZE * SIZE
ids = jnp.arange(npx, dtype=jnp.int32)

BASE = dict(
    width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=5,
    shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll", compact_schedule=((4, 0.75), (5, 0.12)),
    compact_block=128,
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fwd_step(settings):
    @functools.partial(jax.jit, static_argnames=("settings",))
    def step(scene, cam, ids, seed0, settings):
        def body(acc, k):
            seed = rng_mod.fold(seed0, k)
            res = trace_rays(jnp, scene, cam, settings, ids, seed)
            return acc + res.color.x.sum() + res.color.y.sum() + res.color.z.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
        return acc

    return lambda seed: step(jscene, jcam, ids, seed, settings)


def fwdbwd_step(settings):
    @functools.partial(jax.jit, static_argnames=("settings",))
    def step(scene, cam, ids, seed0, settings):
        tris, bvh = scene.tris, scene.bvh
        params0 = (scene.materials, scene.lights, cam)

        def frame_loss(params, seed):
            mats, lights, camst = params
            sc = Scene(tris=tris, bvh=bvh, materials=mats, lights=lights)
            res = trace_rays(jnp, sc, camst, settings, ids, seed)
            return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

        def body(loss_sum, k):
            seed = rng_mod.fold(seed0, k)
            loss, grads = jax.value_and_grad(frame_loss, allow_int=True)(params0, seed)
            return loss_sum + loss + grads[0].kd.x.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
        return acc

    return lambda seed: step(jscene, jcam, ids, seed, settings)


def measure(name, make, settings):
    fn = make(settings)
    t0 = time.time()
    _ = float(np.asarray(fn(jnp.uint32(1))))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(args.iters):
        out = fn(jnp.uint32(i + 2))
    _ = float(np.asarray(out))
    dt = (time.time() - t0) / (args.iters * K)
    log(f"{name:42s} compile {compile_s:6.1f}s   {dt * 1e3:7.2f} ms/frame")
    return dt


measure("fwd  unroll compact", fwd_step, RenderSettings(**BASE))
measure("fwd+bwd unroll compact (BENCH)", fwdbwd_step, RenderSettings(**BASE))
measure(
    "fwd+bwd unroll compact remat=save_isect",
    fwdbwd_step,
    RenderSettings(**{**BASE, "remat": "save_isect"}),
)
measure(
    "fwd+bwd scan compact",
    fwdbwd_step,
    RenderSettings(**{**BASE, "bounce_loop": "scan"}),
)
measure(
    "fwd+bwd scan compact remat=save_isect",
    fwdbwd_step,
    RenderSettings(**{**BASE, "bounce_loop": "scan", "remat": "save_isect"}),
)
log("done")
