"""Compaction-schedule search on the real chip (bench config, fwd+bwd).

Measured live-lane fractions on Cornell (256², seed 7): bounce 2 → 74.6%,
bounce 3 → 16.2%, bounce 4 → 2.3%, bounce 5 → 0.05%. Row-live depends on
block size (smaller rows track the lane fraction closer but gather slower):

    bounce      block=8   block=32  block=128
    3 (16.2%)   0.64      0.90      1.00
    4 ( 2.3%)   0.14      0.36      0.70
    5 ( 0.05%)  0.004     0.015     0.051

Each config below trades earlier/tighter row compaction against gather
cost; this tool times them all in one process (shared compile cache),
logging incrementally, and checks drops == 0 (a dropped lane changes the
estimator — caps must clear the real 1024² row-live fractions).

    python tools/prof_compactcfg.py [--size 1024] [--iters 3] [--frames 8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.ops import rng as rng_mod
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.scene.procedural import cornell_box
from pbr_tpu.scene.types import Scene
from pbr_tpu.utils.config import RenderSettings

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=1024)
ap.add_argument("--iters", type=int, default=3)
ap.add_argument("--frames", type=int, default=8)
args = ap.parse_args()

SIZE, K = args.size, args.frames

obj, mtl, li = cornell_box()
scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
jscene = jax.tree_util.tree_map(jnp.asarray, scene)
jcam = jax.tree_util.tree_map(jnp.asarray, cam)
ids = jnp.arange(SIZE * SIZE, dtype=jnp.int32)

BASE = dict(
    width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=5,
    shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll",
)

CONFIGS = [
    ("current 128:(4:.75,5:.12)", 128, ((4, 0.75), (5, 0.12))),
    ("b32 (4:.45,5:.03)", 32, ((4, 0.45), (5, 0.03))),
    ("b32 (3:.93,4:.45,5:.03)", 32, ((3, 0.93), (4, 0.45), (5, 0.03))),
    ("b8  (3:.72,4:.18,5:.015)", 8, ((3, 0.72), (4, 0.18), (5, 0.015))),
    ("b128 (4:.72,5:.06)", 128, ((4, 0.72), (5, 0.06))),
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


@functools.partial(jax.jit, static_argnames=("settings",))
def count_fn(scene, cam, ids, seed, settings):
    res = trace_rays(jnp, scene, cam, settings, ids, seed, with_stats=True)
    return res.n_path_rays, res.n_shadow_rays, res.n_dropped


@functools.partial(jax.jit, static_argnames=("settings",))
def step(scene, cam, ids, seed0, settings):
    tris, bvh = scene.tris, scene.bvh
    params0 = (scene.materials, scene.lights, cam)

    def frame_loss(params, seed):
        mats, lights, camst = params
        sc = Scene(tris=tris, bvh=bvh, materials=mats, lights=lights)
        res = trace_rays(jnp, sc, camst, settings, ids, seed)
        return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

    def body(acc, k):
        seed = rng_mod.fold(seed0, k)
        loss, grads = jax.value_and_grad(frame_loss, allow_int=True)(params0, seed)
        return acc + loss + grads[0].kd.x.sum(), None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
    return acc


for name, block, sched in CONFIGS:
    settings = RenderSettings(**BASE, compact_schedule=sched, compact_block=block)
    try:
        t0 = time.time()
        n_path, n_shadow, n_drop = count_fn(jscene, jcam, ids, jnp.uint32(0), settings)
        rays = int(n_path) + int(n_shadow)
        drops = int(n_drop)
        log(f"{name:28s} count: {rays} rays/frame, drops={drops} ({time.time()-t0:.0f}s)")
        if drops:
            log(f"{name:28s} SKIP timing — caps too tight (drops>0)")
            continue
        t0 = time.time()
        _ = float(np.asarray(step(jscene, jcam, ids, jnp.uint32(1), settings)))
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            out = step(jscene, jcam, ids, jnp.uint32(i + 2), settings)
        _ = float(np.asarray(out))
        dt = (time.time() - t0) / (args.iters * K)
        log(
            f"{name:28s} compile {compile_s:6.1f}s  {dt*1e3:7.2f} ms/frame  "
            f"{rays/dt/1e6:7.1f} M rays/s"
        )
    except Exception as e:
        log(f"{name:28s} FAILED: {type(e).__name__}: {e}")
log("done")
