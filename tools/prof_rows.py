"""Measure live-row occupancy per bounce + row-compaction frame time."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.scene.build import scene_from_text
from pbr_tpu.scene.camera import make_camera_state
from pbr_tpu.scene.procedural import cornell_box
from pbr_tpu.utils.config import RenderSettings

SIZE = 1024
obj, mtl, li = cornell_box()
scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
jscene = jax.tree_util.tree_map(jnp.asarray, scene)
jcam = jax.tree_util.tree_map(jnp.asarray, cam)
ids = jnp.arange(SIZE * SIZE, dtype=jnp.int32)

base = dict(
    width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=5,
    shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll",
)

# heat_bounces = per-pixel live-bounce count; lane live at bounce k iff
# heat > k. Derive per-block row occupancy for candidate blocks.
settings = RenderSettings(**base)


@functools.partial(jax.jit, static_argnames=("settings",))
def heat_fn(scene, cam, ids, settings):
    res = trace_rays(jnp, scene, cam, settings, ids, jnp.uint32(1), with_stats=True)
    return res.heat_bounces


heat = np.asarray(heat_fn(jscene, jcam, ids, settings))
for k in range(1, 8):
    live = heat > k
    lane_frac = live.mean()
    msg = f"bounce {k}: lanes {lane_frac:6.3f}"
    for blk in (128, 256, 512):
        rows = live.reshape(-1, blk).any(axis=1)
        msg += f"  rows{blk} {rows.mean():6.3f}"
    print(msg, flush=True)


def timeit(name, settings, iters=5):
    @functools.partial(jax.jit, static_argnames=("settings",))
    def f(scene, cam, ids, seed, settings):
        res = trace_rays(jnp, scene, cam, settings, ids, seed, with_stats=True)
        return res.color.x.sum(), res.n_dropped

    t0 = time.time()
    out = f(jscene, jcam, ids, jnp.uint32(1), settings)
    drop = int(out[1]) if out[1] is not None else 0
    _ = float(np.asarray(out[0]))
    print(f"{name:44s} compile {time.time()-t0:5.1f}s drop={drop}", flush=True)
    t0 = time.time()
    for i in range(iters):
        out = f(jscene, jcam, ids, jnp.uint32(i + 2), settings)
    _ = float(np.asarray(out[0]))
    print(f"{name:44s} {(time.time()-t0)/iters*1e3:9.2f} ms", flush=True)


import ast

for arg in sys.argv[1:]:
    blk, sched = arg.split("@")
    sched = tuple(ast.literal_eval(sched))
    timeit(
        f"rows blk={blk} {sched}",
        RenderSettings(**base, compact_schedule=sched, compact_block=int(blk)),
    )
