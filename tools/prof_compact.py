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
    shadow_rays=0, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll",
)


def timeit(name, settings, iters=5):
    @functools.partial(jax.jit, static_argnames=("settings",))
    def f(scene, cam, ids, seed, settings):
        res = trace_rays(jnp, scene, cam, settings, ids, seed)
        return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

    t0 = time.time()
    _ = float(np.asarray(f(jscene, jcam, ids, jnp.uint32(1), settings)))
    print(f"{name:40s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for i in range(iters):
        out = f(jscene, jcam, ids, jnp.uint32(i + 2), settings)
    _ = float(np.asarray(out))
    print(f"{name:40s} {(time.time()-t0)/iters*1e3:9.2f} ms", flush=True)


for name, sched in [
    ("compact3 only", ((3, 0.25),)),
    ("compact4 only", ((4, 0.0625),)),
]:
    timeit(name, RenderSettings(**base, compact_schedule=sched))
