"""Device-level op profile of the bench step (jax.profiler + xprof).

Captures an XLA trace of the exact BENCH fwd+bwd step on the real chip and
prints the top HLO ops by self time — the ground truth for where the
28.66 ms/frame actually goes (theory about VPU op counts has been wrong
twice; this isn't). The analog of the reference's per-kernel OpenCL event
profiling (source/CL.cpp:480-488, InfoWindow.cpp:113-121), at HLO-op
granularity.

    python tools/prof_trace.py [--size 1024] [--fwd-only] [--top 40]
"""

import argparse
import functools
import glob
import json
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
ap.add_argument("--fwd-only", action="store_true")
ap.add_argument("--top", type=int, default=40)
ap.add_argument("--outdir", default="/tmp/pbr_trace")
args = ap.parse_args()

SIZE = args.size
obj, mtl, li = cornell_box()
scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
cam = make_camera_state(eye=(0.0, 1.0, 3.2), center_dir=(0.0, 0.0, 1.0))
jscene = jax.tree_util.tree_map(jnp.asarray, scene)
jcam = jax.tree_util.tree_map(jnp.asarray, cam)
ids = jnp.arange(SIZE * SIZE, dtype=jnp.int32)
settings = RenderSettings(
    width=SIZE, height=SIZE, samples=1, max_depth=3, max_added_depth=5,
    shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
    bounce_loop="unroll", compact_schedule=((4, 0.73), (5, 0.07)),
    compact_block=128,
)
from pbr_tpu.scene.build import derive_static_flags

settings = derive_static_flags(scene, settings)  # trace the shipped program


@functools.partial(jax.jit, static_argnames=("settings",))
def step_fwd(scene, cam, ids, seed, settings):
    res = trace_rays(jnp, scene, cam, settings, ids, seed)
    return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()


@functools.partial(jax.jit, static_argnames=("settings",))
def step_fwdbwd(scene, cam, ids, seed, settings):
    # FULL gradient set (materials + lights + camera), matching bench.py's
    # metric exactly — a kd.x-only loss lets XLA dead-code most of the
    # backward (~6.6 ms/frame lighter than the real thing).
    tris, bvh = scene.tris, scene.bvh
    params0 = (scene.materials, scene.lights, cam)

    def frame_loss(params):
        mats, lights, camst = params
        sc = Scene(tris=tris, bvh=bvh, materials=mats, lights=lights)
        res = trace_rays(jnp, sc, camst, settings, ids, seed)
        return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

    loss, grads = jax.value_and_grad(frame_loss, allow_int=True)(params0)
    leaves = [
        g.sum() for g in jax.tree_util.tree_leaves(grads)
        if hasattr(g, "dtype") and g.dtype != jax.dtypes.float0
    ]
    return loss + sum(leaves)


step = step_fwd if args.fwd_only else step_fwdbwd


def run(seed):
    return float(np.asarray(step(jscene, jcam, ids, jnp.uint32(seed), settings)))


t0 = time.time()
run(1)
print(f"[prof_trace] compile+first: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
run(2)
print(f"[prof_trace] steady: {(time.time() - t0) * 1e3:.2f} ms", flush=True)

os.makedirs(args.outdir, exist_ok=True)
with jax.profiler.trace(args.outdir):
    run(3)
    run(4)

paths = sorted(glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True))
print(f"[prof_trace] xplane files: {paths}", flush=True)

from xprof.convert import raw_to_tool_data

for tool in ("hlo_stats", "framework_op_stats"):
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
    except Exception as e:
        print(f"[prof_trace] {tool} failed: {type(e).__name__}: {e}", flush=True)
        continue
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out = os.path.join(args.outdir, f"{tool}.json")
    with open(out, "w") as f:
        f.write(data)
    print(f"[prof_trace] wrote {out} ({len(data)} bytes)", flush=True)
    # hlo_stats comes back as gviz JSON; print the top rows by self time.
    try:
        j = json.loads(data)
        cols = [c.get("label", c.get("id", "?")) for c in j["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in j["rows"]]
        # find the self-time column
        cand = [i for i, c in enumerate(cols) if "self" in str(c).lower() and "time" in str(c).lower()]
        tcol = cand[0] if cand else None
        if tcol is not None:
            rows.sort(key=lambda r: -(r[tcol] or 0.0))
        print(f"[prof_trace] {tool} columns: {cols}", flush=True)
        for r in rows[: args.top]:
            print("  ", r, flush=True)
    except Exception as e:
        print(f"[prof_trace] {tool} parse note: {type(e).__name__}: {e}", flush=True)
print("[prof_trace] done", flush=True)
