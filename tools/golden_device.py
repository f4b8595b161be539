"""Device golden: production-scale on-chip frame + grad parity vs oracle.

VERDICT r3 item 6: the cull-family dispatch needed a production-scale
golden (round 3 had only a 128² frame) and a gradient golden. This tool:

1. renders ONE frame of the target scene on the REAL chip through the
   chosen intersector and compares per-pixel against the CPU numpy
   backend (the oracle the golden tests pin — itself validated against
   the independent scalar oracle, tests/test_scalar_oracle.py) with the
   standard gate: >= 99% of pixels within 1e-3 on every channel;
2. computes gradients (materials.kd, lights.rgb, camera.eye — the
   BASELINE.json targets) through the chosen intersector AND through the
   brute kernel on a smaller crop, asserting aggregate parity — the
   detached-search + re-eval contract means grads must agree wherever
   face choices do (ULP-flip pixels give the tolerance).

Writes docs/GOLDEN_DEVICE_r{round}.json. Usage:
    python tools/golden_device.py [suzanne|soup:N] [size] [intersector]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    scene_tag = sys.argv[1] if len(sys.argv) > 1 else "suzanne"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    isect = sys.argv[3] if len(sys.argv) > 3 else "gated"

    import jax
    import jax.numpy as jnp

    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.utils.cache import enable_persistent_cache
    from pbr_tpu.utils.config import RenderSettings

    enable_persistent_cache()
    assert jax.default_backend() != "cpu", "golden_device needs the real chip"

    if scene_tag == "suzanne":
        from pbr_tpu.io.loader import load_model

        scene, lset, _ = load_model(
            "/root/reference/resources/models/testing/suzanne.obj",
            RenderSettings(shadow_rays=1),
        )
        cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
        sky = lset.sky_light
    else:
        from pbr_tpu.scene.build import scene_from_text
        from pbr_tpu.scene.procedural import random_soup

        n = int(scene_tag.split(":")[1])
        scene, _ = scene_from_text(random_soup(n, seed=7), use_bvh=True)
        cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
        sky = (0.85, 0.9, 1.0)

    report = {"scene": scene_tag, "size": size, "intersector": isect}

    # ---- frame golden ----------------------------------------------------
    settings = RenderSettings(
        width=size, height=size, samples=1, max_depth=3, max_added_depth=5,
        shadow_rays=1, anti_aliasing=0.7, sky_light=sky, intersector=isect,
    )
    ids = np.arange(size * size, dtype=np.int32)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)

    @functools.partial(jax.jit, static_argnames=("settings",))
    def frame(scene, cam, ids, settings):
        res = trace_rays(jnp, scene, cam, settings, ids, jnp.uint32(7))
        return res.color.x, res.color.y, res.color.z

    t0 = time.time()
    dx, dy, dz = frame(jscene, jcam, jnp.asarray(ids), settings)
    dev = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], axis=-1)
    t_dev = time.time() - t0
    print(f"[golden] device frame in {t_dev:.1f}s (incl. compile)")

    t0 = time.time()
    # The numpy oracle frame is intersector-independent: cache it per
    # (scene, size) so the gated and cull runs share one computation.
    cache = f"/tmp/golden_cpu_{scene_tag.replace(':', '')}_{size}.npy"
    if os.path.exists(cache):
        cpu = np.load(cache)
        print(f"[golden] cpu oracle frame from cache {cache}")
    else:
        res_cpu = trace_rays(
            np, scene, cam, settings.replace(intersector="bvh"), ids, 7
        )
        cpu = np.stack([res_cpu.color.x, res_cpu.color.y, res_cpu.color.z], -1)
        np.save(cache, cpu)
        print(f"[golden] cpu oracle frame in {time.time() - t0:.1f}s")

    diff = np.abs(dev - cpu).max(axis=-1)
    frac_ok = float((diff <= 1e-3).mean())
    report["frame"] = {
        "frac_within_1e3": round(frac_ok, 5),
        "median_diff": float(np.median(diff)),
        "p999_diff": float(np.percentile(diff, 99.9)),
        "pass": frac_ok >= 0.99,
    }
    print(
        f"[golden] frame: {frac_ok:.2%} pixels within 1e-3 "
        f"(median {np.median(diff):.2e}) -> "
        + ("PASS" if frac_ok >= 0.99 else "FAIL")
    )

    # ---- grad golden (crop) ---------------------------------------------
    gsize = 128
    gids = jnp.arange(gsize * gsize, dtype=jnp.int32)
    gset = settings.replace(width=gsize, height=gsize)
    bset = gset.replace(intersector="pallas")

    @functools.partial(jax.jit, static_argnames=("settings",))
    def grads(scene, cam, ids, settings):
        def loss(params):
            mats, lights, camst = params
            sc = scene._replace(materials=mats, lights=lights)
            res = trace_rays(jnp, sc, camst, settings, ids, jnp.uint32(7))
            return res.color.x.sum() + res.color.y.sum() + res.color.z.sum()

        g = jax.grad(loss, allow_int=True)((scene.materials, scene.lights, cam))
        return g[0].kd.x, g[0].kd.y, g[1].rgb.x, g[2].eye.x, g[2].eye.y

    ga = [np.asarray(v) for v in grads(jscene, jcam, gids, gset)]
    gb = [np.asarray(v) for v in grads(jscene, jcam, gids, bset)]
    rel = [
        float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
        for a, b in zip(ga, gb)
    ]
    gpass = all(r < 2e-2 for r in rel)
    report["grads"] = {
        "names": ["kd.x", "kd.y", "light.rgb.x", "cam.eye.x", "cam.eye.y"],
        "rel_diff_vs_brute": [round(r, 6) for r in rel],
        "pass": gpass,
    }
    print(f"[golden] grads rel diff vs brute: {rel} -> " + ("PASS" if gpass else "FAIL"))

    out = f"docs/GOLDEN_DEVICE_{scene_tag.replace(':', '')}_{isect}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[golden] wrote {out}")
    sys.exit(0 if (report["frame"]["pass"] and gpass) else 1)


if __name__ == "__main__":
    main()
