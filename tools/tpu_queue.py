"""Sequential TPU measurement queue (run when the tunneled chip is healthy).

Runs each step in-process, logging to stdout; a step failure (compile error)
is caught and logged so later steps still run. Never kill this mid-compile —
interrupting an in-flight remote compile wedges the tunnel.

Usage: python tools/tpu_queue.py [step ...]   (default: all)
Steps: probe pallas_bvh crossover
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def step_probe():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((512, 512))
    v = float((x @ x).sum())
    log(f"probe ok: {v} in {time.time() - t0:.1f}s on {jax.devices()}")


def _rays(n, seed=3, lo=-0.8, hi=0.8):
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.vec import Vec3

    rng = np.random.default_rng(seed)
    o = Vec3(*[jnp.asarray(rng.uniform(lo, hi, n), jnp.float32) for _ in range(3)])
    dn = rng.normal(size=(3, n)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    return o, Vec3(*[jnp.asarray(c) for c in dn])


def step_pallas_bvh():
    """Validate the packet BVH kernel compiles + matches on the real chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet
    from pbr_tpu.ops.traverse import intersect_brute
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import cornell_box

    obj, mtl, li = cornell_box()
    scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    o, d = _rays(8192)

    t0 = time.time()
    fn = jax.jit(
        lambda o, d: intersect_bvh_packet(jnp, o, d, jscene.bvh, jscene.tris)
    )
    t, f = fn(o, d)
    f_host = np.asarray(f)
    log(f"pallas_bvh compile+run: {time.time() - t0:.1f}s")
    t_b, f_b = jax.jit(lambda o, d: intersect_brute(jnp, o, d, jscene.tris))(o, d)
    match = (f_host == np.asarray(f_b)).mean()
    log(f"pallas_bvh vs brute face agreement: {match:.4f}")
    assert match > 0.9999, match

    # NEE-fused variant
    lp = Vec3(jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2))
    t0 = time.time()
    fn2 = jax.jit(
        lambda o, d: intersect_bvh_packet(
            jnp, o, d, jscene.bvh, jscene.tris, light_pos=lp
        )
    )
    t2, f2, occ = fn2(o, d)
    occ_frac = float(np.asarray(occ).mean())
    log(f"pallas_bvh NEE compile+run: {time.time() - t0:.1f}s, occ frac {occ_frac:.3f}")
    log("pallas_bvh OK on TPU")


def _time_fn(fn, *args, iters=10):
    import numpy as np

    out = fn(*args)
    _sync = np.asarray(out[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync = np.asarray(out[0]).ravel()[:1]
    return (time.time() - t0) / iters


def step_crossover():
    """Measured intersector crossover: brute pallas / packet bvh / XLA walk
    at several scene sizes, 1M rays (the auto-dispatch policy evidence)."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet, packet_fits
    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.ops.traverse import intersect_bvh_chunked
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import cornell_box, random_soup

    n_rays = 1 << 20

    def scene_for(tag):
        if tag == "cornell":
            obj, mtl, li = cornell_box()
            scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
        else:
            scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=True)
        return jax.tree_util.tree_map(jnp.asarray, scene)

    for tag in ("cornell", "1000", "4000", "10000", "100000"):
        jscene = scene_for(tag)
        nf = int(jscene.tris.mtl.shape[0])
        o, d = _rays(n_rays, lo=-1.2, hi=1.2)
        rows = []
        if nf <= 4000:
            try:
                dt = _time_fn(
                    jax.jit(lambda o, d: intersect_pallas(jnp, o, d, jscene.tris)),
                    o, d,
                )
                rows.append(("brute_pallas", dt))
            except Exception as e:
                log(f"  brute_pallas failed: {type(e).__name__}")
        if packet_fits(jscene.bvh, jscene.tris):
            try:
                dt = _time_fn(
                    jax.jit(
                        lambda o, d: intersect_bvh_packet(
                            jnp, o, d, jscene.bvh, jscene.tris
                        )
                    ),
                    o, d,
                )
                rows.append(("packet_bvh", dt))
            except Exception as e:
                log(f"  packet_bvh failed: {type(e).__name__}")
        try:
            dt = _time_fn(
                jax.jit(
                    lambda o, d: intersect_bvh_chunked(
                        jnp, o, d, jscene.bvh, jscene.tris
                    )
                ),
                o, d,
            )
            rows.append(("xla_walk", dt))
        except Exception as e:
            log(f"  xla_walk failed: {type(e).__name__}")
        for name, dt in rows:
            log(
                f"crossover {tag:8s} ({nf:6d} tris) {name:13s} "
                f"{dt * 1e3:8.2f} ms  {n_rays / dt / 1e6:8.1f} M rays/s"
            )


def _camera_rays(n_side=1024, eye=(0.0, 0.0, 3.5)):
    """Coherent primary rays: one pinhole ray per pixel of an n_side² grid
    (the render workload's shape, vs the adversarial random rays above)."""
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.vec import Vec3

    xs = (np.arange(n_side) + 0.5) / n_side * 2.0 - 1.0
    gx, gy = np.meshgrid(xs, xs)
    dx = gx.reshape(-1).astype(np.float32) * 0.6
    dy = gy.reshape(-1).astype(np.float32) * 0.6
    dz = np.full_like(dx, -1.0)
    inv = 1.0 / np.sqrt(dx * dx + dy * dy + dz * dz)
    o = Vec3(
        jnp.full((n_side * n_side,), eye[0], jnp.float32),
        jnp.full((n_side * n_side,), eye[1], jnp.float32),
        jnp.full((n_side * n_side,), eye[2], jnp.float32),
    )
    d = Vec3(jnp.asarray(dx * inv), jnp.asarray(dy * inv), jnp.asarray(dz * inv))
    return o, d


def step_coherent():
    """Same intersector sweep with COHERENT primary rays."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet, packet_fits
    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.ops.traverse import intersect_bvh_chunked
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    o, d = _camera_rays()
    n_rays = int(o.x.shape[0])
    for tag in ("1000", "4000", "10000", "100000"):
        scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=True)
        jscene = jax.tree_util.tree_map(jnp.asarray, scene)
        nf = int(jscene.tris.mtl.shape[0])
        rows = []
        if nf <= 10000:
            try:
                dt = _time_fn(
                    jax.jit(lambda o, d: intersect_pallas(jnp, o, d, jscene.tris)),
                    o, d,
                )
                rows.append(("brute_pallas", dt))
            except Exception as e:
                log(f"  brute_pallas failed: {type(e).__name__}")
        if packet_fits(jscene.bvh, jscene.tris):
            try:
                dt = _time_fn(
                    jax.jit(
                        lambda o, d: intersect_bvh_packet(
                            jnp, o, d, jscene.bvh, jscene.tris
                        )
                    ),
                    o, d,
                )
                rows.append(("packet_bvh", dt))
            except Exception as e:
                log(f"  packet_bvh failed: {type(e).__name__}")
        try:
            dt = _time_fn(
                jax.jit(
                    lambda o, d: intersect_bvh_chunked(
                        jnp, o, d, jscene.bvh, jscene.tris
                    )
                ),
                o, d,
            )
            rows.append(("xla_walk", dt))
        except Exception as e:
            log(f"  xla_walk failed: {type(e).__name__}")
        for name, dt in rows:
            log(
                f"coherent {tag:8s} ({nf:6d} tris) {name:13s} "
                f"{dt * 1e3:8.2f} ms  {n_rays / dt / 1e6:8.1f} M rays/s"
            )


def step_sweeplin():
    """mt vs lin fused-NEE sweep microbench at the bench's bounce width
    (1M rays) — evidence for intersect_pallas' default variant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import cornell_box, random_soup

    lp = Vec3(jnp.float32(0.0), jnp.float32(1.8), jnp.float32(0.2))
    for tag in ("cornell", "1000", "4000"):
        if tag == "cornell":
            obj, mtl, li = cornell_box()
            scene, _ = scene_from_text(obj, mtl, li, use_bvh=False)
        else:
            scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=False)
        jscene = jax.tree_util.tree_map(jnp.asarray, scene)
        nf = int(jscene.tris.mtl.shape[0])
        o, d = _rays(1 << 20)
        faces = {}
        for variant in ("mt", "lin"):
            for nee in (False, True):
                try:
                    if nee:
                        fn = jax.jit(
                            functools_partial_isect(jscene, variant, lp)
                        )
                    else:
                        fn = jax.jit(functools_partial_isect(jscene, variant, None))
                    dt = _time_fn(fn, o, d)
                    out = fn(o, d)
                    faces[(variant, nee)] = np.asarray(out[1])
                    log(
                        f"sweeplin {tag:8s} ({nf:5d} tris) {variant}"
                        f"{'+nee' if nee else '    '}  {dt * 1e3:8.2f} ms  "
                        f"{(1 << 20) / dt / 1e6:8.1f} M rays/s"
                    )
                except Exception as e:
                    log(f"  {variant} nee={nee} failed: {type(e).__name__}: {e}")
        if ("mt", False) in faces and ("lin", False) in faces:
            agree = (faces[("mt", False)] == faces[("lin", False)]).mean()
            log(f"sweeplin {tag:8s} face agreement mt-vs-lin: {agree:.5f}")


def functools_partial_isect(jscene, variant, lp):
    import jax.numpy as jnp

    from pbr_tpu.ops.pallas_intersect import intersect_pallas

    if lp is not None:
        return lambda o, d: intersect_pallas(
            jnp, o, d, jscene.tris, light_pos=lp, variant=variant
        )
    return lambda o, d: intersect_pallas(jnp, o, d, jscene.tris, variant=variant)


def step_soup100k():
    """Isolate the soup:100k worker crash: standalone chunked walk, then
    the integrator fwd at growing sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.ops.traverse import intersect_bvh_chunked
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.scene.procedural import random_soup
    from pbr_tpu.utils.config import RenderSettings

    scene, _ = scene_from_text(random_soup(100_000, seed=11), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    log(f"bvh nodes {jscene.bvh.count}")

    o, d = _rays(1 << 20, lo=-1.2, hi=1.2)
    t0 = time.time()
    fn = jax.jit(
        lambda o, d: intersect_bvh_chunked(jnp, o, d, jscene.bvh, jscene.tris)
    )
    t, f = fn(o, d)
    hits = int((np.asarray(f) >= 0).sum())
    log(f"standalone chunked walk 1M rays: {time.time()-t0:.1f}s "
        f"(compile+run), {hits} hits")
    dt = _time_fn(fn, o, d, iters=3)
    log(f"standalone chunked walk: {dt*1e3:.1f} ms -> {(1<<20)/dt/1e6:.2f} M rays/s")

    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    for size in (256, 512, 1024):
        st = RenderSettings(
            width=size, height=size, samples=1, max_depth=3, max_added_depth=5,
            shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
            bounce_loop="unroll",
            compact_schedule=((4, 0.73), (5, 0.07)), compact_block=128,
        )
        ids = jnp.arange(size * size, dtype=jnp.int32)

        @jax.jit
        def fwd(scene, cam, ids, seed):
            r = trace_rays(jnp, scene, cam, st, ids, seed)
            return r.color.x.sum() + r.color.y.sum() + r.color.z.sum()

        t0 = time.time()
        v = float(np.asarray(fwd(jscene, jcam, ids, jnp.uint32(1))))
        log(f"integrator fwd {size}x{size}: {time.time()-t0:.1f}s "
            f"compile+first, loss={v:.3f}")


def step_packet100k():
    """Validate + time the packed-table packet kernel on the 100k-tri soup
    (coarse 16-face leaves) — the big-scene path the chunked XLA walk
    cannot serve (0.03 M rays/s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.pallas_bvh import intersect_bvh_packet_hbm, packet_hbm_fits
    from pbr_tpu.ops.traverse import intersect_brute
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import bvh_max_leaf, scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    scene, _ = scene_from_text(random_soup(100_000, seed=11), use_bvh=True)
    ml = bvh_max_leaf(scene)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    log(f"bvh nodes {jscene.bvh.count}, max_leaf {ml}, "
        f"packet_hbm_fits {packet_hbm_fits(jscene.bvh)}")

    for tag, n in (("64k", 1 << 16), ("1M", 1 << 20)):
        o, d = _rays(n, lo=-1.2, hi=1.2)
        t0 = time.time()
        fn = jax.jit(
            lambda o, d: intersect_bvh_packet_hbm(
                jnp, o, d, jscene.bvh, jscene.tris, max_leaf=ml
            )
        )
        t, f = fn(o, d)
        hits = int((np.asarray(f) >= 0).sum())
        log(f"packet_hbm {tag}: compile+run {time.time()-t0:.1f}s, {hits} hits")
        if tag == "64k":
            # correctness on-chip: face agreement vs the brute sweep
            t_b, f_b = jax.jit(
                lambda o, d: intersect_brute(jnp, o, d, jscene.tris)
            )(o, d)
            agree = float((np.asarray(f) == np.asarray(f_b)).mean())
            log(f"packet_hbm 64k face agreement vs brute: {agree:.5f}")
        dt = _time_fn(fn, o, d, iters=3)
        log(f"packet_hbm {tag}: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} M rays/s")

    # NEE-fused variant at 1M rays.
    lp = Vec3(jnp.float32(0.0), jnp.float32(2.4), jnp.float32(0.0))
    o, d = _rays(1 << 20, lo=-1.2, hi=1.2)
    t0 = time.time()
    fn2 = jax.jit(
        lambda o, d: intersect_bvh_packet_hbm(
            jnp, o, d, jscene.bvh, jscene.tris, max_leaf=ml, light_pos=lp
        )
    )
    t, f, occ = fn2(o, d)
    log(f"packet_hbm+nee 1M: compile+run {time.time()-t0:.1f}s, "
        f"occ frac {float(np.asarray(occ).mean()):.3f}")
    dt = _time_fn(fn2, o, d, iters=3)
    log(f"packet_hbm+nee 1M: {dt*1e3:.1f} ms -> {(1<<20)/dt/1e6:.2f} M rays/s")


def step_forest_tiny():
    """Safe bring-up probe for the forest kernels (wedge protocol,
    .claude/skills/verify/SKILL.md): smallest real forest (2 chunks),
    8k rays, nearest then the NEW standalone shadow kernel. Run this in
    the background with a 3-4 min decision point before any big config."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.ops.pallas_bvh import intersect_bvh_forest
    from pbr_tpu.ops.traverse import intersect_brute
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    scene, _ = scene_from_text(random_soup(12_000, seed=11), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    log(f"forest chunks {len(jscene.forest.bvhs)}, "
        f"nodes/chunk {jscene.forest.bvhs[0].count}")

    o, d = _rays(1 << 13, lo=-1.2, hi=1.2)
    t0 = time.time()
    fn = jax.jit(
        lambda o, d: intersect_bvh_forest(jnp, o, d, jscene.forest, jscene.bvh)
    )
    t, f = fn(o, d)
    hits = int((np.asarray(f) >= 0).sum())
    log(f"forest tiny nearest: compile+run {time.time()-t0:.1f}s, {hits} hits")
    t_b, f_b = jax.jit(lambda o, d: intersect_brute(jnp, o, d, jscene.tris))(o, d)
    agree = float((np.asarray(f) == np.asarray(f_b)).mean())
    log(f"forest tiny face agreement vs brute: {agree:.5f}")

    lp = Vec3(jnp.float32(0.0), jnp.float32(2.4), jnp.float32(0.0))
    t0 = time.time()
    fn2 = jax.jit(
        lambda o, d: intersect_bvh_forest(
            jnp, o, d, jscene.forest, jscene.bvh, light_pos=lp
        )
    )
    t, f, occ = fn2(o, d)
    log(f"forest tiny nee: compile+run {time.time()-t0:.1f}s, "
        f"occ frac {float(np.asarray(occ).mean()):.3f}")


def step_forest100k():
    """Time the forest intersector on the 100k-tri soup — the big-scene
    leg (milestone config 5) the chunked walk cannot serve (0.03 M rays/s,
    docs/PERF.md). Standalone 1M-ray nearest + NEE, then the full
    integrator fwd via auto dispatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.ops.pallas_bvh import intersect_bvh_forest
    from pbr_tpu.ops.traverse import intersect_brute
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.scene.procedural import random_soup
    from pbr_tpu.utils.config import RenderSettings

    scene, _ = scene_from_text(random_soup(100_000, seed=11), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    log(f"forest chunks {len(jscene.forest.bvhs)}, "
        f"nodes/chunk {jscene.forest.bvhs[0].count}")

    o, d = _rays(1 << 16, lo=-1.2, hi=1.2)
    fn = jax.jit(
        lambda o, d: intersect_bvh_forest(jnp, o, d, jscene.forest, jscene.bvh)
    )
    t0 = time.time()
    t, f = fn(o, d)
    log(f"forest 64k nearest: compile+run {time.time()-t0:.1f}s")
    t_b, f_b = jax.jit(lambda o, d: intersect_brute(jnp, o, d, jscene.tris))(o, d)
    agree = float((np.asarray(f) == np.asarray(f_b)).mean())
    log(f"forest 64k face agreement vs brute: {agree:.5f}")

    o, d = _rays(1 << 20, lo=-1.2, hi=1.2)
    t0 = time.time()
    t, f = fn(o, d)
    log(f"forest 1M nearest: compile+run {time.time()-t0:.1f}s")
    dt = _time_fn(fn, o, d, iters=3)
    log(f"forest 1M nearest: {dt*1e3:.1f} ms -> {(1<<20)/dt/1e6:.2f} M rays/s")

    lp = Vec3(jnp.float32(0.0), jnp.float32(2.4), jnp.float32(0.0))
    fn2 = jax.jit(
        lambda o, d: intersect_bvh_forest(
            jnp, o, d, jscene.forest, jscene.bvh, light_pos=lp
        )
    )
    t0 = time.time()
    t, f, occ = fn2(o, d)
    log(f"forest 1M nee: compile+run {time.time()-t0:.1f}s, "
        f"occ frac {float(np.asarray(occ).mean()):.3f}")
    dt = _time_fn(fn2, o, d, iters=3)
    log(f"forest 1M nee: {dt*1e3:.1f} ms -> {(1<<20)/dt/1e6:.2f} M rays/s")

    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    for size in (256, 1024):
        st = RenderSettings(
            width=size, height=size, samples=1, max_depth=3, max_added_depth=5,
            shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
            bounce_loop="unroll",
            compact_schedule=((4, 0.73), (5, 0.07)), compact_block=128,
        )
        ids = jnp.arange(size * size, dtype=jnp.int32)

        @jax.jit
        def fwd(scene, cam, ids, seed):
            r = trace_rays(jnp, scene, cam, st, ids, seed)
            return (r.color.x.sum() + r.color.y.sum() + r.color.z.sum(),)

        t0 = time.time()
        v = float(np.asarray(fwd(jscene, jcam, ids, jnp.uint32(1))[0]))
        log(f"integrator fwd {size}x{size} (auto->forest): "
            f"{time.time()-t0:.1f}s compile+first, loss={v:.3f}")
        dt = _time_fn(fwd, jscene, jcam, ids, jnp.uint32(1), iters=3)
        log(f"integrator fwd {size}x{size}: {dt*1e3:.1f} ms/frame")


def step_forest_frame():
    """Integrator-only steady-state timing on the 100k-tri soup with the
    forest auto-dispatch — the servable big-scene frame rate (the chunked
    XLA walk killed the TPU worker at this config, docs/PERF.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbr_tpu.models.integrator import trace_rays
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.camera import make_camera_state
    from pbr_tpu.scene.procedural import random_soup
    from pbr_tpu.utils.config import RenderSettings
    from pbr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    scene, _ = scene_from_text(random_soup(100_000, seed=11), use_bvh=True)
    jscene = jax.tree_util.tree_map(jnp.asarray, scene)
    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    jcam = jax.tree_util.tree_map(jnp.asarray, cam)
    for size in (256, 1024):
        st = RenderSettings(
            width=size, height=size, samples=1, max_depth=3, max_added_depth=5,
            shadow_rays=1, anti_aliasing=0.7, sky_light=(0.85, 0.9, 1.0),
            bounce_loop="unroll",
            compact_schedule=((4, 0.73), (5, 0.07)), compact_block=128,
        )
        ids = jnp.arange(size * size, dtype=jnp.int32)

        @jax.jit
        def fwd(scene, cam, ids, seed):
            r = trace_rays(jnp, scene, cam, st, ids, seed, with_stats=True)
            return (
                r.color.x.sum() + r.color.y.sum() + r.color.z.sum(),
                r.n_path_rays, r.n_shadow_rays,
            )

        t0 = time.time()
        v, n_path, n_shadow = fwd(jscene, jcam, ids, jnp.uint32(1))
        v = float(np.asarray(v))
        rays = int(n_path) + int(n_shadow)
        log(f"integrator fwd {size}x{size} (auto->forest): "
            f"{time.time()-t0:.1f}s compile+first, loss={v:.3f}, "
            f"{rays} rays/frame")
        dt = _time_fn(fwd, jscene, jcam, ids, jnp.uint32(1), iters=3)
        log(f"integrator fwd {size}x{size}: {dt*1e3:.1f} ms/frame -> "
            f"{rays/dt/1e6:.2f} M rays/s")


def step_forest_leaf():
    """Sub-BVH leaf-size tradeoff on the 100k soup: the packet kernel
    unrolls max_leaf masked MT tests on EVERY node step (inner nodes waste
    them), so smaller leaves cut per-step cost but deepen the walk.
    Standalone forest intersect, coherent camera rays + adversarial random
    rays, max_faces ∈ {2, 4, 8}."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.accel.forest import build_forest
    from pbr_tpu.ops.pallas_bvh import intersect_bvh_forest
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    scene, _ = scene_from_text(random_soup(100_000, seed=11), use_bvh=True)
    o_c, d_c = _camera_rays(1024)
    o_r, d_r = _rays(1 << 20, lo=-1.2, hi=1.2)
    sizes = tuple(
        int(x) for x in os.environ.get("FOREST_LEAF_SIZES", "2,4,8").split(",")
    )
    for ml in sizes:
        forest = build_forest(scene.tris, max_faces=ml)
        jf = jax.tree_util.tree_map(jnp.asarray, forest)
        jbvh = jax.tree_util.tree_map(jnp.asarray, scene.bvh)
        fn = jax.jit(
            lambda o, d, jf=jf: intersect_bvh_forest(
                jnp, o, d, jf, jbvh, max_leaf=ml
            )
        )
        t0 = time.time()
        fn(o_c, d_c)
        log(f"leaf={ml}: nodes/chunk {jf.bvhs[0].count}, "
            f"compile+first {time.time()-t0:.1f}s")
        dt = _time_fn(fn, o_c, d_c, iters=3)
        log(f"leaf={ml}: camera 1M rays {dt*1e3:.1f} ms "
            f"-> {(1<<20)/dt/1e6:.2f} M rays/s")
        dt = _time_fn(fn, o_r, d_r, iters=3)
        log(f"leaf={ml}: random 1M rays {dt*1e3:.1f} ms "
            f"-> {(1<<20)/dt/1e6:.2f} M rays/s")


def step_cull():
    """Cull-and-sweep intersector (ops/pallas_cull.py) vs the incumbents:
    rays/s at several scene sizes, coherent camera rays AND adversarial
    random rays, with the tile/cluster/sort/precision knobs."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.accel.clusters import build_clusters
    from pbr_tpu.ops.pallas_cull import intersect_cull
    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    n_rays = 1 << 20

    import os

    from pbr_tpu.io.loader import load_model
    from pbr_tpu.utils.config import RenderSettings

    for tag in ("suzanne", "1082", "4000", "10000", "100000"):
        if tag == "suzanne":
            ref = "/root/reference/resources/models/testing/suzanne.obj"
            if not os.path.isfile(ref):
                continue
            scene, _, _ = load_model(ref, RenderSettings(shadow_rays=1))
        else:
            scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=True)
        jscene = jax.tree_util.tree_map(jnp.asarray, scene)
        nf = int(jscene.tris.mtl.shape[0])
        for ray_kind in ("coh", "rnd"):
            if ray_kind == "coh":
                o, d = _camera_rays(1024, eye=(0.0, 1.0, 3.0) if tag == "suzanne" else (0.0, 0.0, 3.5))
            else:
                o, d = _rays(n_rays, lo=-1.2, hi=1.2)
            rows = []
            if nf <= 10000:
                try:
                    dt = _time_fn(
                        jax.jit(lambda o, d: intersect_pallas(jnp, o, d, jscene.tris)),
                        o, d,
                    )
                    rows.append(("brute", dt))
                except Exception as e:
                    log(f"  brute failed: {type(e).__name__}: {e}")
            for csize, tile, sort, prec in (
                (64, 256, False, "highest"),
                (64, 256, True, "highest"),
                (64, 1024, True, "highest"),
                (64, 256, False, "default"),
                (128, 256, False, "highest"),
            ):
                cset = jax.tree_util.tree_map(
                    jnp.asarray, build_clusters(scene.tris, size=csize)
                )
                name = f"cull s{csize} t{tile} {'sort' if sort else 'raw '} {prec[:4]}"
                try:
                    dt = _time_fn(
                        jax.jit(
                            lambda o, d, cset=cset, tile=tile, sort=sort, prec=prec: intersect_cull(
                                jnp, o, d, cset, tile=tile, sort=sort, precision=prec
                            )
                        ),
                        o, d,
                    )
                    rows.append((name, dt))
                except Exception as e:
                    log(f"  {name} failed: {type(e).__name__}: {e}")
            for name, dt in rows:
                log(
                    f"cull {tag:7s} ({nf:6d} tris) {ray_kind} {name:26s} "
                    f"{dt * 1e3:9.2f} ms  {n_rays / dt / 1e6:8.1f} M rays/s"
                )


def step_sweep():
    """Row-sweep (ops/pallas_sweep.py) vs brute and the matmul cull:
    rays/s at several scene sizes, coherent camera rays AND adversarial
    random rays. The round-4 headline measurement."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.accel.clusters import build_clusters
    from pbr_tpu.ops.pallas_cull import intersect_cull
    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.ops.pallas_sweep import intersect_sweep
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    n_rays = 1 << 20
    import os

    from pbr_tpu.io.loader import load_model
    from pbr_tpu.utils.config import RenderSettings

    for tag in ("suzanne", "4000", "10000", "100000"):
        if tag == "suzanne":
            ref = "/root/reference/resources/models/testing/suzanne.obj"
            if not os.path.isfile(ref):
                continue
            scene, _, _ = load_model(ref, RenderSettings(shadow_rays=1))
        else:
            scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=True)
        jscene = jax.tree_util.tree_map(jnp.asarray, scene)
        nf = int(jscene.tris.mtl.shape[0])
        csize = 128 if nf > 50_000 else 64
        cset = jax.tree_util.tree_map(
            jnp.asarray, build_clusters(scene.tris, size=csize)
        )
        for ray_kind in ("coh", "rnd"):
            if ray_kind == "coh":
                o, d = _camera_rays(
                    1024, eye=(0.0, 1.0, 3.0) if tag == "suzanne" else (0.0, 0.0, 3.5)
                )
            else:
                o, d = _rays(n_rays, lo=-1.2, hi=1.2)
            rows = []
            if nf <= 10000:
                try:
                    dt = _time_fn(
                        jax.jit(lambda o, d: intersect_pallas(jnp, o, d, jscene.tris)),
                        o, d,
                    )
                    rows.append(("brute", dt))
                except Exception as e:
                    log(f"  brute failed: {type(e).__name__}: {e}")
            try:
                dt = _time_fn(
                    jax.jit(
                        lambda o, d: intersect_cull(jnp, o, d, cset, tile=256)
                    ),
                    o, d,
                )
                rows.append(("cull(old)", dt))
            except Exception as e:
                log(f"  cull failed: {type(e).__name__}: {e}")
            for tile, sort in ((256, None), (256, True), (512, None)):
                name = f"sweep t{tile} sort={sort}"
                try:
                    dt = _time_fn(
                        jax.jit(
                            lambda o, d, tile=tile, sort=sort: intersect_sweep(
                                jnp, o, d, cset, tile=tile, sort=sort
                            )
                        ),
                        o, d,
                    )
                    rows.append((name, dt))
                except Exception as e:
                    log(f"  {name} failed: {type(e).__name__}: {e}")
            for name, dt in rows:
                log(
                    f"sweep {tag:7s} ({nf:6d} tris) {ray_kind} {name:22s} "
                    f"{dt * 1e3:9.2f} ms  {n_rays / dt / 1e6:8.1f} M rays/s"
                )


def step_gated():
    """Gated-brute (ops/pallas_gated.py) vs brute: rays/s by scene size
    and ray population, rows (tile granularity) knob."""
    import jax
    import jax.numpy as jnp

    from pbr_tpu.accel.clusters import build_clusters
    from pbr_tpu.ops.pallas_gated import intersect_gated
    from pbr_tpu.ops.pallas_intersect import intersect_pallas
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    n_rays = 1 << 20
    import os

    from pbr_tpu.io.loader import load_model
    from pbr_tpu.utils.config import RenderSettings

    for tag in ("suzanne", "4000", "10000"):
        if tag == "suzanne":
            ref = "/root/reference/resources/models/testing/suzanne.obj"
            if not os.path.isfile(ref):
                continue
            scene, _, _ = load_model(ref, RenderSettings(shadow_rays=1))
        else:
            scene, _ = scene_from_text(random_soup(int(tag), seed=7), use_bvh=True)
        jscene = jax.tree_util.tree_map(jnp.asarray, scene)
        nf = int(jscene.tris.mtl.shape[0])
        cset = jax.tree_util.tree_map(
            jnp.asarray, build_clusters(scene.tris, size=64)
        )
        for ray_kind in ("coh", "rnd"):
            if ray_kind == "coh":
                o, d = _camera_rays(
                    1024, eye=(0.0, 1.0, 3.0) if tag == "suzanne" else (0.0, 0.0, 3.5)
                )
            else:
                o, d = _rays(n_rays, lo=-1.2, hi=1.2)
            rows = []
            try:
                dt = _time_fn(
                    jax.jit(lambda o, d: intersect_pallas(jnp, o, d, jscene.tris)),
                    o, d,
                )
                rows.append(("brute", dt))
            except Exception as e:
                log(f"  brute failed: {type(e).__name__}: {e}")
            for r in (1, 2, 4):
                name = f"gated rows={r}"
                try:
                    dt = _time_fn(
                        jax.jit(
                            lambda o, d, r=r: intersect_gated(
                                jnp, o, d, jscene.tris, cset, rows=r
                            )
                        ),
                        o, d,
                    )
                    rows.append((name, dt))
                except Exception as e:
                    log(f"  {name} failed: {type(e).__name__}: {e}")
            for name, dt in rows:
                log(
                    f"gated {tag:7s} ({nf:6d} tris) {ray_kind} {name:16s} "
                    f"{dt * 1e3:9.2f} ms  {n_rays / dt / 1e6:8.1f} M rays/s"
                )


STEPS = {
    "probe": step_probe,
    "sweep": step_sweep,
    "gated": step_gated,
    "forest_tiny": step_forest_tiny,
    "forest100k": step_forest100k,
    "forest_frame": step_forest_frame,
    "forest_leaf": step_forest_leaf,
    "pallas_bvh": step_pallas_bvh,
    "crossover": step_crossover,
    "cull": step_cull,
    "coherent": step_coherent,
    "sweeplin": step_sweeplin,
    "soup100k": step_soup100k,
    "packet100k": step_packet100k,
}


def main():
    names = sys.argv[1:] or list(STEPS)
    for name in names:
        log(f"=== step {name} ===")
        try:
            STEPS[name]()
        except Exception:
            log(f"step {name} FAILED:\n{traceback.format_exc()}")


if __name__ == "__main__":
    main()
