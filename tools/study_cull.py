"""Design study for the cull-and-sweep intersector (CPU, NumPy — no TPU).

Uses the FINE-granularity candidate formulation (ops/cull.py
candidates_fine) so counts mean clusters; production uses the
supercluster-packed variant with identical conservative semantics.

Measures, on the real scenes the round cares about (soup:100k, a
suzanne-scale OBJ), the per-tile candidate-cluster count distribution of
ops/cull.py's conservative frustum test across (tile size x cluster size),
for the three ray populations the integrator produces:

- primary: camera rays (Morton/octant-sorted, very coherent);
- bounce: cosine-hemisphere rays from points uniform on the scene's
  surface (statistically like diffuse bounce-1 rays, no tracing needed);
- shadow: surface points -> one light position (coherent directions).

Output decides the kernel's tile size, cluster size, and candidate-list
width L (docs/PERF.md records the conclusions).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from pbr_tpu.accel.clusters import build_clusters  # noqa: E402
from pbr_tpu.ops.cull import candidates_fine as candidates, coherence_keys  # noqa: E402
from pbr_tpu.ops.vec import Vec3  # noqa: E402
from pbr_tpu.scene.build import scene_from_text  # noqa: E402
from pbr_tpu.scene.camera import make_camera_state, pixel_dim  # noqa: E402


def primary_rays(cam, n, size=1024):
    ids = np.arange(n, dtype=np.int64) * (size * size // n)
    px = (ids % size).astype(np.float32)
    py = (ids // size).astype(np.float32)
    pxd = np.float32(pixel_dim(size, size, 50.0))
    fx = 1.0 - size + 2.0 * px
    fy = 1.0 - size + 2.0 * py
    e = np.array([cam.eye.x, cam.eye.y, cam.eye.z], np.float32)
    w = np.array([cam.w.x, cam.w.y, cam.w.z], np.float32)
    u = np.array([cam.u.x, cam.u.y, cam.u.z], np.float32)
    v = np.array([cam.v.x, cam.v.y, cam.v.z], np.float32)
    d = w[None] + (u[None] * fx[:, None] + v[None] * fy[:, None]) * (pxd * 0.5)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(e, d.shape).copy()
    return o, d


def surface_rays(tris, n, seed, mode):
    rs = np.random.RandomState(seed)
    v0 = tris.v0.stack(np)
    e1 = tris.e1.stack(np)
    e2 = tris.e2.stack(np)
    f = rs.randint(0, v0.shape[0], size=n)
    r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
    flip = r1 + r2 > 1.0
    r1 = np.where(flip, 1.0 - r1, r1)
    r2 = np.where(flip, 1.0 - r2, r2)
    p = v0[f] + e1[f] * r1 + e2[f] * r2
    nrm = np.cross(e1[f], e2[f])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    if mode == "shadow":
        lp = np.array([0.0, 2.4, 0.0], np.float32)
        d = lp[None] - p
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    else:
        # Cosine hemisphere around the (sign-randomized) normal.
        nrm = np.where(rs.rand(n, 1) < 0.5, -nrm, nrm)
        z = rs.rand(n)
        phi = 2 * np.pi * rs.rand(n)
        sz = np.sqrt(z)
        sxy = np.sqrt(1 - z)
        a = np.where(np.abs(nrm[:, 0:1]) < 0.9, np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
        t1 = np.cross(nrm, a)
        t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
        t2 = np.cross(nrm, t1)
        d = (
            t1 * (sxy * np.cos(phi))[:, None]
            + t2 * (sxy * np.sin(phi))[:, None]
            + nrm * sz[:, None]
        )
    return p.astype(np.float32), d.astype(np.float32)


def _mt_t(o, d, v0, e1, e2):
    """Nearest-hit t per ray over a face set (numpy broadcast, study only)."""
    with np.errstate(all="ignore"):
        ob, db = o[:, None, :], d[:, None, :]
        p = np.cross(db, e2[None])
        det = np.einsum("rfk,rfk->rf", np.broadcast_to(e1[None], p.shape), p)
        inv = 1.0 / det
        tv = ob - v0[None]
        q = np.cross(tv, e1[None])
        t = np.einsum("rfk,rfk->rf", np.broadcast_to(e2[None], q.shape), q) * inv
        u = np.einsum("rfk,rfk->rf", tv, p) * inv
        v = np.einsum("rfk,rfk->rf", db, q) * inv
        ok = (t >= 1e-5) & (u >= 0) & (v >= 0) & (u + v <= 1)
        t = np.where(ok, t, np.inf)
        return t.min(axis=1)


def early_out_sim(scene, name, n_rays, tile, csize, n_full=1_048_576):
    """Simulate the sweep's occlusion early-out: near-to-far candidates,
    stop a tile when every ray's best hit is closer than the next
    cluster's conservative entry bound. Reports EXECUTED steps.

    Tiles are sliced out of a FULL-density (``n_full``) sorted population —
    sparse populations make tiles cover unrealistically wide footprints —
    with truth computed only for the sampled slices."""
    cset = build_clusters(scene.tris, size=csize)
    v0 = scene.tris.v0.stack(np)
    e1 = scene.tris.e1.stack(np)
    e2 = scene.tris.e2.stack(np)
    nf = v0.shape[0]
    pad = cset.count * csize - nf
    if pad:
        z = np.zeros((pad, 3), np.float32)
        v0, e1, e2 = (np.concatenate([a, z]) for a in (v0, e1, e2))
    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    print(f"--- early-out sim {name} tile={tile} csize={csize} C={cset.count} ---")
    for pop, (o, d) in {
        "primary": primary_rays(cam, n_full, size=1024),
        "bounce": surface_rays(scene.tris, n_full, 3, "bounce"),
        "shadow": surface_rays(scene.tris, n_full, 4, "shadow"),
    }.items():
        ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
        dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
        keys = coherence_keys(np, ov, dv, cset.scene_min, cset.scene_max)
        perm = np.argsort(keys, kind="stable")
        o, d = o[perm], d[perm]
        # Sample contiguous slices (tiles) across the sorted population.
        n_tiles = max(1, n_rays // tile)
        t_all = n_full // tile
        sel = np.linspace(0, t_all - 1, n_tiles).astype(np.int64)
        idx = (sel[:, None] * tile + np.arange(tile)[None, :]).reshape(-1)
        o, d = o[idx], d[idx]
        ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
        dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
        cand, counts, tent = candidates(np, ov, dv, cset, tile)
        T = n_tiles
        steps_ex = np.zeros(T, np.int64)
        for t in range(T):
            ot, dt = o[t * tile : (t + 1) * tile], d[t * tile : (t + 1) * tile]
            t_best = np.full(tile, np.inf, np.float32)
            for l in range(int(counts[t])):
                if t_best.max() <= tent[t, l]:
                    break
                cid = int(cand[t, l])
                sl = slice(cid * csize, (cid + 1) * csize)
                t_best = np.minimum(t_best, _mt_t(ot, dt, v0[sl], e1[sl], e2[sl]))
                steps_ex[t] += 1
        print(
            f"  {pop:8s}: cand mean={counts.mean():7.1f}  EXEC mean={steps_ex.mean():6.1f} "
            f"p50={np.percentile(steps_ex, 50):5.0f} p95={np.percentile(steps_ex, 95):5.0f} "
            f"max={steps_ex.max():5d}  faces/ray={steps_ex.mean() * csize:7.0f}"
        )


def study(scene, name, n_rays, tiles, csizes):
    print(f"=== {name}: {scene.tris.count} faces ===")
    cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
    pops = {
        "primary": primary_rays(cam, n_rays),
        "bounce": surface_rays(scene.tris, n_rays, 3, "bounce"),
        "shadow": surface_rays(scene.tris, n_rays, 4, "shadow"),
    }
    for csize in csizes:
        cset = build_clusters(scene.tris, size=csize)
        c = cset.count
        for tile in tiles:
            line = [f"csize={csize:4d} C={c:5d} tile={tile:5d}"]
            for pop, (o, d) in pops.items():
                ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
                dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
                keys = coherence_keys(np, ov, dv, cset.scene_min, cset.scene_max)
                perm = np.argsort(keys, kind="stable")
                ov = Vec3(*(a[perm] for a in ov))
                dv = Vec3(*(a[perm] for a in dv))
                _, counts = candidates(np, ov, dv, cset, tile)
                # work = swept faces per ray (the sweep's cost driver)
                work = counts.astype(np.float64).mean() * csize
                line.append(
                    f"{pop}: mean={counts.mean():7.1f} p50={np.percentile(counts, 50):6.0f} "
                    f"p95={np.percentile(counts, 95):6.0f} max={counts.max():5d} "
                    f"faces/ray={work:8.0f}"
                )
            print("  " + "\n        ".join(line))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--soup", type=int, default=100000)
    ap.add_argument("--mode", default="all", choices=["all", "counts", "earlyout"])
    args = ap.parse_args()

    from pbr_tpu.scene.procedural import random_soup

    obj = random_soup(args.soup, seed=11)
    scene, _ = scene_from_text(obj, use_bvh=True)
    if args.mode in ("all", "counts"):
        study(
            scene, f"soup:{args.soup}", args.rays,
            tiles=(256, 512, 1024), csizes=(64, 128, 256),
        )
        obj2 = random_soup(1082, seed=7)
        scene2, _ = scene_from_text(obj2, use_bvh=True)
        study(
            scene2, "soup:1082 (suzanne-scale)", args.rays,
            tiles=(256, 512, 1024), csizes=(64, 128),
        )
    if args.mode in ("all", "earlyout"):
        n = min(args.rays, 4096)
        for tile, csize in ((256, 128), (1024, 128), (1024, 256), (256, 64)):
            early_out_sim(scene, f"soup:{args.soup}", n, tile, csize)


if __name__ == "__main__":
    main()
