"""Offline gate-design study: achievable cull factors by (cluster size,
group granularity) on REAL end-to-end ray populations.

Records every (o, d, alive) population the integrator feeds the
intersector during a CPU render (numpy backend, any intersector), then —
entirely offline, no kernels — computes the conservative per-group cluster
demand (ops/cull.py::fine_hit_mask, octant+live verdicts) for a matrix of
cluster sizes and group sizes. The resulting swept-tests totals bound what
any gated kernel built on those verdicts can achieve; measured on-chip
cull factors (heat_tests) for the shipped config match this table's
corresponding cell, so the table is the design map.

Usage: python tools/study_gate.py [suzanne|soup:N] [size]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


from pbr_tpu.ops import traverse
from pbr_tpu.ops.cull import fine_hit_mask
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.utils.config import RenderSettings
from pbr_tpu.utils.morton import morton_pixel_ids


def record_populations(scene, cam, settings, lane_order="morton"):
    """Render once on the numpy backend, recording every intersect call's
    (o, d, alive, is_shadow)."""
    from pbr_tpu.models.integrator import trace_rays

    pops = []
    real = traverse.intersect_scene

    def spy(xp, o, d, scene_, max_leaf=2, mode="auto", light_pos=None,
            alive=None, with_counts=False):
        out = real(xp, o, d, scene_, max_leaf=max_leaf, mode=mode,
                   light_pos=light_pos, alive=alive, with_counts=with_counts)
        a = np.ones(o.x.shape, bool) if alive is None else np.asarray(alive)
        pops.append(
            {
                "o": np.stack([o.x, o.y, o.z], 1).astype(np.float32),
                "d": np.stack([d.x, d.y, d.z], 1).astype(np.float32),
                "alive": a.copy(),
                "nee": light_pos is not None,
                "t": np.asarray(out[0]).copy(),
            }
        )
        return out

    import pbr_tpu.models.integrator as integ

    old = integ.intersect_scene
    integ.intersect_scene = spy
    try:
        w, h = settings.width, settings.height
        ids = (
            morton_pixel_ids(w, h)
            if lane_order == "morton"
            else np.arange(w * h, dtype=np.int32)
        )
        trace_rays(np, scene, cam, settings, ids, 3)
    finally:
        integ.intersect_scene = old
    return pops


class _BoxSet:
    """AABB-only stand-in for a ClusterSet (fine_hit_mask reads just
    bb_min/bb_max), buildable at any cluster size."""

    def __init__(self, tris, size):
        v0 = tris.v0.stack(np).astype(np.float32)
        e1 = tris.e1.stack(np).astype(np.float32)
        e2 = tris.e2.stack(np).astype(np.float32)
        nf = v0.shape[0]
        c = max(1, -(-nf // size))
        verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
        f_min = verts.min(axis=1)
        f_max = verts.max(axis=1)
        bb_min = np.full((c, 3), np.inf, np.float32)
        bb_max = np.full((c, 3), -np.inf, np.float32)
        for i in range(c):
            lo, hi = i * size, min((i + 1) * size, nf)
            bb_min[i] = f_min[lo:hi].min(axis=0)
            bb_max[i] = f_max[lo:hi].max(axis=0)
        self.bb_min = Vec3(*(bb_min[:, i].copy() for i in range(3)))
        self.bb_max = Vec3(*(bb_max[:, i].copy() for i in range(3)))


def demand_tests(scene, pops, csize, group, t_prune=False):
    """Total conservative ray-face tests for (cluster size, group size):
    each group sweeps its demanded clusters (octant+live verdicts) —
    the cost model of any gated kernel on these verdicts.

    ``t_prune``: additionally model near-to-far ordered sweeping with a
    per-group early-out — a cluster is swept only if its conservative
    entry bound is <= the group's max live final-hit t (the steady-state
    of "stop once every live lane's best is closer than the next entry").
    This is the reference's ordered-traversal pruning (pt_bvh.cl:101
    ``exitDistance > entryDistance`` against the running best) lifted to
    group granularity: the achievable ceiling for an ordered gated kernel.
    """
    from pbr_tpu.ops.cull import frustum_hits_octants

    cset = _BoxSet(scene.tris, csize)
    total = 0
    live_lanes = 0
    for p in pops:
        n = p["o"].shape[0]
        pad = (-n) % group
        o = np.pad(p["o"], ((0, pad), (0, 0)), mode="edge")
        d = np.pad(p["d"], ((0, pad), (0, 0)), mode="edge")
        alive = np.pad(p["alive"], (0, pad))
        ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
        dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
        with np.errstate(all="ignore"):
            hit, tent = frustum_hits_octants(
                np, ov, dv, group, cset.bb_min, cset.bb_max, live=alive
            )
            if t_prune:
                t = np.pad(p["t"].astype(np.float32), (0, pad))
                t = np.where(alive, t, -np.inf)
                t_max = np.nanmax(
                    np.where(np.isfinite(t), t, -np.inf).reshape(-1, group),
                    axis=1,
                )
                # Groups where some live lane missed entirely keep +inf
                # (they can never early-out).
                any_missed = (
                    (alive & ~np.isfinite(np.pad(p["t"], (0, pad))))
                    .reshape(-1, group)
                    .any(axis=1)
                )
                t_max = np.where(any_missed, np.inf, t_max)
                hit = hit & (tent <= t_max[:, None] + 1e-4)
        per_group_lanes = alive.reshape(-1, group).sum(1)
        total += int((hit.sum(1) * per_group_lanes).sum()) * csize
        live_lanes += int(alive.sum())
    return total, live_lanes


def main():
    scene_tag = sys.argv[1] if len(sys.argv) > 1 else "suzanne"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from pbr_tpu.scene.camera import make_camera_state

    shadow = 1
    if scene_tag == "suzanne" or scene_tag.endswith(".obj"):
        import os

        from pbr_tpu.io.loader import load_model

        path = (
            "/root/reference/resources/models/testing/suzanne.obj"
            if scene_tag == "suzanne"
            else scene_tag
        )
        scene, lset, _ = load_model(path, RenderSettings(shadow_rays=1))
        cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
        sky = lset.sky_light
        shadow = lset.shadow_rays
        scene_tag = os.path.splitext(os.path.basename(path))[0]
    elif scene_tag == "multiroom":
        from pbr_tpu.scene.build import scene_from_text
        from pbr_tpu.scene.procedural import multi_room

        obj, mtl, li = multi_room()
        scene, _ = scene_from_text(obj, mtl, li, use_bvh=True)
        cam = make_camera_state(eye=(0.0, 1.0, 3.0), center_dir=(0.0, 0.0, 1.0))
        sky = (0.85, 0.9, 1.0)
    else:
        from pbr_tpu.scene.build import scene_from_text
        from pbr_tpu.scene.procedural import random_soup

        n = int(scene_tag.split(":")[1])
        scene, _ = scene_from_text(random_soup(n, seed=7), use_bvh=True)
        cam = make_camera_state(eye=(0.0, 0.0, 3.5), center_dir=(0.0, 0.0, 1.0))
        sky = (0.85, 0.9, 1.0)

    settings = RenderSettings(
        width=size, height=size, samples=1, max_depth=3, max_added_depth=5,
        shadow_rays=shadow, anti_aliasing=0.7, sky_light=sky, intersector="bvh",
    )
    F = scene.tris.count
    pops = record_populations(scene, cam, settings)
    n_live = sum(int(p["alive"].sum()) for p in pops)
    print(f"{scene_tag} {size}x{size}: F={F}, {len(pops)} passes, "
          f"{n_live} live lane-sweeps, brute tests = {n_live * F}")
    for t_prune in (False, True):
        tag = "demand+t-prune" if t_prune else "demand only"
        print(f"--- {tag} ---")
        print(
            f"{'csize':>6} | "
            + " ".join(f"g={g:<5}" for g in (1024, 256, 128, 32, 8))
        )
        for csize in (64, 32, 16, 8):
            row = []
            for g in (1024, 256, 128, 32, 8):
                tests, live = demand_tests(scene, pops, csize, g, t_prune)
                row.append(live * F / max(tests, 1))
            print(f"{csize:>6} | " + " ".join(f"{v:5.2f}x" for v in row))


if __name__ == "__main__":
    main()
