"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the dp (ray-tile) × sp (sample) mesh semantics: sharded renders
equal the unsharded mean-of-frames estimator, and gradient psum produces
the same grads as single-device autodiff (SURVEY.md §7.8).
"""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pbr_tpu.models.integrator import trace_rays
from pbr_tpu.parallel.mesh import (
    _shard_seed,
    make_mesh,
    sharded_render,
    sharded_train_step,
)
from util import cornell_scene, to_jax


def _mean_of_frames_unsharded(jnp, scene, cam, settings, frame_seed, n_sp):
    """What the sp axis computes, on one device."""
    import jax

    npx = settings.width * settings.height
    ids = jnp.arange(npx, dtype=jnp.int32)
    acc = None
    for k in range(n_sp):
        seed = _shard_seed(jnp.uint32(frame_seed), jnp.uint32(k))
        res = trace_rays(jnp, scene, cam, settings, ids, seed)
        c = np.stack(
            [np.asarray(res.color.x), np.asarray(res.color.y), np.asarray(res.color.z)], -1
        )
        acc = c if acc is None else acc + c
    return acc / n_sp


def test_mesh_shapes():
    mesh = make_mesh(n_dp=4, n_sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_render_matches_unsharded(n_dp, n_sp):
    import jax
    import jax.numpy as jnp

    scene, cam, settings = cornell_scene(use_bvh=False, width=64, height=64)
    jscene, jcam = to_jax(scene), to_jax(cam)
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    color, focus = sharded_render(mesh, jscene, jcam, settings, frame_seed=5)
    got = np.stack([np.asarray(color.x), np.asarray(color.y), np.asarray(color.z)], -1)
    want = _mean_of_frames_unsharded(jnp, jscene, jcam, settings, 5, n_sp)
    # Same math, different fusion/reduction layout: ULP differences can flip
    # rare discrete path decisions (see test_render_golden.py) — percentile
    # gate, everything else must be float-tight.
    d = np.abs(got - want).max(axis=-1)
    assert (d > 1e-4).mean() < 0.02, f"{(d > 1e-4).mean():.2%} pixels flipped"
    assert np.median(d) < 1e-6


def test_sharded_render_deterministic_across_layouts():
    """The counter-based RNG keys off global pixel id, so dp=8 and dp=2
    must produce the same image (multi-host determinism requirement)."""
    scene, cam, settings = cornell_scene(use_bvh=False, width=32, height=32)
    jscene, jcam = to_jax(scene), to_jax(cam)
    c1, _ = sharded_render(make_mesh(n_dp=8, n_sp=1), jscene, jcam, settings, 3)
    c2, _ = sharded_render(make_mesh(n_dp=2, n_sp=1), jscene, jcam, settings, 3)
    np.testing.assert_allclose(np.asarray(c1.x), np.asarray(c2.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1.z), np.asarray(c2.z), atol=1e-6)


def test_sharded_grads_match_single_device():
    import jax
    import jax.numpy as jnp

    from pbr_tpu.scene.types import Scene

    scene, cam, settings = cornell_scene(
        use_bvh=False, width=16, height=16, max_depth=2, max_added_depth=0
    )
    jscene, jcam = to_jax(scene), to_jax(cam)
    npx = settings.width * settings.height
    target = np.full((npx, 3), 0.5, dtype=np.float32)

    # single device reference grads
    ids = jnp.arange(npx, dtype=jnp.int32)

    def loss_single(params):
        mats, lights, camst = params
        sc = Scene(tris=jscene.tris, bvh=None, materials=mats, lights=lights)
        seed = _shard_seed(jnp.uint32(9), jnp.uint32(0))
        res = trace_rays(jnp, sc, camst, settings, ids, seed)
        err = (
            (res.color.x - target[:, 0]) ** 2
            + (res.color.y - target[:, 1]) ** 2
            + (res.color.z - target[:, 2]) ** 2
        )
        return jnp.sum(err) / (3.0 * npx)

    params = (jscene.materials, jscene.lights, jcam)
    loss_ref, grads_ref = jax.value_and_grad(loss_single, allow_int=True)(params)

    mesh = make_mesh(n_dp=4, n_sp=1)
    loss_sh, grads_sh, _ = sharded_train_step(
        mesh, jscene, jcam, settings, target, frame_seed=9
    )
    assert abs(float(loss_sh) - float(loss_ref)) < 1e-5

    flat_ref = jax.tree_util.tree_leaves(grads_ref)
    flat_sh = jax.tree_util.tree_leaves(grads_sh)
    assert len(flat_ref) == len(flat_sh)
    checked = 0
    for a, b in zip(flat_ref, flat_sh):
        if a.dtype == jax.dtypes.float0:
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
        checked += 1
    assert checked > 10  # materials + lights + camera leaves


def test_sgd_step_reduces_loss():
    import jax

    scene, cam, settings = cornell_scene(
        use_bvh=False, width=16, height=16, max_depth=2, max_added_depth=0
    )
    jscene, jcam = to_jax(scene), to_jax(cam)
    npx = settings.width * settings.height
    target = np.zeros((npx, 3), dtype=np.float32)
    mesh = make_mesh(n_dp=4, n_sp=2)
    from pbr_tpu.scene.types import Scene

    loss0, grads, params = sharded_train_step(
        mesh, jscene, jcam, settings, target, frame_seed=1, lr=0.05
    )
    mats, lights, camst = params
    scene1 = Scene(tris=jscene.tris, bvh=None, materials=mats, lights=lights)
    loss1, _, _ = sharded_train_step(
        mesh, scene1, camst, settings, target, frame_seed=1, lr=0.0
    )
    assert float(loss1) < float(loss0)


def test_cull_intersector_composes_with_shard_map():
    """The cull-and-sweep Pallas path (interpret mode on this CPU mesh)
    must run inside shard_map with the ClusterSet replicated and the ray
    batch dp-sharded, and agree with the unsharded call."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pbr_tpu.accel.clusters import build_clusters
    from pbr_tpu.ops.pallas_cull import intersect_cull
    from pbr_tpu.ops.vec import Vec3
    from pbr_tpu.scene.build import scene_from_text
    from pbr_tpu.scene.procedural import random_soup

    scene, _ = scene_from_text(random_soup(300, seed=8), use_bvh=True)
    cset = jax.tree_util.tree_map(
        jnp.asarray, build_clusters(scene.tris, size=64)
    )
    rs = np.random.RandomState(2)
    n = 512
    o = rs.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    mesh = make_mesh(n_dp=8, n_sp=1)
    # check_vma=False: interpret-mode pallas evaluates index_maps as jax
    # primitives, where the dp-varying prefetched candidate ids index the
    # unvarying coefficient table — a vma-propagation case jax's checker
    # cannot express yet (the compiled TPU path carries the out_shape vma
    # that ops/pallas_cull.py forwards).
    f = jax.shard_map(
        lambda cs, ox, oy, oz, dx, dy, dz: intersect_cull(
            jnp, Vec3(ox, oy, oz), Vec3(dx, dy, dz), cs,
            tile=64, slots=8, interpret=True,
        )[1],
        mesh=mesh,
        in_specs=(P(),) + (P("dp"),) * 6,
        out_specs=P("dp"),
        check_vma=False,
    )
    f_sharded = f(cset, ov.x, ov.y, ov.z, dv.x, dv.y, dv.z)
    _, f_plain = intersect_cull(
        jnp, ov, dv, cset, tile=64, slots=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_sharded), np.asarray(f_plain))
