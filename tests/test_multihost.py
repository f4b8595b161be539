"""Multi-host glue tests (virtual 8-device CPU mesh).

Real pods aren't available here; what CAN be proven without one:
- ``shard_index_map`` / ``host_local_pixel_ids`` derive shard indices from
  the sharding itself, so permuted / non-contiguous device layouts yield the
  correct *global* pixel ids (the round-1 implementation assumed contiguous
  default-order dp shards and broke on anything else);
- ``sharded_render`` consumes that path (app wiring) and a shuffled-device
  mesh renders the identical image.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pbr_tpu.parallel.mesh import make_mesh, sharded_render
from pbr_tpu.parallel.multihost import (
    global_mesh,
    host_local_pixel_ids,
    shard_index_map,
)
from util import cornell_scene, to_jax


def _shuffled_mesh(n_dp, n_sp=1, seed=4):
    rng = np.random.default_rng(seed)
    devs = np.asarray(jax.devices())
    perm = rng.permutation(devs.size)[: n_dp * n_sp]
    return make_mesh(n_dp=n_dp, n_sp=n_sp, devices=devs[perm])


def test_shard_index_map_partitions_exactly():
    """For any device order, the dp shard slices tile [0, npx) exactly."""
    npx = 64 * 64
    for mesh in (make_mesh(n_dp=8), _shuffled_mesh(8), _shuffled_mesh(4, 2)):
        idx_map = shard_index_map(mesh, npx)
        seen = np.zeros(npx, dtype=np.int32)
        for dev, index in idx_map.items():
            (sl,) = index
            start, stop, step = sl.indices(npx)
            assert step == 1
            seen[start:stop] += 1
        # Every element covered; sp replicas revisit the same dp shard.
        n_sp = mesh.shape["sp"]
        assert (seen == n_sp).all()


@pytest.mark.parametrize("layout", ["default", "shuffled"])
def test_host_local_pixel_ids_are_global(layout):
    mesh = make_mesh(n_dp=8) if layout == "default" else _shuffled_mesh(8)
    ids = host_local_pixel_ids(mesh, 64, 32)
    np.testing.assert_array_equal(np.asarray(ids), np.arange(64 * 32, dtype=np.int32))


def test_shuffled_mesh_renders_identical_image():
    """Device permutation changes which chip owns which tile — never the
    image (global-id-keyed RNG + pure per-pixel work)."""
    scene, cam, settings = cornell_scene(use_bvh=False, width=32, height=32)
    jscene, jcam = to_jax(scene), to_jax(cam)
    c1, _ = sharded_render(make_mesh(n_dp=8), jscene, jcam, settings, 5)
    c2, _ = sharded_render(_shuffled_mesh(8), jscene, jcam, settings, 5)
    np.testing.assert_array_equal(np.asarray(c1.x), np.asarray(c2.x))
    np.testing.assert_array_equal(np.asarray(c1.y), np.asarray(c2.y))


def test_global_mesh_covers_all_devices():
    m = global_mesh(n_sp=2)
    assert m.shape["dp"] * m.shape["sp"] == len(jax.devices())


def test_two_process_grad_parity():
    """The TRUE multi-process leg (VERDICT r4 item 7): 2 OS processes x 4
    virtual CPU devices joined by jax.distributed.initialize run one
    multihost_train_step; loss/grads must be replicated across processes
    and match the single-process sharded_train_step reference
    (tools/multiprocess_leg.py writes docs/MULTIPROC_r05.json)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # The children manage their own device counts; scrub the test
    # harness's 8-device forcing so the parent reference stays valid.
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multiprocess_leg.py")],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "PASS" in p.stdout
