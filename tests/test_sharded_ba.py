"""Distributed Schur BA on a virtual 8-device mesh vs the single-device
solver — the north-star path (SURVEY.md §7 item 5: landmark blocks sharded,
reduced camera system psum-assembled by XLA from shardings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alicevision_tpu.sfm import ba
from alicevision_tpu.parallel.ba_sharded import (
    pad_problem_for_mesh, solve_sharded,
)
from alicevision_tpu.parallel.mesh import make_mesh
from alicevision_tpu.utils.synthetic import ring_scene


def _problem(n_views=10, n_points=300, seed=0):
    scene = ring_scene(n_views=n_views, n_points=n_points, seed=seed)
    vis = np.asarray(scene.visible)
    obs_np = np.asarray(scene.observations)
    o_lm, o_cam, o_uv = [], [], []
    for l in range(n_points):
        for v in np.nonzero(vis[:, l])[0][:6]:
            o_lm.append(l)
            o_cam.append(v)
            o_uv.append(obs_np[v, l])
    intr = jax.tree_util.tree_map(lambda a: a[None], scene.intrinsics)
    key = jax.random.PRNGKey(0)
    pts0 = scene.points + 0.05 * jax.random.normal(key, scene.points.shape)
    return ba.build_problem(
        scene.poses.q, scene.poses.c, pts0, intr,
        np.array(o_lm), np.array(o_cam), np.zeros(len(o_lm), np.int32),
        np.array(o_uv), max_track=6,
        cam_fixed=np.arange(n_views) < 2,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ba_matches_single_device():
    problem = _problem()
    mesh = make_mesh()  # full device grid (view x landmark)
    n_shards = mesh.devices.size

    single = ba.ba_solve(pad_problem_for_mesh(problem, n_shards), max_iters=12)
    shard = solve_sharded(problem, mesh, max_iters=12)

    # identical math, identical damping path -> same costs to float tolerance
    assert np.isclose(float(shard.cost_initial), float(single.cost_initial),
                      rtol=1e-4)
    assert np.isclose(float(shard.cost_final), float(single.cost_final),
                      rtol=1e-3, atol=1e-4)
    # the solve actually reduced the cost
    assert float(shard.cost_final) < 0.2 * float(shard.cost_initial)
    np.testing.assert_allclose(
        np.asarray(shard.cam_c), np.asarray(single.cam_c), atol=5e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ba_landmarks_actually_sharded():
    """The landmark tables must carry a non-replicated sharding (otherwise
    the 'distributed' solve silently runs replicated)."""
    from alicevision_tpu.parallel.ba_sharded import shard_problem

    problem = _problem(n_views=8, n_points=128)
    mesh = make_mesh()
    p = shard_problem(problem, mesh)
    shardings = {d.device for d in p.points.addressable_shards}
    assert len(shardings) == mesh.devices.size
