"""Sharded per-view SGM on the virtual mesh + tiled large-image SGM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alicevision_tpu.mvs import plane_sweep as ps
from alicevision_tpu.mvs import sharded as sh
from alicevision_tpu.parallel.mesh import make_mesh


def _plane_case(z0=4.0, H=64, W=96):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mvs import _render_plane_scene

    return _render_plane_scene(z0=z0, H=H, W=W, fx=100.0, baseline=0.4)


def test_batched_sgm_sharded_over_views():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _plane_case()
    B = 8  # one view-group per virtual device
    depths = np.asarray(ps.inverse_depth_planes(2.0, 8.0, 32))

    batch = lambda a: jnp.asarray(np.stack([a] * B))
    mesh = make_mesh(n_view=8, n_landmark=1)
    fn = sh.make_sharded_sgm(mesh, ps.SgmParams(n_depths=32))
    depth, sim = fn(
        batch(ref),
        batch(np.stack(t_imgs)) if isinstance(t_imgs, list) else batch(t_imgs),
        batch(K.astype(np.float32)),
        batch(np.stack(K_t).astype(np.float32)),
        batch(np.stack(R_rel).astype(np.float32)),
        batch(np.stack(t_rel).astype(np.float32)),
        batch(depths.astype(np.float32)),
    )
    d = np.asarray(depth)
    assert d.shape[0] == B
    inner = d[:, 8:-8, 30:-8]
    assert np.abs(np.median(inner) - z0) / z0 < 0.05
    # all batch entries identical inputs -> identical outputs across shards
    np.testing.assert_allclose(d[0], d[5], atol=1e-5)


def test_tile_merge_contract():
    H = W = 100
    rois = sh.make_tiles(H, W, tile=60, overlap=20)
    assert all(y1 <= H and x1 <= W for y0, y1, x0, x1 in rois)
    # constant maps merge to the constant
    tiles = [(roi, np.full((roi[1] - roi[0], roi[3] - roi[2]), 5.0, np.float32))
             for roi in rois]
    merged = sh.merge_tiles(tiles, H, W)
    np.testing.assert_allclose(merged, 5.0, atol=1e-5)
    # invalid (-1) regions stay invalid
    tiles2 = [(roi, np.full((roi[1] - roi[0], roi[3] - roi[2]), -1.0, np.float32))
              for roi in rois]
    merged2 = sh.merge_tiles(tiles2, H, W)
    assert (merged2 == -1.0).all()


def test_tiled_sgm_matches_full():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _plane_case(H=96, W=128)
    params = ps.SgmParams(n_depths=32)
    full_d, _ = ps.sgm_depth_map(
        jnp.asarray(ref), jnp.asarray(np.stack(t_imgs)),
        jnp.asarray(K, jnp.float32), jnp.asarray(np.stack(K_t), jnp.float32),
        jnp.asarray(np.stack(R_rel), jnp.float32),
        jnp.asarray(np.stack(t_rel), jnp.float32),
        2.0, 8.0, params,
    )
    tiled_d = sh.sgm_depth_map_tiled(
        ref, np.stack(t_imgs), K, np.stack(K_t), np.stack(R_rel),
        np.stack(t_rel), 2.0, 8.0, params, tile=80, overlap=24,
    )
    inner = np.s_[12:-12, 34:-12]
    rel = np.abs(tiled_d[inner] - np.asarray(full_d)[inner]) / z0
    assert np.median(rel) < 0.02, np.median(rel)
