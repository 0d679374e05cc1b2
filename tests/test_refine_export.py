"""Tests for depth refinement and COLMAP export/import."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.mvs import refine as rf
from alicevision_tpu.sfmdata import export as ex
from alicevision_tpu import sfmdata


def _plane_setup(z0=4.0, H=64, W=96, fx=100.0, baseline=0.4):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mvs import _render_plane_scene

    return _render_plane_scene(z0=z0, H=H, W=W, fx=fx, baseline=baseline)


def test_refine_improves_coarse_depth():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _plane_setup()
    H, W = ref.shape
    # coarse start: smooth low-frequency bias (the character of SGM error —
    # windowed ZNCC cannot resolve per-pixel iid noise by construction)
    ys, xs = np.mgrid[0:H, 0:W]
    bias = 0.03 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
    d0 = (z0 * (1 + bias)).astype(np.float32)
    d_ref, sim = rf.refine_depth_map(
        jnp.asarray(d0), jnp.asarray(ref), jnp.asarray(t_imgs),
        jnp.asarray(K, jnp.float32), jnp.asarray(np.stack(K_t), jnp.float32),
        jnp.asarray(np.stack(R_rel), jnp.float32), jnp.asarray(np.stack(t_rel), jnp.float32),
    )
    inner = np.s_[8:-8, 30:-8]
    err0 = np.abs(np.asarray(d0)[inner] - z0).mean()
    err1 = np.abs(np.asarray(d_ref)[inner] - z0).mean()
    assert err1 < err0 * 0.5, (err0, err1)


def test_color_guided_optimize_smooths_flat():
    rng = np.random.RandomState(1)
    depth = (4.0 + 0.05 * rng.randn(48, 48)).astype(np.float32)
    img = np.full((48, 48), 0.5, np.float32)  # flat image -> strong smoothing
    out = np.asarray(rf.color_guided_optimize(jnp.asarray(depth), jnp.asarray(img)))
    assert out[8:-8, 8:-8].std() < depth[8:-8, 8:-8].std() * 0.5


def test_color_guided_respects_edges():
    depth = np.full((48, 48), 4.0, np.float32)
    depth[:, 24:] = 6.0
    img = np.zeros((48, 48), np.float32)
    img[:, 24:] = 1.0  # strong image edge aligned with depth edge
    out = np.asarray(rf.color_guided_optimize(jnp.asarray(depth), jnp.asarray(img)))
    # depth discontinuity preserved
    assert abs(out[24, 20] - 4.0) < 0.1
    assert abs(out[24, 28] - 6.0) < 0.1


def _tiny_scene():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_sfmdata import _build_scene

    return _build_scene()


def test_colmap_export_import(tmp_path):
    sc = _tiny_scene()
    out = str(tmp_path / "colmap")
    ex.export_colmap(sc, out)
    for f in ("cameras.txt", "images.txt", "points3D.txt"):
        assert os.path.exists(os.path.join(out, f))
    sc2 = ex.import_colmap(out)
    assert sc2.n_views == sc.n_poses  # only posed views exported
    assert sc2.n_intrinsics == sc.n_intrinsics
    # poses round-trip
    for vid in sc2.view_ids:
        i2 = list(sc2.view_ids).index(vid)
        i1 = list(sc.view_ids).index(vid)
        p2, p1 = sc2.view_pose[i2], sc.view_pose[i1]
        np.testing.assert_allclose(sc2.pose_R[p2], sc.pose_R[p1], atol=1e-6)
        np.testing.assert_allclose(sc2.pose_c[p2], sc.pose_c[p1], atol=1e-5)
