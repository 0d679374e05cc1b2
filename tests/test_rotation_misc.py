"""Tests: rotation-only SfM, pose covariance, image processing, segmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import geometry as geo
from alicevision_tpu.image import processing as ip
from alicevision_tpu.misc.segmentation import segment_sky, segment_tiled
from alicevision_tpu.sfm.rotation_sfm import RotationSfM, robust_rotation


def _rotating_camera_bearings(n_views=6, n_pts=150, seed=0, outlier_frac=0.0):
    """Bearings of fixed scene directions seen by a purely rotating camera."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (n_pts, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # camera rotations around y with small perturbations
    Rs = []
    for v in range(n_views):
        w = jnp.asarray([0.05 * v, 0.8 * v / n_views * 2 * np.pi, -0.03 * v])
        Rs.append(np.asarray(geo.so3_exp(w)))
    bearings = [
        np.array(jnp.einsum("ij,nj->ni", jnp.asarray(R), dirs)) for R in Rs
    ]  # np.array copies -> writable for outlier injection
    if outlier_frac > 0:
        rng = np.random.RandomState(seed)
        for b in bearings[1:]:
            n_out = int(outlier_frac * n_pts)
            idx = rng.choice(n_pts, n_out, replace=False)
            r = rng.randn(n_out, 3)
            b[idx] = r / np.linalg.norm(r, axis=-1, keepdims=True)
    return Rs, bearings


def test_robust_rotation_with_outliers():
    Rs, bearings = _rotating_camera_bearings(outlier_frac=0.25, seed=1)
    R, inl, _ = robust_rotation(
        jax.random.PRNGKey(0),
        jnp.asarray(bearings[0]),
        jnp.asarray(bearings[2]),
        focal_px=1000.0,
        im_size=(1920, 1080),
    )
    R_gt = Rs[2] @ Rs[0].T
    ang = np.degrees(np.linalg.norm(np.asarray(geo.so3_log(jnp.asarray(np.asarray(R) @ R_gt.T)))))
    assert ang < 0.2, ang
    assert int(jnp.sum(inl)) > 100


def test_rotation_sfm_engine():
    Rs, bearings = _rotating_camera_bearings(n_views=5, seed=2)
    pairs = {}
    for i in range(5):
        for j in range(i + 1, 5):
            pairs[(i, j)] = (bearings[i], bearings[j])
    eng = RotationSfM(5, 1000.0, (1920, 1080))
    R_glob, counts = eng.run(jax.random.PRNGKey(1), pairs)
    # compare up to global gauge
    align = Rs[0].T @ R_glob[0]
    for v in range(5):
        ang = np.degrees(
            np.linalg.norm(np.asarray(geo.so3_log(jnp.asarray(R_glob[v] @ (Rs[v] @ align).T))))
        )
        assert ang < 0.3, (v, ang)


def test_pose_covariance_shrinks_with_more_points():
    from alicevision_tpu.sfm import ba
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ba import _make_problem

    _, p_small = _make_problem(n_points=40, noise_px=0.5, seed=3)
    _, p_big = _make_problem(n_points=160, noise_px=0.5, seed=3)
    r_small = ba.ba_solve(p_small, max_iters=10)
    r_big = ba.ba_solve(p_big, max_iters=10)
    cov_s = np.asarray(ba.pose_covariances(p_small, r_small.cam_q, r_small.cam_c, r_small.points))
    cov_b = np.asarray(ba.pose_covariances(p_big, r_big.cam_q, r_big.cam_c, r_big.points))
    # free cameras: more observations -> smaller uncertainty
    tr_s = np.trace(cov_s[3:], axis1=1, axis2=2).mean()
    tr_b = np.trace(cov_b[3:], axis1=1, axis2=2).mean()
    assert tr_b < tr_s
    assert tr_b > 0


def test_image_processing_ops():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    assert ip.resize(img, 0.5).shape == (32, 32)
    sh = ip.sharpen(img, 1.0)
    assert float(jnp.var(sh)) >= float(jnp.var(img)) * 0.9
    den = ip.bilateral_denoise(img + 0.0, sigma_range=0.5)
    assert float(jnp.var(den)) < float(jnp.var(img))
    ct = ip.adjust_contrast(img, 2.0)
    assert float(jnp.var(ct)) > float(jnp.var(img))


def test_fill_holes():
    img = jnp.ones((32, 32)) * 0.7
    mask = jnp.ones((32, 32), bool).at[10:20, 10:20].set(False)
    out = ip.fill_holes(img, mask, iterations=40)
    np.testing.assert_allclose(np.asarray(out[12:18, 12:18]), 0.7, atol=0.05)


def test_split_equirect():
    pano = jnp.asarray(np.random.RandomState(1).rand(64, 128).astype(np.float32))
    imgs, K, Rs = ip.split_equirect(pano, n_splits=4, out_size=64)
    assert imgs.shape == (4, 64, 64)
    assert Rs.shape == (4, 3, 3)
    for R in Rs:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_segmentation_tiling_and_sky():
    # image: blue gradient sky on top, textured ground below
    H, W = 96, 160
    rng = np.random.RandomState(0)
    img = np.zeros((H, W, 3), np.float32)
    img[: H // 2, :, 2] = 0.9  # blue sky
    img[: H // 2, :, 0] = 0.4
    img[: H // 2, :, 1] = 0.6
    img[H // 2 :] = rng.rand(H - H // 2, W, 3) * 0.5
    mask = segment_sky(img)
    assert mask[: H // 2 - 4].mean() > 0.9
    assert mask[H // 2 + 4 :].mean() < 0.1

    # tiling harness: constant model stitches seamlessly
    out = segment_tiled(img, lambda t: np.full(t.shape[:2], 0.5), tile=48, overlap=16)
    np.testing.assert_allclose(out, 0.5, atol=1e-9)
