"""Gather-free rectified refine: parity with the gather path + accuracy.

ref: src/aliceVision/depthMap/Refine.hpp:66-83 (refineRc) — same hypothesis
set evaluated through the rectified masked-shift scan instead of per-offset
bilinear gathers.
"""

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.image.filtering import gaussian_blur
from alicevision_tpu.mvs import plane_sweep as ps
from alicevision_tpu.mvs import refine as rf


def _smooth(key, H, W, sigma=1.5):
    img = jax.random.uniform(key, (H, W))
    img = gaussian_blur(img, sigma)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo)


def _pair_setup(key, H=96, W=128, d_true=5.0):
    K = jnp.asarray(
        [[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], jnp.float32
    )
    th = 0.04
    R_rel = jnp.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        jnp.float32,
    )
    t_rel = jnp.asarray([-0.5, 0.05, 0.0], jnp.float32)
    ref = _smooth(key, H, W)
    Hd = ps.plane_homography(K, K, R_rel, t_rel, d_true)
    t_img, _ = ps.warp_homography(ref, jnp.linalg.inv(Hd), (H, W))
    return ref, t_img, K, R_rel, t_rel


def _coarse(H, W, d_true):
    ys, xs = np.mgrid[0:H, 0:W]
    bias = 0.03 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
    return jnp.asarray(d_true * (1.0 + bias), jnp.float32)


def test_rectified_refine_improves_and_matches_gather():
    H, W, d_true = 96, 128, 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(jax.random.PRNGKey(2), H, W, d_true)
    d0 = _coarse(H, W, d_true)

    d_g, _ = rf.refine_depth_map(
        d0, ref, t_img[None], K, K[None], R_rel[None], t_rel[None], n_offsets=15
    )
    d_r, _ = rf.refine_depth_map_auto(
        d0, ref, t_img[None], K, K[None], R_rel[None], t_rel[None],
        depth_range=(3.0, 9.0), n_offsets=15, method="rectified",
    )
    d_g = np.asarray(d_g)
    d_r = np.asarray(d_r)
    interior = np.zeros((H, W), bool)
    interior[12:-12, 12:-12] = True

    err0 = np.median(np.abs(np.asarray(d0) - d_true)[interior])
    err_r = np.median(np.abs(d_r - d_true)[interior])
    assert err_r < err0 * 0.5  # the rectified path genuinely refines
    diff = np.abs(d_g - d_r)[interior]
    assert np.median(diff) < 0.01 * d_true  # parity with the gather path


def test_refine_auto_dispatch_mixed_pairs():
    """One sideways pair (rectifiable) + one forward pair (gate fails) fuse
    into one refined map."""
    H, W, d_true = 96, 128, 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(jax.random.PRNGKey(3), H, W, d_true)
    t_fwd = jnp.asarray([0.02, 0.0, -0.4], jnp.float32)
    Hd = ps.plane_homography(K, K, jnp.eye(3), t_fwd, d_true)
    t_img2, _ = ps.warp_homography(ref, jnp.linalg.inv(Hd), (H, W))

    from alicevision_tpu.mvs.rectified import rectification_ok

    assert rectification_ok(np.asarray(R_rel), np.asarray(t_rel))
    assert not rectification_ok(np.eye(3), np.asarray(t_fwd))

    d0 = _coarse(H, W, d_true)
    t_imgs = jnp.stack([t_img, t_img2])
    Kt = jnp.stack([K, K])
    Rr = jnp.stack([R_rel, jnp.eye(3, dtype=jnp.float32)])
    tr = jnp.stack([t_rel, t_fwd])
    d_a, sim = rf.refine_depth_map_auto(
        d0, ref, t_imgs, K, Kt, Rr, tr, depth_range=(3.0, 9.0), n_offsets=15
    )
    d_a = np.asarray(d_a)
    interior = np.zeros((H, W), bool)
    interior[12:-12, 12:-12] = True
    err0 = np.median(np.abs(np.asarray(d0) - d_true)[interior])
    err_a = np.median(np.abs(d_a - d_true)[interior])
    assert err_a < err0 * 0.6


def test_disparity_bounds_buckets():
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([-0.5, 0.0, 0.0], np.float32)
    lo, hi = rf._disparity_bounds(K, K, R, t, (3.0, 9.0), 0.075, (96, 128))
    assert lo % 64 == 0 and hi % 64 == 0
    assert lo <= 0 < hi
    # true disparity range fx*B/d in [6.7, 20] must be covered
    assert lo <= 6 and hi >= 21


def test_dense_grid_multichunk_matches_gather():
    """The dense RefineParams-style grid (n_offsets > 64) exercises the
    multi-chunk lax.map path + per-chunk disparity windows: parity with
    the per-offset bilinear-gather scorer on the same 141-hypothesis grid.

    ref: src/aliceVision/depthMap/RefineParams.hpp:23-24 (halfNbDepths x
    nbSubsamples dense volume, evaluated at 1/10-plane steps in
    cuda/planeSweeping/deviceSimilarityVolume.cu:477-494).
    """
    H, W, d_true = 96, 128, 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(
        jax.random.PRNGKey(5), H, W, d_true
    )
    d0 = _coarse(H, W, d_true)

    # 2*70+1 = 141 offsets -> CH=64, 3 chunks with tail padding
    d_g, _ = rf.refine_depth_map(
        d0, ref, t_img[None], K, K[None], R_rel[None], t_rel[None],
        rel_step=0.0005, n_offsets=70,
    )
    d_r, _ = rf.refine_depth_map_auto(
        d0, ref, t_img[None], K, K[None], R_rel[None], t_rel[None],
        depth_range=(3.0, 9.0), rel_step=0.0005, n_offsets=70,
        n_subsamples=1, method="rectified",
    )
    d_g = np.asarray(d_g)
    d_r = np.asarray(d_r)
    interior = np.zeros((H, W), bool)
    interior[12:-12, 12:-12] = True
    err0 = np.median(np.abs(np.asarray(d0) - d_true)[interior])
    err_r = np.median(np.abs(d_r - d_true)[interior])
    assert err_r < err0  # the fine grid refines the coarse map
    diff = np.abs(d_g - d_r)[interior]
    assert np.median(diff) < 0.01 * d_true  # parity with the gather path
