"""Tests for the gather-free rectified plane sweep (mvs/rectified.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alicevision_tpu.mvs import plane_sweep as ps
from alicevision_tpu.mvs import rectified as rf


def _smooth_image(key, H, W, sigma=3.0):
    from alicevision_tpu.image.filtering import gaussian_blur

    img = jax.random.uniform(key, (H, W))
    img = gaussian_blur(img, sigma)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo)


def test_fusiello_geometry():
    """Rectified projections of a 3D point differ by a pure horizontal
    disparity fx * B / Z_rect."""
    rng = np.random.default_rng(0)
    K = jnp.asarray([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], jnp.float32)
    th = 0.1
    R_rel = jnp.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        jnp.float32,
    )
    t_rel = jnp.asarray([-0.8, 0.1, 0.05], jnp.float32)
    R_rect, H_ref, H_t, B = rf.fusiello_rectification(K, K, R_rel, t_rel)

    X = jnp.asarray(rng.normal(0, 0.5, (20, 3)) + [0, 0, 5.0], jnp.float32)
    # original projections
    p_ref = (X @ K.T) / X[:, 2:]
    Xt = X @ R_rel.T + t_rel
    p_t = (Xt @ K.T) / Xt[:, 2:]
    # rectified projections via the homographies
    q_ref = p_ref @ H_ref.T
    q_ref = q_ref[:, :2] / q_ref[:, 2:]
    q_t = p_t @ H_t.T
    q_t = q_t[:, :2] / q_t[:, 2:]
    # same row
    assert np.allclose(q_ref[:, 1], q_t[:, 1], atol=1e-2)
    # disparity = fx * B / Z_rect
    Z_rect = X @ np.asarray(R_rect)[2]
    disp = np.asarray(K)[0, 0] * float(B) / Z_rect
    assert np.allclose(q_ref[:, 0] - q_t[:, 0], disp, atol=1e-2)


def test_shift_scale_rows_matches_direct():
    """FFT shift + matmul rescale == direct resample f(a u + b)."""
    key = jax.random.PRNGKey(1)
    H, W = 16, 64
    img = _smooth_image(key, H, W, sigma=2.0)
    Wp = 2 * W
    img_f = jnp.fft.rfft(jnp.pad(img, ((0, 0), (0, Wp - W))), axis=-1)
    a = 0.97
    b = jnp.linspace(-3.0, 3.0, H)
    out = rf._shift_scale_rows(img_f, a, b, W)
    # direct evaluation with numpy interp (sinc vs linear: loose tol)
    ref = np.zeros((H, W))
    xin = np.arange(W)
    for v in range(H):
        src = a * np.arange(W) + float(b[v])
        ref[v] = np.interp(src, xin, np.asarray(img[v]), left=0, right=0)
    inb = (a * np.arange(W)[None, :] + np.asarray(b)[:, None] >= 1) & (
        a * np.arange(W)[None, :] + np.asarray(b)[:, None] <= W - 2
    )
    err = np.abs(np.asarray(out) - ref)[inb]
    assert np.median(err) < 0.01
    assert err.mean() < 0.03


def _pair_setup(key, H=96, W=128, depth_plane=5.0):
    K = jnp.asarray(
        [[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], jnp.float32
    )
    th = 0.04
    R_rel = jnp.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        jnp.float32,
    )
    t_rel = jnp.asarray([-0.5, 0.05, 0.0], jnp.float32)
    ref = _smooth_image(key, H, W, sigma=1.5)
    # the scene is a fronto-parallel textured plane at depth_plane:
    # the tcam image is the ref image pushed through the true homography
    Hd = ps.plane_homography(K, K, R_rel, t_rel, depth_plane)
    t_img, _ = ps.warp_homography(ref, jnp.linalg.inv(Hd), (H, W))
    return ref, t_img, K, R_rel, t_rel


def test_rectified_volume_finds_plane():
    key = jax.random.PRNGKey(2)
    d_true = 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(key, depth_plane=d_true)
    depths = ps.inverse_depth_planes(3.0, 9.0, 32)
    sim = rf.pair_similarity_rectified(
        ref, t_img, K, K, R_rel, t_rel, depths
    )
    # cost minimum at the true plane for most valid pixels
    cost = (1.0 - sim) * 0.5 * 255.0
    valid = np.asarray(sim > -1.0).any(0)
    best = np.asarray(jnp.argmin(cost, axis=0))
    d_est = np.asarray(depths)[best]
    interior = np.zeros_like(valid)
    interior[12:-12, 12:-12] = True
    sel = valid & interior
    assert sel.mean() > 0.4
    med = np.median(np.abs(d_est[sel] - d_true))
    assert med < 0.35  # within ~1 plane step


def test_rectified_matches_gather_depth():
    """Depth maps from the rectified and gather paths agree."""
    key = jax.random.PRNGKey(3)
    d_true = 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(key, depth_plane=d_true)
    depths = ps.inverse_depth_planes(3.0, 9.0, 32)
    cost_g = ps.similarity_volume(
        ref, t_img[None], K, K[None], R_rel[None], t_rel[None], depths
    )
    cost_r = rf.similarity_volume_rectified(
        ref, t_img[None], K, K[None], R_rel[None], t_rel[None], depths
    )
    d_g, _ = ps.retrieve_best_depth(jnp.asarray(cost_g), depths)
    d_r, _ = ps.retrieve_best_depth(jnp.asarray(cost_r), depths)
    d_g = np.asarray(d_g)
    d_r = np.asarray(d_r)
    ok = (d_g > 0) & (d_r > 0)
    ok[: 12] = ok[-12:] = False
    ok[:, :12] = ok[:, -12:] = False
    assert ok.mean() > 0.3
    diff = np.abs(d_g[ok] - d_r[ok])
    assert np.median(diff) < 0.3


def test_rectification_gate():
    R = np.eye(3)
    assert rf.rectification_ok(R, np.array([1.0, 0, 0.1]))
    assert not rf.rectification_ok(R, np.array([0.05, 0, 1.0]))  # forward
    assert not rf.rectification_ok(R, np.zeros(3))


def test_similarity_volume_auto_mixed():
    """Auto dispatch fuses rectified (sideways tcam) + gather (forward
    tcam) pair volumes and still finds the true plane."""
    key = jax.random.PRNGKey(4)
    d_true = 5.0
    ref, t_img, K, R_rel, t_rel = _pair_setup(key, depth_plane=d_true)
    # second tcam: near-forward motion -> fails the rectification gate
    t_fwd = jnp.asarray([0.02, 0.0, -0.4], jnp.float32)
    Hd = ps.plane_homography(K, K, jnp.eye(3), t_fwd, d_true)
    t_img2, _ = ps.warp_homography(ref, jnp.linalg.inv(Hd), ref.shape)
    assert rf.rectification_ok(np.asarray(R_rel), np.asarray(t_rel))
    assert not rf.rectification_ok(np.eye(3), np.asarray(t_fwd))

    depths = ps.inverse_depth_planes(3.0, 9.0, 32)
    t_imgs = jnp.stack([t_img, t_img2])
    Kt = jnp.stack([K, K])
    Rr = jnp.stack([R_rel, jnp.eye(3, dtype=jnp.float32)])
    tr = jnp.stack([t_rel, t_fwd])
    cost = rf.similarity_volume_auto(ref, t_imgs, K, Kt, Rr, tr, depths)
    assert cost.shape == (32,) + ref.shape
    d_est, _ = ps.retrieve_best_depth(jnp.asarray(cost), depths)
    d_est = np.asarray(d_est)
    ok = d_est > 0
    ok[:12] = ok[-12:] = False
    ok[:, :12] = ok[:, -12:] = False
    med = np.median(np.abs(d_est[ok] - d_true))
    assert med < 0.35


def test_sgm_depth_map_uses_auto(monkeypatch):
    """sgm_depth_map routes through similarity_volume_auto (method knob)."""
    key = jax.random.PRNGKey(5)
    ref, t_img, K, R_rel, t_rel = _pair_setup(key, H=48, W=64, depth_plane=5.0)
    params = ps.SgmParams(n_depths=16, method="rectified")
    depth, sim = ps.sgm_depth_map(
        ref, t_img[None], K, K[None], R_rel[None], t_rel[None], 3.0, 9.0, params
    )
    assert depth.shape == ref.shape
    interior = np.asarray(depth)[12:-12, 12:-12]
    sel = interior > 0
    assert sel.mean() > 0.3
    assert abs(np.median(interior[sel]) - 5.0) < 0.6
