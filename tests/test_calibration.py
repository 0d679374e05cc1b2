import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.calibration import (
    calibrate_zhang,
    detect_checkerboard,
    xcorner_response,
)


def _render_checkerboard(K, R, t, rows=5, cols=7, square=1.0, wh=(320, 240), ss=3):
    """Render a checkerboard (rows+1 x cols+1 squares -> rows x cols inner
    corners) under a pinhole camera with supersampled antialiasing.
    Returns (image, inner corner pixel coords (rows*cols, 2) row-major)."""
    W, H = wh
    Wm, Hm = W * ss, H * ss
    Ks = K.copy()
    Ks[:2] *= ss
    ys, xs = np.mgrid[0:Hm, 0:Wm]
    # ray through pixel -> intersect board plane z=0 (board frame)
    Kinv = np.linalg.inv(Ks)
    d_cam = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
    # board-to-cam: Xc = R Xb + t; cam center in board frame: cb = -R^T t
    cb = -R.T @ t
    d_board = d_cam @ R  # R^T applied to rows
    dz = d_board[..., 2]
    tt = -cb[2] / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
    Pb = cb[None, None] + tt[..., None] * d_board
    u = Pb[..., 0] / square
    v = Pb[..., 1] / square
    inside = (tt > 0) & (u >= -1) & (u <= cols) & (v >= -1) & (v <= rows)
    color = ((np.floor(u) + np.floor(v)) % 2).astype(np.float32)
    img = np.where(inside, color, 0.5)
    img = img.reshape(H, ss, W, ss).mean(axis=(1, 3)).astype(np.float32)

    corners = []
    for j in range(rows):
        for i in range(cols):
            Xb = np.array([i * square, j * square, 0.0])
            Xc = R @ Xb + t
            p = K @ Xc
            corners.append(p[:2] / p[2])
    return img, np.array(corners)


def _setup_view(angle=0.15, tz=12.0, tx=-3.0, ty=-2.0):
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    from alicevision_tpu import geometry as geo

    R = np.asarray(geo.so3_exp(jnp.asarray([angle, -angle * 0.7, angle * 0.3])))
    t = np.array([tx, ty, tz])
    return K, R, t


def test_xcorner_response_peaks_at_corners():
    K, R, t = _setup_view()
    img, corners = _render_checkerboard(K, R, t)
    resp = np.asarray(xcorner_response(jnp.asarray(img)))
    # response at corners should dominate the global distribution
    vals = []
    for c in corners:
        x, y = int(round(c[0])), int(round(c[1]))
        vals.append(resp[max(0, y - 2) : y + 3, max(0, x - 2) : x + 3].max())
    assert np.median(vals) > np.percentile(resp, 99.0)


def test_detect_checkerboard_grid():
    K, R, t = _setup_view(angle=0.1)
    img, corners = _render_checkerboard(K, R, t)
    grid = detect_checkerboard(jnp.asarray(img), rows=5, cols=7)
    assert grid is not None
    assert grid.shape == (35, 2)
    # every GT corner matched by some detected corner within 1.5 px
    d = np.linalg.norm(grid[None, :, :] - corners[:, None, :], axis=-1)
    assert (d.min(axis=1) < 1.5).all()


def test_calibrate_zhang_recovers_K():
    K_gt = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    from alicevision_tpu import geometry as geo

    rows, cols = 5, 7
    obj = np.array([[i, j] for j in range(rows) for i in range(cols)], float)
    img_pts = []
    rng = np.random.RandomState(0)
    for v in range(6):
        w = np.array([0.3, -0.2, 0.1]) * (v - 2.5) / 2.5 + rng.randn(3) * 0.05
        R = np.asarray(geo.so3_exp(jnp.asarray(w)))
        t = np.array([-3.0 + v * 0.3, -2.0, 12.0 + v * 0.5])
        pts = []
        for o in obj:
            Xc = R @ np.array([o[0], o[1], 0.0]) + t
            p = K_gt @ Xc
            pts.append(p[:2] / p[2])
        img_pts.append(np.array(pts) + rng.randn(len(obj), 2) * 0.1)
    res = calibrate_zhang(obj, np.stack(img_pts))
    assert res["rms"] < 0.2
    np.testing.assert_allclose(res["K"][0, 0], 300.0, rtol=0.02)
    np.testing.assert_allclose(res["K"][1, 1], 300.0, rtol=0.02)
    np.testing.assert_allclose(res["K"][0, 2], 160.0, atol=3.0)
    np.testing.assert_allclose(res["K"][1, 2], 120.0, atol=3.0)


def test_calibrate_zhang_with_distortion():
    """Distorted observations: k1 recovered, rms small."""
    K_gt = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]])
    from alicevision_tpu import geometry as geo

    k1_gt = -0.15
    rows, cols = 5, 7
    obj = np.array([[i, j] for j in range(rows) for i in range(cols)], float)
    img_pts = []
    rng = np.random.RandomState(1)
    for v in range(8):
        w = np.array([0.35, -0.25, 0.15]) * (v - 3.5) / 3.5 + rng.randn(3) * 0.05
        R = np.asarray(geo.so3_exp(jnp.asarray(w)))
        t = np.array([-3.0 + v * 0.25, -2.0 + 0.1 * v, 11.0 + v * 0.4])
        pts = []
        for o in obj:
            Xc = R @ np.array([o[0], o[1], 0.0]) + t
            p = Xc[:2] / Xc[2]
            r2 = p @ p
            p = p * (1 + k1_gt * r2)
            uv = K_gt[:2, :2] @ p + K_gt[:2, 2]
            pts.append(uv)
        img_pts.append(np.array(pts))
    res = calibrate_zhang(obj, np.stack(img_pts), refine_iters=30)
    assert res["rms"] < 0.1, res["rms"]
    assert abs(res["dist"][0] - k1_gt) < 0.02, res["dist"]


def _render_board(rows, cols, H=360, W=480, Hmat=None, k1=0.0, noise=0.0,
                  shade=0.0, square=36, seed=0):
    """Render a checkerboard with optional homography warp, radial
    distortion, brightness gradient and noise; returns (img, gt_corners
    (rows*cols, 2) row-major in the WARPED image)."""
    rng = np.random.RandomState(seed)
    bh, bw = (rows + 1) * square, (cols + 1) * square
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    # base board placed centered
    ox, oy = (W - bw) / 2, (H - bh) / 2

    def warp_inv(x, y):
        # target pixel -> source board pixel (inverse homography + disto)
        if k1 != 0.0:
            cx, cy = W / 2, H / 2
            r2 = ((x - cx) ** 2 + (y - cy) ** 2) / (0.5 * min(H, W)) ** 2
            s = 1.0 + k1 * r2
            x = cx + (x - cx) * s
            y = cy + (y - cy) * s
        if Hmat is not None:
            Hi = np.linalg.inv(Hmat)
            w = Hi[2, 0] * x + Hi[2, 1] * y + Hi[2, 2]
            xs = (Hi[0, 0] * x + Hi[0, 1] * y + Hi[0, 2]) / w
            ys = (Hi[1, 0] * x + Hi[1, 1] * y + Hi[1, 2]) / w
            return xs, ys
        return x, y

    sx, sy = warp_inv(xx, yy)
    bx = np.floor((sx - ox) / square).astype(np.int64)
    by = np.floor((sy - oy) / square).astype(np.int64)
    inside = (sx >= ox) & (sx < ox + bw) & (sy >= oy) & (sy < oy + bh)
    img = np.where(inside & (((bx + by) % 2) == 0), 1.0, 0.25)
    img = np.where(inside, img, 0.6)
    if shade:
        img = img * (1.0 - shade * xx / W)
    if noise:
        img = img + rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 1).astype(np.float32)

    # GT inner corners (forward map)
    gt = []
    for r in range(rows):
        for c in range(cols):
            x, y = ox + (c + 1) * square, oy + (r + 1) * square
            if Hmat is not None:
                w = Hmat[2, 0] * x + Hmat[2, 1] * y + Hmat[2, 2]
                x, y = (
                    (Hmat[0, 0] * x + Hmat[0, 1] * y + Hmat[0, 2]) / w,
                    (Hmat[1, 0] * x + Hmat[1, 1] * y + Hmat[1, 2]) / w,
                )
            if k1 != 0.0:
                # invert the display-side undistort numerically
                cx, cy = W / 2, H / 2
                px, py = x, y
                for _ in range(20):
                    r2 = ((px - cx) ** 2 + (py - cy) ** 2) / (0.5 * min(H, W)) ** 2
                    s = 1.0 + k1 * r2
                    px, py = cx + (x - cx) / s, cy + (y - cy) / s
                x, y = px, py
            gt.append([x, y])
    return img, np.array(gt)


def _match_grid(det, gt, rows, cols):
    """Best alignment of detected grid to GT over the 8 grid symmetries."""
    det = det.reshape(rows, cols, 2)
    gtg = gt.reshape(rows, cols, 2)
    best = np.inf
    cands = [det, det[::-1], det[:, ::-1], det[::-1, ::-1]]
    if rows == cols:
        t = det.transpose(1, 0, 2)
        cands += [t, t[::-1], t[:, ::-1], t[::-1, ::-1]]
    for c in cands:
        err = np.linalg.norm(c - gtg, axis=-1).mean()
        best = min(best, err)
    return best


def test_checkerboard_perspective_warp():
    """Board growing survives a strong perspective warp
    (ref: checkerDetector.cpp growing vs our old global-lattice fit)."""
    Hmat = np.array([
        [0.95, 0.12, 12.0],
        [-0.08, 0.9, 18.0],
        [2.0e-4, 3.5e-4, 1.0],
    ])
    img, gt = _render_board(5, 7, Hmat=Hmat, noise=0.01)
    det = detect_checkerboard(jnp.asarray(img), 5, 7)
    assert det is not None
    err = _match_grid(det, gt, 5, 7)
    assert err < 1.0, err


def test_checkerboard_distorted_noisy_shaded():
    """Radial distortion + noise + brightness gradient."""
    img, gt = _render_board(5, 7, k1=-0.12, noise=0.03, shade=0.35, seed=2)
    det = detect_checkerboard(jnp.asarray(img), 5, 7)
    assert det is not None
    err = _match_grid(det, gt, 5, 7)
    assert err < 1.2, err
