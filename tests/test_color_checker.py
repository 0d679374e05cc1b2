import numpy as np

from alicevision_tpu.misc.color_checker import (
    MACBETH_SRGB,
    apply_color_correction,
    color_correction_matrix,
    detect_color_checker,
)


def _render_chart(gain=1.0, offset=0.0, patch=28, gap=6, margin=30, noise=0.01):
    rows, cols = 4, 6
    H = 2 * margin + rows * patch + (rows - 1) * gap
    W = 2 * margin + cols * patch + (cols - 1) * gap
    rng = np.random.RandomState(0)
    # near-black background — distinct from every chart color so patch
    # boundaries always carry a variance edge
    img = np.full((H, W, 3), 0.02, np.float32)
    centers = []
    for r in range(rows):
        for c in range(cols):
            y0 = margin + r * (patch + gap)
            x0 = margin + c * (patch + gap)
            col = np.clip(MACBETH_SRGB[r * cols + c] * gain + offset, 0, 1)
            img[y0 : y0 + patch, x0 : x0 + patch] = col
            centers.append([x0 + patch / 2, y0 + patch / 2])
    img += rng.randn(H, W, 3) * noise
    return np.clip(img, 0, 1), np.array(centers)


def test_detect_color_checker():
    img, centers_gt = _render_chart()
    res = detect_color_checker(img)
    assert res is not None
    grid, colors = res
    assert grid.shape == (24, 2)
    # centers close to ground truth (row-major order, canonical orientation)
    d = np.linalg.norm(grid - centers_gt, axis=-1)
    assert np.median(d) < 4.0, np.median(d)
    # colors close to the chart values
    err = np.abs(colors - MACBETH_SRGB).mean()
    assert err < 0.04, err


def test_color_correction_roundtrip():
    img, _ = _render_chart(gain=0.8, offset=0.05)
    res = detect_color_checker(img)
    assert res is not None
    _, measured = res
    M = color_correction_matrix(measured)
    corrected = apply_color_correction(img, M)
    res2 = detect_color_checker(corrected)
    assert res2 is not None
    _, colors2 = res2
    assert np.abs(colors2 - MACBETH_SRGB).mean() < 0.03
