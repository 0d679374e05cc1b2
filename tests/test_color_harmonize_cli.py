"""sfmColorHarmonize with matched-region statistics: a synthetic per-view
gain/offset perturbation must be recovered (ref:
colorHarmonization/GainOffsetConstraintBuilder.cpp histogram constraints).
"""

import json
import os

import numpy as np
import pytest

from alicevision_tpu.misc.color_harmonization import (
    harmonize_gains,
    matched_quantile_constraints,
    patch_means,
)


def test_patch_means_integral_image():
    img = np.arange(100, dtype=np.float64).reshape(10, 10) / 100.0
    xy = np.array([[5.0, 5.0], [0.0, 0.0]])
    m = patch_means(img, xy, radius=1)
    assert m[0] == pytest.approx(img[4:7, 4:7].mean())
    assert m[1] == pytest.approx(img[0:2, 0:2].mean())


def test_gain_offset_recovery_from_matched_regions():
    """3 views of the same texture with different gains/offsets; quantile
    constraints from matched patches recover the correction to <2%."""
    rng = np.random.default_rng(0)
    H, W = 120, 160
    base = rng.random((H, W)) * 0.5 + 0.25
    # smooth to make patches informative
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same")
    true_g = np.array([1.0, 1.3, 0.8])
    true_o = np.array([0.0, -0.05, 0.1])
    imgs = [np.clip(base * g + o, 0, 1) for g, o in zip(true_g, true_o)]

    # matched keypoints = common random positions (same scene points)
    M = 200
    xy = np.stack(
        [rng.uniform(8, W - 8, M), rng.uniform(8, H - 8, M)], axis=1
    )
    edges, mi, mj = [], [], []
    for i in range(3):
        for j in range(i + 1, 3):
            q_i, q_j = matched_quantile_constraints(imgs[i], imgs[j], xy, xy)
            for a, b in zip(q_i, q_j):
                edges.append((i, j))
                mi.append(a)
                mj.append(b)
    import jax.numpy as jnp

    g, o = harmonize_gains(3, np.asarray(edges), jnp.asarray(mi), jnp.asarray(mj))
    g = np.asarray(g)
    o = np.asarray(o)
    # harmonized images should match view 0's radiometry:
    # img_v * g_v + o_v ~ base * (true_g0) + true_o0
    for v in range(3):
        rec = imgs[v] * g[v] + o[v]
        err = np.abs(rec - imgs[0]).mean()
        assert err < 0.02, (v, err)
    # gains recover the inverse perturbation to <2%
    rel = g * true_g / (g[0] * true_g[0])
    np.testing.assert_allclose(rel, 1.0, atol=0.02)


def test_cli_harmonize_end_to_end(tmp_path):
    """Drive the sfmColorHarmonize subcommand on a rendered dataset."""
    from alicevision_tpu.pipeline import stages
    from alicevision_tpu.pipeline.cli import main as cli_main
    from alicevision_tpu.utils.render import make_test_dataset
    from alicevision_tpu.image.io import read_image, write_image

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    make_test_dataset(str(img_dir), n_views=3, wh=(240, 180), focal=200.0)
    # apply a known gain to view 2's image
    files = sorted(os.listdir(img_dir))
    tgt = os.path.join(img_dir, files[2])
    img = read_image(tgt, grayscale=True)
    write_image(tgt, np.clip(np.asarray(img) * 1.4, 0, 1))

    scene = str(tmp_path / "s.sfm")
    stages.camera_init(str(img_dir), scene, default_focal_px=200.0)
    feats = str(tmp_path / "feats")
    stages.feature_extraction(scene, feats, max_keypoints=1024, downscale_to=0)
    pairs_f = str(tmp_path / "pairs.txt")
    stages.image_matching(scene, feats, pairs_f, method="exhaustive")
    matches_f = str(tmp_path / "m.npz")
    stages.feature_matching(scene, feats, pairs_f, matches_f)

    out = str(tmp_path / "harmonized")
    rc = cli_main([
        "sfmColorHarmonize", "--input", scene, "--features", feats,
        "--matches", matches_f, "--imagesFolder", str(img_dir),
        "--output", out,
    ])
    assert rc == 0
    outs = sorted(os.listdir(out))
    assert len(outs) == 3
    # the brightened view should be pulled back toward the others
    h2 = np.asarray(read_image(os.path.join(out, outs[2]), grayscale=True))
    h0 = np.asarray(read_image(os.path.join(out, outs[0]), grayscale=True))
    assert abs(h2.mean() - h0.mean()) < 0.08, (h2.mean(), h0.mean())
