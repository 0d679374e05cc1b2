"""Undistortion family (3DE lens grids) — model math, Newton inverse,
scene IO round-trip, line calibration.

Mirrors the reference's camera::Undistortion contract
(ref: src/aliceVision/camera/Undistortion.hpp, Undistortion3DEA4.cpp,
Undistortion3DEClassicLD.cpp, Undistortion3DERadial4.cpp).
"""

import numpy as np
import pytest

from alicevision_tpu.camera import undistortion as und


ALL_KINDS = [
    und.UNDIST_RADIALK3,
    und.UNDIST_3DEANAMORPHIC4,
    und.UNDIST_3DECLASSICLD,
    und.UNDIST_3DERADIAL4,
]


def _params_for(kind, seed=0):
    rng = np.random.RandomState(seed)
    p = und.default_params(kind)
    if kind == und.UNDIST_RADIALK3:
        p[:3] = [-0.08, 0.02, -0.004]
    elif kind == und.UNDIST_3DEANAMORPHIC4:
        p[:10] = 0.03 * rng.randn(10)
        p[10] = 0.05  # phi
        p[11] = 1.02  # sqx
        p[12] = 0.98  # sqy
    elif kind == und.UNDIST_3DECLASSICLD:
        p[0] = -0.06  # c2
        p[1] = 1.1  # squeeze
        p[2] = 0.01  # cx
        p[3] = -0.02  # cy
        p[4] = 0.008  # c4
    elif kind == und.UNDIST_3DERADIAL4:
        p[:8] = [-0.07, 0.004, -0.003, 0.01, 0.001, -0.002, 0.3, 0.05]
    return p


def test_identity_defaults():
    """Default parameters are the identity warp for every model."""
    pts = np.random.RandomState(1).uniform(-0.8, 0.8, (50, 2))
    for kind in ALL_KINDS:
        out = np.asarray(
            und.undistort_normalized(kind, und.default_params(kind), 1.0, pts)
        )
        np.testing.assert_allclose(out, pts, atol=1e-6)


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_newton_inverse_roundtrip(kind):
    """inverse(undistort(p)) == p to sub-1e-5 normalized units
    (ref: Undistortion3DEA4.cpp:316-334 Newton inverse)."""
    pts = np.random.RandomState(2).uniform(-0.6, 0.6, (40, 2))
    params = _params_for(kind)
    fwd = und.undistort_normalized(kind, params, 1.2, pts)
    back = np.asarray(und.inverse_normalized(kind, params, 1.2, fwd, iters=25))
    np.testing.assert_allclose(back, pts, atol=2e-5)


def test_anamorphic_polar_identity():
    """The x/y-expanded anamorphic polynomial equals the reference's polar
    form xd = xu (1 + cx02 r2 + cx04 r4 + cx22 r2 cos2t + cx24 r4 cos2t +
    cx44 r4 cos4t) (ref: Undistortion3DEA4.cpp:12-60)."""
    params = _params_for(und.UNDIST_3DEANAMORPHIC4)
    # neutralize rotation/squeeze so we exercise the base polynomial only
    params[10] = 0.0
    params[11] = 1.0
    params[12] = 1.0
    pts = np.random.RandomState(3).uniform(-0.7, 0.7, (64, 2))
    got = np.asarray(und.undistort_normalized(und.UNDIST_3DEANAMORPHIC4, params, 1.0, pts))

    x, y = pts[:, 0], pts[:, 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    theta = np.arctan2(y, x)
    c2t, c4t = np.cos(2 * theta), np.cos(4 * theta)
    cx02, cy02, cx22, cy22, cx04, cy04, cx24, cy24, cx44, cy44 = params[:10]
    ex = x * (1 + cx02 * r2 + cx04 * r4 + cx22 * r2 * c2t + cx24 * r4 * c2t + cx44 * r4 * c4t)
    ey = y * (1 + cy02 * r2 + cy04 * r4 + cy22 * r2 * c2t + cy24 * r4 * c2t + cy44 * r4 * c4t)
    np.testing.assert_allclose(got, np.stack([ex, ey], -1), atol=1e-6)


def test_pixel_wrappers_center_and_diagonal():
    """Pixel-space normalization matches Undistortion.cpp:12-36 (center +
    offset shift, half-diagonal scale, pixel-aspect y compression)."""
    u = und.Undistortion.make(
        und.UNDIST_RADIALK3, 2000, 1000, [-0.1, 0.0, 0.0],
        offset=(7.0, -3.0), pixel_aspect_ratio=2.0,
    )
    # center pixel maps to itself (normalized 0)
    center = np.array([2000 / 2 + 7.0, 1000 / 2 - 3.0])
    out = np.asarray(und.undistort_pixels(u, center[None]))
    np.testing.assert_allclose(out[0], center, atol=1e-9)
    # half-diagonal uses h / pixelAspectRatio when not desqueezed
    assert np.isclose(u.half_diagonal(), 0.5 * np.hypot(2000, 500))
    # desqueezed flag switches to the plain diagonal
    u2 = u._replace(is_desqueezed=True)
    assert np.isclose(u2.half_diagonal(), 0.5 * np.hypot(2000, 1000))
    # pixel round trip
    pix = np.random.RandomState(4).uniform([0, 0], [2000, 1000], (20, 2))
    fwd = und.undistort_pixels(u, pix)
    back = np.asarray(und.inverse_pixels(u, fwd, iters=25))
    np.testing.assert_allclose(back, pix, atol=1e-2)


def test_scene_io_roundtrip(tmp_path):
    """undistortionType/Params/Offset/pixelAspectRatio/isDesqueezed survive
    the .sfm round trip (ref: sfmDataIO/jsonIO.cpp:204-222)."""
    from alicevision_tpu import sfmdata

    sc = sfmdata.SfMData.empty()
    idx = sc.add_intrinsic(1001, 1920, 1080, 1400.0)
    u = und.Undistortion.make(
        und.UNDIST_3DEANAMORPHIC4, 1920, 1080, _params_for(und.UNDIST_3DEANAMORPHIC4),
        offset=(2.5, -1.5), pixel_aspect_ratio=1.8, is_desqueezed=True,
    )
    und.set_scene_undistortion(sc, idx, u)
    sc.add_view(1, idx, 1920, 1080, "img.exr")

    path = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, path)
    sc2 = sfmdata.load(path)
    u2 = und.scene_undistortion(sc2, 0)
    assert u2 is not None
    assert u2.kind == und.UNDIST_3DEANAMORPHIC4
    np.testing.assert_allclose(u2.params[:13], u.params[:13], rtol=1e-12)
    np.testing.assert_allclose(u2.offset, [2.5, -1.5])
    assert np.isclose(u2.pixel_aspect_ratio, 1.8)
    assert u2.is_desqueezed
    # scenes without undistortion still read back as None
    assert und.scene_undistortion(sc2, 0) is not None


def test_line_calibration_recovers_classicld():
    """Synthetic straight lines bent by a known 3DEClassicLD grid are
    recovered by the line-straightness LM
    (ref: calibration/distortionEstimationLine.cpp workflow)."""
    from alicevision_tpu.calibration.distortion_lines import (
        calibrate_undistortion_from_lines,
    )

    w, h = 1600, 1200
    true = und.Undistortion.make(und.UNDIST_3DECLASSICLD, w, h)
    tp = true.params.copy()
    tp[0], tp[4] = -0.05, 0.01  # c2, c4 (keep squeeze/cx/cy at defaults)
    true = true._replace(params=tp)

    # straight pixel lines -> distort them with the inverse warp
    G, N = 14, 24
    rng = np.random.RandomState(5)
    lines = []
    for g in range(G):
        if g % 2 == 0:
            y = rng.uniform(0.1 * h, 0.9 * h)
            x = np.linspace(0.05 * w, 0.95 * w, N)
            pts = np.stack([x, np.full(N, y)], -1)
        else:
            x = rng.uniform(0.1 * w, 0.9 * w)
            y = np.linspace(0.05 * h, 0.95 * h, N)
            pts = np.stack([np.full(N, x), y], -1)
        lines.append(pts)
    straight = np.stack(lines)  # (G, N, 2)
    distorted = np.asarray(
        und.inverse_pixels(true, straight.reshape(-1, 2), iters=30)
    ).reshape(G, N, 2)

    init = und.Undistortion.make(und.UNDIST_3DECLASSICLD, w, h)
    fitted, rms0, rms1 = calibrate_undistortion_from_lines(
        distorted, np.ones((G, N), bool), init, free_idx=[0, 4], iters=50,
    )
    assert rms1 < 0.05, (rms0, rms1)
    assert rms1 < rms0 * 0.01
    np.testing.assert_allclose(fitted.params[0], tp[0], atol=2e-3)


def test_undistort_image_straightens():
    """undistort_image resamples a plate so the forward warp is undone."""
    import jax.numpy as jnp

    w, h = 160, 120
    u = und.Undistortion.make(und.UNDIST_RADIALK3, w, h, [-0.15, 0.0, 0.0])
    # plate: a distorted image of a vertical stripe pattern, built by
    # sampling the clean pattern at undistort(p) for each plate pixel
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float64)
    src = np.asarray(und.undistort_pixels(u, grid)).reshape(h, w, 2)
    clean = lambda x: (np.sin(x * 0.5) > 0).astype(np.float32)
    plate = clean(src[..., 0])
    out = np.asarray(und.undistort_image(u, jnp.asarray(plate)))
    expect = clean(np.arange(w, dtype=np.float64))[None, :] * np.ones((h, 1))
    # interior agreement (borders lose data to the warp)
    m = np.abs(out[20:-20, 20:-20] - expect[20:-20, 20:-20])
    assert np.mean(m) < 0.08
