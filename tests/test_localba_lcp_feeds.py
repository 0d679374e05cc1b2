import os

import numpy as np

from alicevision_tpu.sfm import local_ba as lba
from alicevision_tpu.utils.lcp import parse_lcp
from alicevision_tpu.image.feeds import feed_provider, image_feed


def test_covisibility_and_distances():
    # views 0-1-2 chained by shared landmarks, 3 isolated
    obs_view = np.array([0, 1, 0, 1, 1, 2, 1, 2] * 8)
    obs_lm = np.repeat(np.arange(16), 4)[: len(obs_view)]
    # construct cleanly: landmarks 0..7 seen by (0,1); 8..15 by (1,2)
    obs_view = np.array([0, 1] * 8 + [1, 2] * 8)
    obs_lm = np.concatenate([np.repeat(np.arange(8), 2), np.repeat(np.arange(8, 16), 2)])
    edges = lba.covisibility_edges(obs_view, obs_lm, min_shared=4)
    assert (0, 1) in edges and (1, 2) in edges and (0, 2) not in edges

    dist = lba.graph_distances(4, edges, [0])
    assert dist[0] == 0 and dist[1] == 1 and dist[2] == 2
    assert dist[3] > 100


def test_local_ba_fixed_mask():
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    posed = np.ones(5, bool)
    fixed = lba.local_ba_fixed_mask(5, edges, new_views=[4], posed=posed, dist_refine=1)
    assert not fixed[4] and not fixed[3]
    assert fixed[0] and fixed[1] and fixed[2]


_LCP_SAMPLE = """<?xml version="1.0" encoding="UTF-8"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description xmlns:stCamera="http://ns.adobe.com/photoshop/1.0/camera-raw-settings"
    stCamera:Model="TestCam X1" stCamera:Lens="Test 24-70mm"/>
  <rdf:Description xmlns:stCamera="http://ns.adobe.com/photoshop/1.0/camera-raw-settings"
    stCamera:FocalLength="24.0" stCamera:FocalLengthX="0.6901" stCamera:FocalLengthY="0.6901"
    stCamera:ImageXCenter="0.5021" stCamera:ImageYCenter="0.4987"
    stCamera:RadialDistortParam1="-0.05" stCamera:RadialDistortParam2="0.01"
    stCamera:RadialDistortParam3="-0.002"/>
  <rdf:Description xmlns:stCamera="http://ns.adobe.com/photoshop/1.0/camera-raw-settings"
    stCamera:FocalLength="70.0" stCamera:FocalLengthX="2.013" stCamera:FocalLengthY="2.013"
    stCamera:ImageXCenter="0.5000" stCamera:ImageYCenter="0.5000"
    stCamera:RadialDistortParam1="0.02" stCamera:RadialDistortParam2="-0.004"
    stCamera:RadialDistortParam3="0.0004"/>
 </rdf:RDF>
</x:xmpmeta>"""


def test_lcp_parse_and_interpolate(tmp_path):
    p = str(tmp_path / "lens.lcp")
    with open(p, "w") as f:
        f.write(_LCP_SAMPLE)
    prof = parse_lcp(p)
    assert prof.camera == "TestCam X1"
    assert len(prof.alternates) == 2
    # interpolation at 47mm = midpoint
    alt = prof.interpolate(47.0)
    np.testing.assert_allclose(alt.focal_x, (0.6901 + 2.013) / 2, atol=1e-6)
    np.testing.assert_allclose(alt.radial[0], (-0.05 + 0.02) / 2, atol=1e-6)
    # clamping outside range
    assert prof.interpolate(10.0).focal_mm == 24.0


def test_image_feed(tmp_path):
    from alicevision_tpu.image.io import write_image

    for i in range(3):
        write_image(str(tmp_path / f"im{i}.png"), np.full((8, 8), i / 4, np.float32))
    frames = list(image_feed(str(tmp_path)))
    assert len(frames) == 3
    assert frames[0][1] == "im0.png"
    assert frames[2][0].shape == (8, 8)

    # provider dispatch: single image
    single = list(feed_provider(str(tmp_path / "im1.png")))
    assert len(single) == 1


def test_lcp_image_application(tmp_path):
    """LCP geometry + vignette correction applied to images
    (the reference's main_imageProcessing.cpp lensCorrection path)."""
    import jax.numpy as jnp
    from alicevision_tpu.image.processing import (
        apply_lcp_geometry, apply_lcp_vignette,
    )
    from alicevision_tpu.utils.lcp import LcpAlternate

    H, W = 120, 160
    rng = np.random.default_rng(0)
    alt = LcpAlternate(
        focal_mm=24.0, focal_x=0.7, focal_y=0.7, cx=0.5, cy=0.5,
        radial=(-0.15, 0.02, 0.0), vignette=(-0.6, 0.1, 0.0),
    )

    # --- vignette: apply the forward model, correct, compare to flat ---
    flat = np.full((H, W), 0.8, np.float32)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = (gx / W - alt.cx) / alt.focal_x
    v = (gy / H - alt.cy) / alt.focal_y
    r2 = u * u + v * v
    g_model = 1 + alt.vignette[0] * r2 + alt.vignette[1] * r2 * r2
    vignetted = flat * g_model
    restored = np.asarray(apply_lcp_vignette(jnp.asarray(vignetted), alt))
    # series inversion: accurate to a fraction of a percent at these radii
    assert np.abs(restored - flat).max() < 0.01

    # --- geometry: out(p) must equal captured(distort(p)) with the
    # reference's conventions (undistortRectilinearGeometryLCP) ---
    from scipy.ndimage import map_coordinates

    captured = np.asarray(
        0.5 + 0.4 * np.sin(gx * 0.21) * np.cos(gy * 0.17), np.float32
    )
    dmax = float(max(H, W))
    uu = (gx - alt.cx * W) / (alt.focal_x * dmax)
    vv = (gy - alt.cy * H) / (alt.focal_y * dmax)
    rr = uu * uu + vv * vv
    s = 1 + alt.radial[0] * rr + alt.radial[1] * rr * rr
    xd = uu * s * (alt.focal_x * dmax) + alt.cx * W
    yd = vv * s * (alt.focal_y * dmax) + alt.cy * H
    expect = map_coordinates(captured, [yd, xd], order=1, cval=0.0)
    out = np.asarray(apply_lcp_geometry(jnp.asarray(captured), alt))
    inner = (slice(10, -10), slice(10, -10))
    assert np.abs(out[inner] - expect[inner]).max() < 1e-3


def test_image_processing_cli_lcp(tmp_path):
    from alicevision_tpu.pipeline.cli import main

    lcp = str(tmp_path / "lens.lcp")
    with open(lcp, "w") as f:
        f.write(_LCP_SAMPLE)
    img = np.random.default_rng(1).uniform(0, 1, (60, 80, 3)).astype(np.float32)
    src = str(tmp_path / "in.npy")
    np.save(src, img)
    dst = str(tmp_path / "out.npy")
    rc = main(["imageProcessing", "--input", src, "--output", dst,
               "--lcp", lcp, "--focalMm", "24"])
    assert rc in (0, None)
    out = np.load(dst)
    assert out.shape == img.shape and np.isfinite(out).all()
