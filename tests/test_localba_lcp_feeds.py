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
