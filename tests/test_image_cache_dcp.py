"""ImageCache LRU semantics + DCP profile parsing/transform
(ref: image/ImageCache.hpp, image/dcp.cpp)."""

import numpy as np

from alicevision_tpu.image import ImageCache
from alicevision_tpu.utils.dcp import DCPProfile


def test_image_cache_lru_eviction_and_hits():
    reads = []

    def fake_read(path):
        reads.append(path)
        return np.zeros((100, 100), np.float32)  # 40 KB

    cache = ImageCache(capacity_bytes=100_000, read_fn=fake_read)
    a = cache.get("a")
    a2 = cache.get("a")
    assert a is a2 and reads == ["a"] and cache.hits == 1

    cache.get("b")
    cache.get("c")  # 120 KB total -> evicts "a" (LRU)
    assert cache.size_bytes <= 100_000
    cache.get("a")  # miss again
    assert reads == ["a", "b", "c", "a"]

    # downscale keyed separately
    d = cache.get("c", downscale=2)
    assert d.shape == (50, 50)
    assert cache.misses == 5


_DCP_XML = """
<dcpData>
 <ProfileName>Test Cam</ProfileName>
 <CalibrationIlluminant1>17</CalibrationIlluminant1>
 <CalibrationIlluminant2>21</CalibrationIlluminant2>
 <ForwardMatrix1>
  <Element Row="0" Col="0">0.9</Element><Element Row="0" Col="1">0.05</Element><Element Row="0" Col="2">0.01</Element>
  <Element Row="1" Col="0">0.3</Element><Element Row="1" Col="1">0.9</Element><Element Row="1" Col="2">-0.1</Element>
  <Element Row="2" Col="0">0.0</Element><Element Row="2" Col="1">0.1</Element><Element Row="2" Col="2">0.7</Element>
 </ForwardMatrix1>
 <ForwardMatrix2>
  <Element Row="0" Col="0">1.0</Element><Element Row="0" Col="1">0.0</Element><Element Row="0" Col="2">0.0</Element>
  <Element Row="1" Col="0">0.2</Element><Element Row="1" Col="1">1.0</Element><Element Row="1" Col="2">-0.2</Element>
  <Element Row="2" Col="0">0.0</Element><Element Row="2" Col="1">0.0</Element><Element Row="2" Col="2">0.8</Element>
 </ForwardMatrix2>
</dcpData>
"""


def test_dcp_parse_and_interpolate():
    p = DCPProfile.from_xml(_DCP_XML)
    assert p.name == "Test Cam"
    m1 = p.interpolated_matrix(2856.0, "forward")
    np.testing.assert_allclose(m1[0, 0], 0.9, atol=1e-6)
    m2 = p.interpolated_matrix(6500.0, "forward")
    np.testing.assert_allclose(m2[0, 0], 1.0, atol=1e-6)
    mid = p.interpolated_matrix(4000.0, "forward")
    assert 0.9 < mid[0, 0] < 1.0

    M = p.camera_to_srgb_matrix(5000.0)
    assert M.shape == (3, 3) and np.isfinite(M).all()

    img = np.full((4, 4, 3), 0.5, np.float32)
    out = np.asarray(p.apply(img))
    assert out.shape == (4, 4, 3) and np.isfinite(out).all()


def test_image_processing_cli_dcp(tmp_path):
    """imageProcessing --dcp applies the camera->sRGB color transform."""
    from alicevision_tpu.pipeline.cli import main

    dcp = str(tmp_path / "cam.dcpxml")
    with open(dcp, "w") as f:
        f.write(_DCP_XML)
    img = np.random.default_rng(0).uniform(0.1, 0.9, (32, 40, 3)).astype(np.float32)
    src = str(tmp_path / "in.npy")
    np.save(src, img)
    dst = str(tmp_path / "out.npy")
    rc = main(["imageProcessing", "--input", src, "--output", dst,
               "--dcp", dcp, "--cct", "5000"])
    assert rc in (0, None)
    out = np.load(dst)
    assert out.shape == img.shape and np.isfinite(out).all()
    assert not np.allclose(out, img)  # the transform did something
