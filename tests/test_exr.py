"""Native EXR scanline IO (ref: image/io.cpp OIIO EXR path, mapIO.hpp)."""

import numpy as np

from alicevision_tpu.image.exr import read_exr, write_exr
from alicevision_tpu.image.io import read_image, write_image


def test_exr_roundtrip_gray(tmp_path):
    img = np.random.RandomState(0).rand(37, 53).astype(np.float32) * 10 - 3
    p = str(tmp_path / "depth.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip_rgb(tmp_path):
    img = np.random.RandomState(1).rand(64, 48, 3).astype(np.float32)
    p = str(tmp_path / "rgb.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_exr_incompressible_block(tmp_path):
    # random noise rarely compresses; exercises the raw-block branch
    img = (np.random.RandomState(2).rand(33, 31).astype(np.float32) * 1e8)
    p = str(tmp_path / "noise.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p), img)


def test_write_image_read_image_exr(tmp_path):
    img = np.random.RandomState(3).rand(20, 30, 3).astype(np.float32)
    p = str(tmp_path / "x.exr")
    write_image(p, img)
    back = read_image(p)
    np.testing.assert_allclose(back, img, atol=1e-7)


def test_exr_readable_by_cv2_if_codec_present(tmp_path):
    """Cross-check against an independent decoder when available."""
    try:
        import os
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2
    except Exception:
        return
    img = np.random.RandomState(4).rand(16, 24, 3).astype(np.float32)
    p = str(tmp_path / "cv.exr")
    write_exr(p, img)
    got = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    if got is None:  # codec disabled in this build
        return
    np.testing.assert_allclose(got[..., ::-1], img, atol=1e-7)
