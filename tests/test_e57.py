"""Native E57 reader/writer tests (image/e57.py)."""

import numpy as np
import pytest

from alicevision_tpu.image import e57


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert e57.crc32c(b"\x00" * 32) == 0x8A9136AA
    # "123456789" -> 0xE3069283
    assert e57.crc32c(b"123456789") == 0xE3069283


def test_roundtrip_points(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 10, (5000, 3))
    path = str(tmp_path / "scan.e57")
    e57.write_e57(path, pts)
    data = e57.read_e57(path)
    assert len(data["scans"]) == 1
    np.testing.assert_allclose(data["points"], pts, rtol=0, atol=1e-12)


def test_roundtrip_with_intensity_and_pose(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 2, (1234, 3))
    inten = rng.uniform(0, 1, 1234)
    # 90-degree rotation about z + translation
    q = (np.sqrt(0.5), 0.0, 0.0, np.sqrt(0.5))
    t = np.array([10.0, -5.0, 2.0])
    path = str(tmp_path / "scan.e57")
    e57.write_e57(path, pts, intensity=inten, pose=(q, t))
    data = e57.read_e57(path)
    scan = data["scans"][0]
    np.testing.assert_allclose(scan["intensity"], inten, atol=1e-12)
    R, t_read = scan["pose"]
    np.testing.assert_allclose(t_read, t)
    # points come back in WORLD coordinates
    expect = pts @ R.T + t
    np.testing.assert_allclose(scan["points"], expect, atol=1e-9)


def test_multi_packet(tmp_path):
    """More points than fit in one 64KB packet."""
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 1, (30000, 3))
    path = str(tmp_path / "big.e57")
    e57.write_e57(path, pts, chunk=1000)
    data = e57.read_e57(path)
    np.testing.assert_allclose(data["points"], pts, atol=1e-12)


def test_page_crcs_verify(tmp_path):
    """Every 1024-byte page ends in a valid CRC-32C of its payload."""
    pts = np.ones((100, 3))
    path = str(tmp_path / "crc.e57")
    e57.write_e57(path, pts)
    raw = open(path, "rb").read()
    assert len(raw) % e57.PAGE == 0
    for p in range(len(raw) // e57.PAGE):
        page = raw[p * e57.PAGE : (p + 1) * e57.PAGE]
        crc = int.from_bytes(page[-4:], "little")
        assert crc == e57.crc32c(page[:-4]), f"page {p}"


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "bad.e57")
    with open(path, "wb") as f:
        f.write(b"NOTE57!!" + b"\x00" * 100)
    with pytest.raises(ValueError):
        e57.read_e57(path)


def test_scaled_integer_decode():
    """Bit-packed ScaledInteger decoding (the common scanner encoding)."""
    import xml.etree.ElementTree as ET

    el = ET.fromstring(
        '<cartesianX type="ScaledInteger" minimum="-1000" maximum="1000" '
        'scale="0.01" offset="0.5"/>'
    )
    f = e57._Field(el)
    assert f.bits == 11
    raw_vals = np.array([0, 1, 500, 2000], np.int64)  # stored - minimum
    bits = np.zeros(4 * 11, np.uint8)
    for i, v in enumerate(raw_vals):
        for b in range(11):
            bits[i * 11 + b] = (v >> b) & 1
    packed = np.packbits(bits, bitorder="little")
    out = f.decode(packed, 4)
    expect = (raw_vals - 1000) * 0.01 + 0.5
    np.testing.assert_allclose(out, expect)


def test_lidar_input_set_with_e57(tmp_path):
    from alicevision_tpu.mvs import lidar as ld
    import json

    pts = np.random.default_rng(3).normal(0, 1, (500, 3))
    e57.write_e57(str(tmp_path / "scan.e57"), pts,
                  pose=((1.0, 0, 0, 0), np.array([1.0, 2.0, 3.0])))
    with open(tmp_path / "set.json", "w") as f:
        json.dump([{"ply": "scan.e57"}], f)
    scans = ld.load_input_set(str(tmp_path / "set.json"))
    assert len(scans) == 1
    np.testing.assert_allclose(scans[0][1], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(scans[0][0], pts + [1, 2, 3], atol=1e-9)
