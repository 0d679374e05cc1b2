"""Lidar merge/decimate/mesh pipeline on a synthetic room scan
(ref: main_lidarMerging.cpp, main_lidarDecimating.cpp, main_lidarMeshing.cpp)."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu.mvs import lidar as ld
from alicevision_tpu.pipeline.cli import main


def _scan_sphere(origin, n=1500, radius=2.0, seed=0):
    """Points on a sphere around the origin (a panoramic scan)."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origin + radius * d


def test_lidar_cli_pipeline(tmp_path):
    o1 = np.array([0.3, 0.0, 0.0])
    o2 = np.array([-0.3, 0.1, 0.0])
    p1 = _scan_sphere(o1, seed=0)
    p2 = _scan_sphere(o2, seed=1)
    ld.save_cloud_ply(str(tmp_path / "s1.ply"), p1)
    ld.save_cloud_ply(str(tmp_path / "s2.ply"), p2)
    iset = [
        {"ply": "s1.ply", "origin": list(o1)},
        {"ply": "s2.ply", "origin": list(o2)},
    ]
    iset_f = str(tmp_path / "set.json")
    with open(iset_f, "w") as f:
        json.dump(iset, f)

    merged = str(tmp_path / "merged.ply")
    origins = str(tmp_path / "origins.npy")
    assert main(["lidarMerging", "--input", iset_f, "--output", merged,
                 "--outputOrigins", origins]) == 0
    pts = ld.load_cloud_ply(merged)
    assert len(pts) == 3000

    dec = str(tmp_path / "dec.ply")
    dec_org = str(tmp_path / "dec_org.npy")
    assert main(["lidarDecimating", "--input", merged, "--origins", origins,
                 "--output", dec, "--outputOrigins", dec_org,
                 "--cellSize", "0.25"]) == 0
    pts_d = ld.load_cloud_ply(dec)
    assert 100 < len(pts_d) < len(pts)

    mesh = str(tmp_path / "mesh.obj")
    assert main(["lidarMeshing", "--input", dec, "--origins", dec_org,
                 "--output", mesh]) == 0
    from alicevision_tpu.mesh import load_obj

    v, f = load_obj(mesh)
    assert len(f) > 50
    # Surface should sit near one of the scan spheres (radius 2 around the
    # scanner origins): check radial distance from nearest origin.
    d1 = np.linalg.norm(v - o1, axis=1)
    d2 = np.linalg.norm(v - o2, axis=1)
    r = np.minimum(d1, d2)
    assert np.median(np.abs(r - 2.0)) < 0.35, np.median(np.abs(r - 2.0))


def test_import_e57_cli(tmp_path):
    """importE57 converts scans to an input-set JSON + per-scan PLYs
    (native E2807 reader — no libE57 needed)."""
    from alicevision_tpu.image import e57

    pts = np.random.default_rng(5).normal(0, 1, (200, 3))
    src = str(tmp_path / "scan.e57")
    e57.write_e57(src, pts, pose=((1.0, 0, 0, 0), np.array([4.0, 0.0, 0.0])))
    out = str(tmp_path / "set.json")
    assert main(["importE57", "--input", src, "--output", out]) in (0, None)
    scans = ld.load_input_set(out)
    assert len(scans) == 1
    np.testing.assert_allclose(scans[0][0], pts + [4, 0, 0], atol=1e-5)
    np.testing.assert_allclose(scans[0][1], [4, 0, 0])
    # a missing file still fails cleanly
    assert main(["importE57", "--input", str(tmp_path / "nope.e57"),
                 "--output", out]) != 0
