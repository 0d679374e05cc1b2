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


def test_import_e57_gated(tmp_path):
    with pytest.raises(RuntimeError, match="libE57"):
        ld.read_e57("scan.e57")
    assert main(["importE57", "--input", "x.e57", "--output", "y.ply"]) != 0
