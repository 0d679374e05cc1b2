"""CLI utility-stage tests (transform, stats, export, split360, processing)."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu.pipeline.cli import main
from alicevision_tpu import sfmdata


@pytest.fixture()
def scene_file(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_stats_alignment_io import _consistent_scene

    sc = _consistent_scene()
    p = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, p)
    return p


def test_cli_sfm_transform_and_quality(scene_file, tmp_path, capsys):
    out = str(tmp_path / "centered.sfm")
    assert main(["sfmTransform", "--input", scene_file, "--output", out]) == 0
    sc = sfmdata.load(out)
    assert np.linalg.norm(sc.pose_c.mean(0)) < 1e-6

    # quality vs the original: similarity-aligned ATE ~ 0
    assert main(["qualityEvaluation", "--input", out, "--groundTruth", scene_file]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ate_rmse"] < 1e-6


def test_cli_export_colmap_and_stats(scene_file, tmp_path, capsys):
    out = str(tmp_path / "colmap")
    assert main(["exportColmap", "--input", scene_file, "--output", out]) == 0
    assert os.path.exists(os.path.join(out, "cameras.txt"))

    html = str(tmp_path / "report.html")
    assert main(["sfmStatistics", "--input", scene_file, "--output", html]) == 0
    assert os.path.exists(html)
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["n_posed"] == 6


def test_cli_split360(tmp_path):
    from alicevision_tpu.image.io import write_image

    pano = np.random.RandomState(0).rand(64, 128).astype(np.float32)
    p = str(tmp_path / "pano.png")
    write_image(p, pano)
    out = str(tmp_path / "splits")
    assert main(["split360Images", "--input", p, "--output", out,
                 "--nbSplits", "4", "--outSize", "64"]) == 0
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 4
    assert os.path.exists(os.path.join(out, "cameras.npz"))


def test_cli_image_processing(tmp_path):
    from alicevision_tpu.image.io import write_image, read_image

    img = np.random.RandomState(1).rand(64, 64).astype(np.float32)
    src = str(tmp_path / "in.png")
    dst = str(tmp_path / "out.png")
    write_image(src, img)
    assert main(["imageProcessing", "--input", src, "--output", dst,
                 "--scale", "0.5", "--sharpen", "0.5"]) == 0
    out = read_image(dst)
    assert out.shape[:2] == (32, 32)


def test_cli_keyframe_regular(tmp_path):
    from alicevision_tpu.image.io import write_image

    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    for i in range(9):
        write_image(os.path.join(folder, f"f{i:03d}.png"),
                    np.full((16, 16), i / 10, np.float32))
    out = str(tmp_path / "sel.txt")
    assert main(["keyframeSelection", "--inputFolder", folder, "--output", out,
                 "--method", "regular", "--step", "4"]) == 0
    lines = open(out).read().split()
    assert lines == ["f000.png", "f004.png", "f008.png"]


def test_shipped_sensor_database():
    """The full shipped sensor table resolves real camera models
    (ref: sensorDB/cameraSensors.db ~7.5k rows)."""
    from alicevision_tpu.utils.sensor_db import sensor_width_mm, shipped_database

    db = shipped_database()
    assert len(db) > 5000
    w, found = sensor_width_mm("Canon", "Canon EOS 70D")
    assert found and 20.0 < w < 25.0
    w, found = sensor_width_mm("NIKON CORPORATION", "NIKON D90")
    assert found and 22.0 < w < 25.0
