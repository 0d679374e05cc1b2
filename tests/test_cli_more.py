"""Smoke tests for voctreeCreation / computeUncertainty / nodalSfM CLIs."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu.pipeline.cli import main
from alicevision_tpu import sfmdata


def test_cli_compute_uncertainty(tmp_path, capsys):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_stats_alignment_io import _consistent_scene

    sc = _consistent_scene()
    scene_f = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, scene_f)
    out = str(tmp_path / "cov.npz")
    assert main(["computeUncertainty", "--input", scene_f, "--output", out]) == 0
    with np.load(out) as z:
        cov = z["covariances"]
        assert cov.shape == (6, 6, 6)
        assert np.isfinite(cov).all()
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["mean_trace"] >= 0


def test_cli_voctree_creation(tmp_path):
    rng = np.random.RandomState(0)
    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1, 100, 100, 50.0)
    feats = str(tmp_path / "feats")
    os.makedirs(feats)
    for v in range(3):
        sc.add_view(10 + v, ii, 100, 100)
        np.savez_compressed(
            os.path.join(feats, f"{10 + v}.feat.npz"),
            xy=rng.rand(64, 2),
            scale=np.ones(64),
            orientation=np.zeros(64),
            response=np.ones(64),
            desc=rng.rand(64, 16).astype(np.float32),
            valid=np.ones(64, bool),
        )
    scene_f = str(tmp_path / "s.sfm")
    sfmdata.save(sc, scene_f)
    out = str(tmp_path / "tree.npz")
    assert main(["voctreeCreation", "--input", scene_f, "--features", feats,
                 "--output", out, "--branching", "4", "--levels", "2"]) == 0
    with np.load(out) as z:
        assert z["centers"].shape[0] == 2  # levels


def test_cli_mesh_ops(tmp_path):
    """meshDenoising / meshResampling / meshDecimate --targetFaces round-trip
    through OBJ files (ref: main_meshDenoising.cpp, main_meshResampling.cpp)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mesh import _unit_sphere_mesh
    from alicevision_tpu.mesh import save_obj, load_obj

    v, f = _unit_sphere_mesh(2)
    rng = np.random.RandomState(0)
    src = str(tmp_path / "in.obj")
    save_obj(src, v + rng.randn(*v.shape) * 0.01, f)

    den = str(tmp_path / "den.obj")
    assert main(["meshDenoising", "--input", src, "--output", den, "--iterations", "3"]) == 0
    dv, df = load_obj(den)
    assert len(dv) == len(v) and len(df) == len(f)

    res = str(tmp_path / "res.obj")
    assert main(["meshResampling", "--input", den, "--output", res, "--targetEdge", "0.2"]) == 0
    rv, rf = load_obj(res)
    assert len(rf) > 10

    dec = str(tmp_path / "dec.obj")
    assert main(["meshDecimate", "--input", src, "--output", dec, "--targetFaces", "64"]) == 0
    qv, qf = load_obj(dec)
    assert len(qf) < len(f)


def test_cli_mesh_masking(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mesh import _unit_sphere_mesh
    from alicevision_tpu.mesh import save_obj, load_obj
    from alicevision_tpu.image.io import write_image

    v, f = _unit_sphere_mesh(2)
    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1, 200, 200, 100.0)
    vi = sc.add_view(42, ii, 200, 200)
    # Camera at z=-4 looking +z toward the sphere at origin.
    R = np.eye(3)
    sc.set_pose(vi, R, np.array([0.0, 0.0, -4.0]))
    scene_f = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, scene_f)

    masks = tmp_path / "masks"
    masks.mkdir()
    m = np.zeros((200, 200), np.float32)
    m[:, 100:] = 1.0  # keep +x half
    write_image(str(masks / "42.png"), m)

    mesh_in = str(tmp_path / "m.obj")
    save_obj(mesh_in, v, f)
    out = str(tmp_path / "masked.obj")
    assert main([
        "meshMasking", "--input", scene_f, "--mesh", mesh_in,
        "--masks", str(masks), "--output", out,
    ]) == 0
    mv, mf = load_obj(out)
    assert 0 < len(mf) < len(f)
    c = mv[mf.astype(int)].mean(1)
    assert (c[:, 0] > -0.1).all()
