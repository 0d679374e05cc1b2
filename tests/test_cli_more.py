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
