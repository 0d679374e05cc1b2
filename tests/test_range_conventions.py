"""Farm-chunking conventions: out-of-range chunks succeed with no output.

The reference's chunked tools return success for empty ranges so render-farm
jobs don't fail when the chunk grid overshoots the item count
(ref: src/software/pipeline/main_featureMatching.cpp:268). Pin the same
contract for the stage API and the CLI.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("rangeconv")
    img_dir = d / "imgs"
    img_dir.mkdir()
    from alicevision_tpu.utils.render import make_test_dataset

    make_test_dataset(str(img_dir), n_views=3, wh=(160, 120), focal=150.0)
    scene = d / "scene.sfm"
    from alicevision_tpu.pipeline import stages

    stages.camera_init(str(img_dir), str(scene), default_focal_px=150.0)
    return d, scene


def test_feature_extraction_empty_range(tiny_scene):
    d, scene = tiny_scene
    out = d / "feats_empty"
    from alicevision_tpu.pipeline import stages

    # chunk grid overshoot: rangeStart beyond the number of views
    stages.feature_extraction(
        str(scene), str(out), max_keypoints=64, range_start=100, range_size=50
    )
    assert sorted(os.listdir(out)) == []  # success, no output


def test_feature_matching_empty_range(tiny_scene):
    d, scene = tiny_scene
    from alicevision_tpu.pipeline import stages

    feats = d / "feats"
    stages.feature_extraction(
        str(scene), str(feats), max_keypoints=64, downscale_to=0
    )
    pairs_f = d / "pairs.txt"
    stages.image_matching(str(scene), str(feats), str(pairs_f),
                          method="exhaustive")
    matches_f = d / "matches_empty.npz"
    stages.feature_matching(
        str(scene), str(feats), str(pairs_f), str(matches_f),
        range_start=10_000, range_size=100,
    )
    # empty-chunk run still writes a loadable (empty) matches file
    assert matches_f.exists()
    with np.load(matches_f, allow_pickle=True) as z:
        assert len([k for k in z.files if k.startswith("m_")]) == 0


def test_cli_empty_range_exit_code(tiny_scene):
    d, scene = tiny_scene
    out = d / "feats_cli_empty"
    r = subprocess.run(
        [sys.executable, "-m", "alicevision_tpu.pipeline.cli",
         "featureExtraction", "--input", str(scene), "--output", str(out),
         "--rangeStart", "999", "--rangeSize", "10"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr


def test_cli_fatal_error_is_caught(tiny_scene):
    d, _ = tiny_scene
    # missing input file -> logged FATAL, nonzero exit, no traceback spew
    r = subprocess.run(
        [sys.executable, "-m", "alicevision_tpu.pipeline.cli",
         "featureExtraction", "--input", str(d / "nope.sfm"),
         "--output", str(d / "x")],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    # the farm-log contract: a FATAL line, no raw traceback anywhere
    assert "Traceback" not in r.stderr
    assert "fatal" in r.stderr.lower()
