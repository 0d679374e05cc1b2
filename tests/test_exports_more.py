import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu import sfmdata
from alicevision_tpu.matching.descriptor_matching import guided_match_homography
from alicevision_tpu.pipeline.cli import main
from alicevision_tpu.sfmdata.export import (
    export_animated_camera,
    export_meshlab,
    import_known_poses,
)


def _scene():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_stats_alignment_io import _consistent_scene

    return _consistent_scene()


def test_export_meshlab(tmp_path):
    sc = _scene()
    export_meshlab(sc, str(tmp_path), mesh_path="mesh.obj")
    mlp = open(tmp_path / "project.mlp").read()
    assert "MeshLabProject" in mlp
    assert mlp.count("MLRaster") >= 2 * 6  # open+close per posed view


def test_animated_camera_roundtrip(tmp_path):
    sc = _scene()
    p = str(tmp_path / "cam.json")
    export_animated_camera(sc, p)
    data = json.load(open(p))
    assert len(data["frames"]) == 6

    # strip poses and re-import
    sc2 = _scene()
    sc2.view_pose[:] = -1
    sc2.pose_ids = np.zeros(0, np.int64)
    sc2.pose_R = np.zeros((0, 3, 3))
    sc2.pose_c = np.zeros((0, 3))
    sc2.pose_locked = np.zeros(0, bool)
    n = import_known_poses(sc2, p)
    assert n == 6
    np.testing.assert_allclose(
        sorted(map(tuple, sc2.pose_c.round(6))), sorted(map(tuple, sc.pose_c.round(6)))
    )


def test_cli_hardware_resources(capsys):
    assert main(["hardwareResources"]) == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert "devices" in info and info["cpu_count"] > 0


def test_guided_match_homography():
    key = jax.random.PRNGKey(0)
    n = 64
    xy1 = jax.random.uniform(key, (n, 2), minval=0, maxval=400)
    H = jnp.asarray([[1.1, 0.0, 5.0], [0.0, 1.1, -3.0], [0.0, 0.0, 1.0]])
    ones = jnp.ones((n, 1))
    p = jnp.concatenate([xy1, ones], -1) @ H.T
    xy2 = p[:, :2] / p[:, 2:]
    d = jax.random.uniform(jax.random.PRNGKey(1), (n, 32))
    v = jnp.ones(n, bool)
    m = guided_match_homography(H, xy1, xy2, d, d, v, v, max_transfer_px=2.0)
    idx2 = np.asarray(m.idx2)
    ok = idx2 >= 0
    assert ok.sum() > n * 0.8
    assert (idx2[ok] == np.arange(n)[ok]).all()
