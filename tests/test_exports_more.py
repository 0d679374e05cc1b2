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


def test_export_mve2_pmvs_usd_and_convert_mesh(tmp_path):
    """Round-1 exporters (ref: software/export/main_exportMVE2.cpp,
    main_exportPMVS.cpp, main_exportUSD.cpp, convert/main_convertMesh.cpp)."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    from test_stats_alignment_io import _consistent_scene
    from alicevision_tpu import sfmdata
    from alicevision_tpu.pipeline.cli import main
    from alicevision_tpu.mesh import save_obj
    from alicevision_tpu.mesh.ops import load_ply_mesh

    sc = _consistent_scene()
    scene_f = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, scene_f)

    mve = str(tmp_path / "mve")
    assert main(["exportMVE2", "--input", scene_f, "--output", mve]) == 0
    assert os.path.exists(os.path.join(mve, "synth_0.out"))
    metas = [d for d in os.listdir(os.path.join(mve, "views")) if d.endswith(".mve")]
    assert len(metas) == len(sc.valid_views())
    header = open(os.path.join(mve, "synth_0.out")).readlines()
    n_cams, n_pts = (int(x) for x in header[1].split())
    assert n_cams == len(sc.valid_views()) and n_pts == sc.n_landmarks

    pmvs = str(tmp_path / "pmvs")
    assert main(["exportPMVS", "--input", scene_f, "--output", pmvs]) == 0
    txts = os.listdir(os.path.join(pmvs, "txt"))
    assert len(txts) == len(sc.valid_views())
    first = open(os.path.join(pmvs, "txt", sorted(txts)[0])).read().splitlines()
    assert first[0] == "CONTOUR" and len(first) == 4

    usd = str(tmp_path / "scene.usda")
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f = np.array([[0, 1, 2]], np.int32)
    mesh_f = str(tmp_path / "m.obj")
    save_obj(mesh_f, v, f)
    assert main(["exportUSD", "--input", scene_f, "--output", usd, "--mesh", mesh_f]) == 0
    txt = open(usd).read()
    assert txt.startswith("#usda 1.0")
    assert "def Camera" in txt and "def Mesh" in txt and "def Points" in txt

    ply = str(tmp_path / "m.ply")
    assert main(["convertMesh", "--input", mesh_f, "--output", ply]) == 0
    v2, f2, _ = load_ply_mesh(ply)
    np.testing.assert_allclose(v2, v)
    obj2 = str(tmp_path / "m2.obj")
    assert main(["convertMesh", "--input", ply, "--output", obj2]) == 0
