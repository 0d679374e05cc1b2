"""Tests for the cli_ext registry tools (scene surgery, global SfM CLI,
frustum filtering, exports, voctree utilities, sample scenes)."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline.cli import main
from alicevision_tpu.utils.synthetic import ring_scene_sfmdata


def _run(*argv):
    assert main(list(argv)) == 0


def test_generate_sample_scene_and_stats(tmp_path):
    out = str(tmp_path / "scene.sfm")
    _run("generateSampleScene", "--output", out, "--nbViews", "6",
         "--nbPoints", "40")
    sc = sfmdata.load(out)
    assert sc.n_views == 6
    assert sc.n_landmarks == 40
    assert len(sc.valid_views()) == 6


def test_sfm_transfer_and_regression(tmp_path):
    ref = str(tmp_path / "ref.sfm")
    _run("generateSampleScene", "--output", ref, "--nbViews", "5",
         "--nbPoints", "30")
    # strip poses into a "fresh" scene, then transfer them back
    sc = sfmdata.load(ref)
    fresh = ring_scene_sfmdata(n_views=5, n_points=30)
    fresh.pose_R[:] = np.eye(3)
    fresh.pose_c[:] = 0.0
    fresh_path = str(tmp_path / "fresh.sfm")
    sfmdata.save(fresh, fresh_path)
    out = str(tmp_path / "transferred.sfm")
    _run("sfmTransfer", "--input", fresh_path, "--reference", ref,
         "--output", out)
    got = sfmdata.load(out)
    for v in got.valid_views():
        p, q = int(got.view_pose[v]), int(sc.view_pose[v])
        assert np.allclose(got.pose_R[p], sc.pose_R[q], atol=1e-9)
    # regression of identical scenes passes
    _run("sfmRegression", "--input", out, "--reference", ref)


def test_sfm_merge_split_alignment(tmp_path):
    a = str(tmp_path / "a.sfm")
    _run("generateSampleScene", "--output", a, "--nbViews", "4",
         "--nbPoints", "25")
    # split: all views posed -> non-reconstructed part is empty
    rec = str(tmp_path / "rec.sfm")
    non = str(tmp_path / "non.sfm")
    _run("sfmSplitReconstructed", "--input", a, "--output", rec,
         "--outputNonReconstructed", non)
    assert sfmdata.load(rec).n_views == 4
    # alignment: rotate+scale a copy, align back onto original
    sc = sfmdata.load(a)
    from alicevision_tpu.sfm.alignment import transform_scene

    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    transform_scene(sc, 2.0, R, np.array([1.0, -2.0, 0.5]))
    moved = str(tmp_path / "moved.sfm")
    sfmdata.save(sc, moved)
    aligned = str(tmp_path / "aligned.sfm")
    _run("sfmAlignment", "--input", moved, "--reference", a,
         "--output", aligned)
    ref = sfmdata.load(a)
    got = sfmdata.load(aligned)
    assert np.allclose(got.pose_c[: ref.n_poses], ref.pose_c, atol=1e-6)


def test_apply_calibration_json(tmp_path):
    a = str(tmp_path / "a.sfm")
    _run("generateSampleScene", "--output", a, "--nbViews", "3",
         "--nbPoints", "10")
    calib = str(tmp_path / "calib.json")
    K = [[900.0, 0.0, 960.0], [0.0, 905.0, 540.0], [0.0, 0.0, 1.0]]
    with open(calib, "w") as f:
        json.dump({"K": K, "dist": [-0.1, 0.01, 0.0]}, f)
    out = str(tmp_path / "cal.sfm")
    _run("applyCalibration", "--input", a, "--calibration", calib,
         "--output", out)
    got = sfmdata.load(out)
    assert np.allclose(got.scale[0], [900.0, 905.0])
    assert np.isclose(got.disto[0, 0], -0.1)


def test_frustum_filtering_ring(tmp_path):
    a = str(tmp_path / "a.sfm")
    _run("generateSampleScene", "--output", a, "--nbViews", "8",
         "--nbPoints", "60")
    pairs_file = str(tmp_path / "pairs.txt")
    _run("frustumFiltering", "--input", a, "--output", pairs_file)
    pairs = np.loadtxt(pairs_file, dtype=int).reshape(-1, 2)
    # cameras on a ring all look at the origin: every frustum pair overlaps
    assert len(pairs) == 8 * 7 // 2


def test_frustum_disjoint():
    """Two cameras looking away from each other must not intersect."""
    from alicevision_tpu.sfm.frustum import frustum_pairs

    sc = ring_scene_sfmdata(n_views=2, n_points=10)
    # move them far apart, looking in opposite directions (+x / -x)
    sc.pose_c[0] = [-100.0, 0, 0]
    sc.pose_c[1] = [100.0, 0, 0]
    Rz = np.array([[0.0, 0, -1], [0, 1, 0], [1, 0, 0]])
    sc.pose_R[0] = Rz            # cam 0 looks along -x
    sc.pose_R[1] = Rz.T          # cam 1 looks along +x... construct directly
    # simplest: look-at rotations with z = view dir
    def look(dirv):
        z = np.asarray(dirv, float)
        z /= np.linalg.norm(z)
        up = np.array([0.0, 0, 1]) if abs(z[2]) < 0.9 else np.array([0.0, 1, 0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        return np.stack([x, y, z])

    sc.pose_R[0] = look([-1.0, 0, 0])
    sc.pose_R[1] = look([1.0, 0, 0])
    pairs = frustum_pairs(sc, z_near=0.1, z_far=10.0)
    assert len(pairs) == 0


def test_export_colored_cloud_and_distances(tmp_path):
    a = str(tmp_path / "a.sfm")
    _run("generateSampleScene", "--output", a, "--nbViews", "3",
         "--nbPoints", "12")
    ply = str(tmp_path / "cloud.ply")
    _run("exportColoredPointCloud", "--input", a, "--output", ply)
    assert os.path.getsize(ply) > 0
    _run("sfmDistances", "--input", a, "--landmarksA", "0,1",
         "--landmarksB", "2,3")


def test_import_middlebury(tmp_path):
    par = str(tmp_path / "temple_par.txt")
    K = "1520.4 0 302.3 0 1525.9 246.9 0 0 1"
    R = "1 0 0 0 1 0 0 0 1"
    with open(par, "w") as f:
        f.write("2\n")
        f.write(f"img0.png {K} {R} 0 0 1\n")
        f.write(f"img1.png {K} {R} 0.1 0 1\n")
    out = str(tmp_path / "mb.sfm")
    _run("importMiddlebury", "--input", par, "--output", out)
    sc = sfmdata.load(out)
    assert sc.n_views == 2
    assert np.isclose(sc.scale[0, 0], 1520.4)
    # c = -R^T t with R=I -> c = -t
    assert np.allclose(sc.pose_c[0], [0, 0, -1])


def test_merge_meshes():
    from alicevision_tpu.mesh.ops import merge_meshes

    v1 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f1 = np.array([[0, 1, 2]], np.int32)
    v2 = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], float)
    f2 = np.array([[0, 1, 2]], np.int32)
    v, f = merge_meshes(v1, f1, v2, f2)
    assert len(v) == 6 and len(f) == 2
    vw, fw = merge_meshes(v1, f1, v2, f2, weld_eps=1e-6)
    assert len(vw) == 4 and len(fw) == 2
    # welded faces still reference valid vertices
    assert fw.max() < len(vw)
