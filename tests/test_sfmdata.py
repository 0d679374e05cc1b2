import numpy as np
import pytest

from alicevision_tpu import camera as cam
from alicevision_tpu import sfmdata
from alicevision_tpu.utils.synthetic import ring_scene


def _build_scene():
    """SfMData from the synthetic ring fixture."""
    syn = ring_scene(n_views=6, n_points=40)
    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(
        1000, 1920, 1080, 1200.0, disto_kind=cam.DISTO_RADIALK3,
        disto_params=(-0.1, 0.01, -0.001),
    )
    for v in range(6):
        vi = sc.add_view(100 + v, ii, 1920, 1080, path=f"/img/{v}.jpg", frame_id=v)
        sc.set_pose(vi, np.asarray(syn.poses.R[v], np.float64), np.asarray(syn.poses.c[v], np.float64))
    # observations: all visible
    vis = np.asarray(syn.visible)
    o_lm, o_view, o_uv = [], [], []
    for v in range(6):
        for l in np.nonzero(vis[v])[0]:
            o_lm.append(l)
            o_view.append(v)
            o_uv.append(np.asarray(syn.observations[v, l]))
    sc.set_structure(
        np.asarray(syn.points, np.float64),
        np.array(o_lm),
        np.array(o_view),
        np.array(o_uv),
    )
    return sc


def test_roundtrip_sfm(tmp_path):
    sc = _build_scene()
    p = str(tmp_path / "scene.sfm")
    sfmdata.save(sc, p)
    sc2 = sfmdata.load(p)

    assert sc2.n_views == sc.n_views
    assert sc2.n_intrinsics == sc.n_intrinsics
    assert sc2.n_poses == sc.n_poses
    assert sc2.n_landmarks == sc.n_landmarks
    assert sc2.n_observations == sc.n_observations

    np.testing.assert_allclose(sc2.pose_R, sc.pose_R, atol=1e-12)
    np.testing.assert_allclose(sc2.pose_c, sc.pose_c, atol=1e-12)
    np.testing.assert_allclose(sc2.points, sc.points, atol=1e-12)
    # observation order is canonicalized (grouped by landmark) on save
    o1 = np.lexsort((sc.obs_view, sc.obs_landmark))
    o2 = np.lexsort((sc2.obs_view, sc2.obs_landmark))
    np.testing.assert_array_equal(sc2.obs_landmark[o2], sc.obs_landmark[o1])
    np.testing.assert_array_equal(sc2.obs_view[o2], sc.obs_view[o1])
    np.testing.assert_allclose(sc2.obs_uv[o2], sc.obs_uv[o1], atol=1e-12)
    np.testing.assert_allclose(sc2.scale, sc.scale, rtol=1e-9)
    np.testing.assert_allclose(sc2.disto[:, :3], sc.disto[:, :3], atol=1e-12)
    assert list(sc2.view_ids) == list(sc.view_ids)
    assert sc2.view_paths == sc.view_paths


def test_load_reference_small_sfm():
    """Parse a scene produced by the C++ reference implementation."""
    sc = sfmdata.load("/root/reference/pyTests/data/small.sfm")
    assert sc.n_views == 30
    assert sc.n_intrinsics == 1
    assert int(sc.view_sizes[0, 0]) == 6016
    # legacy "radial3" type maps to pinhole + radialk3
    assert int(sc.cam_kind[0]) == cam.CAM_PINHOLE
    assert int(sc.disto_kind[0]) == cam.DISTO_RADIALK3
    # focal: 43.45584412271571 mm on 36mm sensor, 6016 px wide
    expect_fx = 43.45584412271571 / 36.0 * 6016
    np.testing.assert_allclose(sc.scale[0, 0], expect_fx, rtol=1e-9)


def test_load_reference_compat_scene():
    sc = sfmdata.load(
        "/root/reference/src/aliceVision/sfmDataIO/compatibilityData/scene_v1.2.11.json"
    )
    assert sc.n_views > 0 and sc.n_poses > 0 and sc.n_landmarks > 0
    # rotations must be orthonormal after the column-major parse
    for R in sc.pose_R[:5]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)


def test_valid_views():
    sc = _build_scene()
    assert list(sc.valid_views()) == list(range(6))
    sc2 = sfmdata.SfMData.empty()
    ii = sc2.add_intrinsic(5, 100, 100, 50.0)
    sc2.add_view(1, ii, 100, 100)
    assert len(sc2.valid_views()) == 0


def test_ply_export(tmp_path):
    sc = _build_scene()
    p = str(tmp_path / "cloud.ply")
    sfmdata.save(sc, p)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    n = sc.n_landmarks + sc.n_poses
    assert f"element vertex {n}" in "\n".join(lines[:8])


def test_save_baf(tmp_path):
    """BAF export matches the reference's layout: counts header, intrinsic
    params, per-view [R col-major | C], landmark observation rows, and the
    side-car imgList (ref: sfmDataIO/bafIO.cpp:18-102)."""
    from alicevision_tpu import sfmdata

    sc = sfmdata.SfMData.empty()
    idx = sc.add_intrinsic(9, 100, 80, 120.0, disto_kind=1, disto_params=(0.1,))
    v0 = sc.add_view(1, idx, 100, 80, "a.jpg")
    v1 = sc.add_view(2, idx, 100, 80, "b.jpg")
    R = np.eye(3); R[0, 1], R[1, 0] = 0.5, -0.5  # non-symmetric marker
    sc.set_pose(v0, R, np.array([1.0, 2.0, 3.0]))
    sc.set_structure(
        points=np.array([[0.0, 0.0, 5.0]]),
        obs_landmark=np.array([0, 0]),
        obs_view=np.array([v0, v1]),
        obs_uv=np.array([[10.0, 20.0], [30.0, 40.0]]),
    )
    p = str(tmp_path / "scene.baf")
    sfmdata.save(sc, p)
    lines = open(p).read().strip().split("\n")
    assert lines[:3] == ["1", "2", "1"]
    intr = [float(x) for x in lines[3].split()]
    assert intr[:2] == [120.0, 120.0] and intr[4] == 0.1
    pose0 = [float(x) for x in lines[4].split()]
    assert len(pose0) == 12
    assert pose0[1] == -0.5  # column-major: R[1,0] comes second
    assert pose0[9:12] == [1.0, 2.0, 3.0]
    pose1 = [float(x) for x in lines[5].split()]
    assert pose1[:3] == [1.0, 0.0, 0.0] and pose1[9:] == [0.0, 0.0, 0.0]
    lm = lines[6].split()
    assert float(lm[2]) == 5.0 and lm[3] == "2"
    imglist = open(str(tmp_path / "scene_imgList.txt")).read().strip().split("\n")
    assert imglist[0].startswith("a.jpg 9 ")
