"""Native Alembic (.abc) IO: reference golden files + round trip.

The reference ships versioned .abc archives with .json twins
(ref: src/aliceVision/sfmDataIO/compatibilityData/,
sfmDataIOCompatibility_test.cpp) — the twins are the ground truth for the
native Ogawa/Alembic reader; the writer is checked by round-trip through
our own reader and by re-parsing structure.
"""

import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata
from alicevision_tpu.sfmdata.alembic import load_abc, save_abc, read_archive

_COMPAT = "/root/reference/src/aliceVision/sfmDataIO/compatibilityData"


def _twin(version):
    return (
        os.path.join(_COMPAT, f"scene_{version}.abc"),
        os.path.join(_COMPAT, f"scene_{version}.json"),
    )


@pytest.mark.skipif(not os.path.isdir(_COMPAT), reason="reference data absent")
@pytest.mark.parametrize(
    "version",
    ["v1.2.0", "v1.2.1", "v1.2.2", "v1.2.3", "v1.2.4", "v1.2.5",
     "v1.2.6", "v1.2.8", "v1.2.11"],
)
def test_load_reference_abc_matches_json_twin(version):
    abc_path, json_path = _twin(version)
    sa = load_abc(abc_path)
    sj = sfmdata.load(json_path)

    # views: same ids, sizes, intrinsic assignment
    assert set(sa.view_ids) == set(sj.view_ids)
    oa = np.argsort(sa.view_ids)
    oj = np.argsort(sj.view_ids)
    np.testing.assert_array_equal(sa.view_sizes[oa], sj.view_sizes[oj])

    # poses: same count, same geometry
    assert len(sa.pose_ids) == len(sj.pose_ids)
    pa = {int(i): k for k, i in enumerate(sa.pose_ids)}
    pj = {int(i): k for k, i in enumerate(sj.pose_ids)}
    common = sorted(set(pa) & set(pj))
    assert len(common) == len(sa.pose_ids)
    for pid in common[:20]:
        Ra, Rj = sa.pose_R[pa[pid]], sj.pose_R[pj[pid]]
        ca, cj = sa.pose_c[pa[pid]], sj.pose_c[pj[pid]]
        np.testing.assert_allclose(Ra, Rj, atol=1e-9)
        np.testing.assert_allclose(ca, cj, atol=1e-9)

    # intrinsics: focal/offset match
    ia = np.argsort(sa.intrinsic_ids)
    ij = np.argsort(sj.intrinsic_ids)
    np.testing.assert_allclose(sa.scale[ia], sj.scale[ij], atol=1e-9)
    np.testing.assert_allclose(sa.offset[ia], sj.offset[ij], atol=1e-9)

    # landmarks: same count and identical coordinates (order preserved in
    # both writers: std::map iteration)
    assert len(sa.points) == len(sj.points)
    np.testing.assert_allclose(sa.points, sj.points, atol=2e-5)

    # observations: same totals, same per-landmark counts
    assert len(sa.obs_landmark) == len(sj.obs_landmark)
    ca_ = np.bincount(sa.obs_landmark, minlength=len(sa.points))
    cj_ = np.bincount(sj.obs_landmark, minlength=len(sj.points))
    np.testing.assert_array_equal(ca_, cj_)


@pytest.mark.skipif(not os.path.isdir(_COMPAT), reason="reference data absent")
def test_abc_roundtrip_through_writer(tmp_path):
    abc_path, _ = _twin("v1.2.11")
    s0 = load_abc(abc_path)
    out = str(tmp_path / "roundtrip.abc")
    save_abc(s0, out)
    s1 = load_abc(out)

    np.testing.assert_array_equal(np.sort(s0.view_ids), np.sort(s1.view_ids))
    o0 = np.argsort(s0.view_ids)
    o1 = np.argsort(s1.view_ids)
    np.testing.assert_array_equal(s0.view_pose[o0] != -1, s1.view_pose[o1] != -1)
    p0 = {int(i): k for k, i in enumerate(s0.pose_ids)}
    p1 = {int(i): k for k, i in enumerate(s1.pose_ids)}
    assert set(p0) == set(p1)
    for pid in list(p0)[:25]:
        np.testing.assert_allclose(s0.pose_R[p0[pid]], s1.pose_R[p1[pid]], atol=1e-12)
        np.testing.assert_allclose(s0.pose_c[p0[pid]], s1.pose_c[p1[pid]], atol=1e-10)
    np.testing.assert_allclose(s0.scale, s1.scale, atol=1e-12)
    np.testing.assert_allclose(s0.points, s1.points, atol=1e-6)
    np.testing.assert_array_equal(s0.colors, s1.colors)
    assert len(s0.obs_landmark) == len(s1.obs_landmark)
    np.testing.assert_allclose(
        np.sort(s0.obs_uv, axis=0), np.sort(s1.obs_uv, axis=0), atol=1e-5
    )


@pytest.mark.skipif(not os.path.isdir(_COMPAT), reason="reference data absent")
def test_archive_structure_readback(tmp_path):
    """The written archive exposes the reference's object layout."""
    abc_path, _ = _twin("v1.2.0")
    s0 = load_abc(abc_path)
    out = str(tmp_path / "layout.abc")
    save_abc(s0, out)
    top = read_archive(out)
    root = top.children["mvgRoot"]
    assert "schema=AbcGeom_Xform_v3" in root.meta
    for name in ("mvgCameras", "mvgCamerasUndefined", "mvgCloud", "mvgAncestors"):
        assert name in root.children
    vp = root.props["mvg_ABC_version"]
    assert list(vp.array(0)) == [1, 2, 11]
    pc = root.children["mvgCloud"].children["mvgPointCloud"]
    shp = pc.children["particleShape1"]
    geom = shp.props[".geom"]
    assert geom["P"].extent == 3
    assert len(geom["P"].array(0)) == len(s0.points)


def test_abc_dispatch_via_sfmdata(tmp_path):
    """save/load dispatch on .abc through the public API with a synthetic
    scene (no reference data needed)."""
    from alicevision_tpu.sfmdata import io as sfmio

    rng = np.random.RandomState(0)
    s = sfmdata.SfMData.empty()
    V, L, O = 3, 50, 120
    s.view_ids = np.arange(V, dtype=np.int64) + 100
    s.view_intrinsic = np.zeros(V, np.int32)
    s.view_pose = np.arange(V, dtype=np.int32)
    s.view_sizes = np.tile([[640, 480]], (V, 1)).astype(np.int32)
    s.view_paths = [f"/img/{i}.jpg" for i in range(V)]
    s.view_frames = np.arange(V, dtype=np.int64)
    s.view_metadata = [{} for _ in range(V)]
    s.intrinsic_ids = np.array([7], np.int64)
    s.cam_kind = np.zeros(1, np.int32)
    s.disto_kind = np.zeros(1, np.int32)
    s.scale = np.array([[500.0, 510.0]])
    s.offset = np.array([[3.0, -2.0]])
    s.sizes = np.array([[640, 480]], np.int32)
    s.disto = np.zeros((1, 8))
    s.sensor_size = np.array([[36.0, 24.0]])
    s.intrinsic_extra = [{}]
    s.pose_ids = np.arange(V, dtype=np.int64) + 100
    qs = rng.randn(V, 4)
    Rs = []
    for q in qs:
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        Rs.append(
            np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
        )
    s.pose_R = np.stack(Rs)
    s.pose_c = rng.randn(V, 3)
    s.pose_locked = np.zeros(V, bool)
    s.landmark_ids = np.arange(L, dtype=np.int64)
    s.points = rng.randn(L, 3) * 2
    s.colors = rng.randint(0, 255, (L, 3)).astype(np.uint8)
    s.desc_types = ["dspsift"] * L
    s.obs_landmark = rng.randint(0, L, O).astype(np.int32)
    s.obs_view = rng.randint(0, V, O).astype(np.int32)
    s.obs_uv = rng.rand(O, 2) * 640
    s.obs_scale = rng.rand(O) + 1
    s.obs_feature = np.arange(O, dtype=np.int64)

    out = str(tmp_path / "scene.abc")
    sfmdata.save(s, out)
    s2 = sfmdata.load(out)
    np.testing.assert_array_equal(np.sort(s.view_ids), np.sort(s2.view_ids))
    p0 = np.argsort(s.pose_ids)
    p1 = np.argsort(s2.pose_ids)
    np.testing.assert_allclose(s.pose_R[p0], s2.pose_R[p1], atol=1e-12)
    np.testing.assert_allclose(s.pose_c[p0], s2.pose_c[p1], atol=1e-10)
    np.testing.assert_allclose(s.points, s2.points, atol=1e-6)
    np.testing.assert_array_equal(s.colors, s2.colors)
    assert s2.desc_types[0] == "dspsift"
    # observations grouped by landmark on write; totals and uv content match
    assert len(s2.obs_landmark) == O
    np.testing.assert_allclose(
        np.sort(s.obs_uv, axis=0), np.sort(s2.obs_uv, axis=0), atol=1e-4
    )
