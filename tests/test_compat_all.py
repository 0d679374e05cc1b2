"""A/B against EVERY reference compatibilityData scene: each versioned
.json and .abc must load, agree with each other, and survive a re-save /
reload round-trip (ref: sfmDataIO/sfmDataIOCompatibility_test.cpp)."""

import glob
import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata

COMPAT = "/root/reference/src/aliceVision/sfmDataIO/compatibilityData"
VERSIONS = sorted(
    os.path.basename(p)[len("scene_"):-len(".json")]
    for p in glob.glob(os.path.join(COMPAT, "scene_*.json"))
)


def _scene_signature(sc):
    return (
        sc.n_views,
        sc.n_poses,
        sc.n_landmarks,
        np.sort(np.asarray(sc.view_ids)),
    )


@pytest.mark.skipif(not VERSIONS, reason="reference compat data unavailable")
@pytest.mark.parametrize("ver", VERSIONS)
def test_compat_json_loads_and_roundtrips(ver, tmp_path):
    sc = sfmdata.load(os.path.join(COMPAT, f"scene_{ver}.json"))
    assert sc.n_views > 0 and sc.n_poses > 0 and sc.n_landmarks > 0
    for R in sc.pose_R[:3]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)

    p = str(tmp_path / "resaved.sfm")
    sfmdata.save(sc, p)
    sc2 = sfmdata.load(p)
    assert _scene_signature(sc)[:3] == _scene_signature(sc2)[:3]
    np.testing.assert_array_equal(
        np.sort(np.asarray(sc.view_ids)), np.sort(np.asarray(sc2.view_ids))
    )
    np.testing.assert_allclose(sc2.points, sc.points, atol=1e-9)
    np.testing.assert_allclose(sc2.pose_c, sc.pose_c, atol=1e-9)
    np.testing.assert_allclose(sc2.pose_R, sc.pose_R, atol=1e-9)
    assert sc2.n_observations == sc.n_observations


@pytest.mark.skipif(not VERSIONS, reason="reference compat data unavailable")
@pytest.mark.parametrize("ver", VERSIONS)
def test_compat_abc_agrees_with_json(ver):
    abc = os.path.join(COMPAT, f"scene_{ver}.abc")
    if not os.path.exists(abc):
        pytest.skip("no abc twin")
    sj = sfmdata.load(os.path.join(COMPAT, f"scene_{ver}.json"))
    sa = sfmdata.load(abc)
    assert sa.n_views == sj.n_views
    assert sa.n_poses == sj.n_poses
    assert sa.n_landmarks == sj.n_landmarks
    # poses must agree view-by-view (match on view id)
    ja = {int(v): i for i, v in enumerate(sa.view_ids)}
    for i, vid in enumerate(sj.view_ids):
        pa = sa.view_pose[ja[int(vid)]]
        pj = sj.view_pose[i]
        assert (pa == sfmdata.INVALID) == (pj == sfmdata.INVALID)
        if pj != sfmdata.INVALID:
            np.testing.assert_allclose(
                sa.pose_c[pa], sj.pose_c[pj], atol=1e-6
            )
            np.testing.assert_allclose(
                sa.pose_R[pa], sj.pose_R[pj], atol=1e-6
            )
    # landmark clouds agree as sets (ordering may differ)
    ca = np.sort(np.asarray(sa.points), axis=0)
    cj = np.sort(np.asarray(sj.points), axis=0)
    np.testing.assert_allclose(ca, cj, atol=1e-5)
