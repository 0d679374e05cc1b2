"""tracksBuilding -> sfmBootstraping -> sfmExpanding file-contract test."""

import os

import numpy as np
import pytest

from alicevision_tpu import camera as cam
from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.synthetic import ring_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Scene file + feature files + matches built from the synthetic ring."""
    d = tmp_path_factory.mktemp("modular")
    syn = ring_scene(n_views=6, n_points=90, noise_px=0.3, seed=4)
    vis = np.asarray(syn.visible)
    obs = np.asarray(syn.observations)

    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1000, 1920, 1080, 1200.0)
    for v in range(6):
        sc.add_view(100 + v, ii, 1920, 1080)
    scene_f = str(d / "scene.sfm")
    sfmdata.save(sc, scene_f)

    feats_dir = str(d / "features")
    os.makedirs(feats_dir)
    # feature i of view v = observation of point i (only if visible)
    for v in range(6):
        np.savez_compressed(
            os.path.join(feats_dir, f"{100 + v}.feat.npz"),
            xy=obs[v],
            scale=np.ones(90),
            orientation=np.zeros(90),
            response=np.ones(90),
            desc=np.zeros((90, 8), np.float32),
            valid=vis[v],
        )
    matches = {}
    for i in range(6):
        for j in range(i + 1, 6):
            common = np.nonzero(vis[i] & vis[j])[0]
            matches[f"{i}_{j}"] = np.stack([common, common], -1)
    matches_f = str(d / "matches.npz")
    np.savez_compressed(matches_f, **matches)
    return str(d), scene_f, feats_dir, matches_f, syn


def test_modular_chain(setup):
    d, scene_f, feats_dir, matches_f, syn = setup
    tracks_f = os.path.join(d, "tracks.npz")
    stages.tracks_building(scene_f, feats_dir, matches_f, tracks_f, min_track_length=3)
    with np.load(tracks_f) as z:
        assert int(z["n_tracks"]) > 50

    boot_f = os.path.join(d, "boot.sfm")
    stages.sfm_bootstrapping(scene_f, feats_dir, tracks_f, boot_f)
    boot = sfmdata.load(boot_f)
    assert boot.n_poses >= 2
    assert boot.n_landmarks > 30

    out_f = os.path.join(d, "expanded.sfm")
    stages.sfm_expanding(boot_f, feats_dir, tracks_f, out_f)
    out = sfmdata.load(out_f)
    assert out.n_poses == 6
    assert out.n_landmarks > 60

    # ATE vs ground truth (alignment module)
    from alicevision_tpu.sfm.alignment import umeyama_similarity

    id2v = {int(vid): i for i, vid in enumerate(out.view_ids)}
    est, gt = [], []
    for v in range(6):
        p = out.view_pose[id2v[100 + v]]
        if p >= 0:
            est.append(out.pose_c[p])
            gt.append(np.asarray(syn.poses.c[v]))
    est, gt = np.array(est), np.array(gt)
    s, R, t = umeyama_similarity(est, gt)
    ate = np.sqrt(np.mean(np.sum((est @ (s * R).T + t - gt) ** 2, 1)))
    assert ate < 0.05, ate
