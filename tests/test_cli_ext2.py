"""CLI tests: relativePoseEstimating -> globalSfM, sfmTriangulation,
connected-view selection, SVG exports, voctree utilities."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline.cli import main
from alicevision_tpu.utils.synthetic import ring_scene


def _run(*argv):
    assert main(list(argv)) == 0


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ext2")
    n_views, n_pts = 6, 80
    syn = ring_scene(n_views=n_views, n_points=n_pts, noise_px=0.2, seed=7)
    vis = np.asarray(syn.visible)
    obs = np.asarray(syn.observations)

    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1000, 1920, 1080, 1200.0)
    for v in range(n_views):
        sc.add_view(100 + v, ii, 1920, 1080)
    scene_f = str(d / "scene.sfm")
    sfmdata.save(sc, scene_f)

    rng = np.random.default_rng(0)
    lm_desc = rng.normal(size=(n_pts, 16)).astype(np.float32)
    lm_desc /= np.linalg.norm(lm_desc, axis=-1, keepdims=True)

    feats_dir = str(d / "features")
    os.makedirs(feats_dir)
    for v in range(n_views):
        np.savez_compressed(
            os.path.join(feats_dir, f"{100 + v}.feat.npz"),
            xy=obs[v],
            scale=np.ones(n_pts),
            orientation=np.zeros(n_pts),
            response=np.ones(n_pts),
            desc=lm_desc,
            valid=vis[v],
        )
    matches = {}
    for i in range(n_views):
        for j in range(i + 1, n_views):
            common = np.nonzero(vis[i] & vis[j])[0]
            matches[f"{i}_{j}"] = np.stack([common, common], -1)
    matches_f = str(d / "matches.npz")
    np.savez_compressed(matches_f, **matches)
    return str(d), scene_f, feats_dir, matches_f, syn


def test_relative_poses_and_global_sfm(setup):
    d, scene_f, feats_dir, matches_f, syn = setup
    rel_f = os.path.join(d, "relposes.npz")
    _run("relativePoseEstimating", "--input", scene_f, "--features", feats_dir,
         "--matches", matches_f, "--output", rel_f)
    with np.load(rel_f) as z:
        assert len(z["edges"]) >= 10
        # relative rotations match ground truth
        import jax.numpy as jnp

        from alicevision_tpu import geometry as geo

        Rgt = np.asarray(geo.quat_to_mat(syn.poses.q))
        for e, R in zip(z["edges"][:5], z["R_rel"][:5]):
            R_expected = Rgt[e[1]] @ Rgt[e[0]].T
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(R @ R_expected.T) - 1) / 2, -1, 1)))
            assert ang < 2.0

    out_f = os.path.join(d, "global.sfm")
    _run("globalSfM", "--input", scene_f, "--features", feats_dir,
         "--matches", matches_f, "--relativePoses", rel_f, "--output", out_f)
    out = sfmdata.load(out_f)
    assert len(out.valid_views()) == 6
    assert out.n_landmarks > 40

    # camera centers match GT after similarity alignment
    from alicevision_tpu.sfm.alignment import umeyama_similarity

    id2v = {int(vid): i for i, vid in enumerate(out.view_ids)}
    est = np.stack([out.pose_c[out.view_pose[id2v[100 + v]]] for v in range(6)])
    gt = np.stack([np.asarray(syn.poses.c[v]) for v in range(6)])
    s, R, t = umeyama_similarity(est, gt)
    err = np.linalg.norm((s * est @ R.T + t) - gt, axis=-1)
    assert err.max() < 0.1 * np.linalg.norm(gt, axis=-1).mean()


def test_sfm_triangulation_known_poses(setup):
    d, scene_f, feats_dir, matches_f, syn = setup
    # scene with GT poses but no structure
    sc = sfmdata.load(scene_f)
    for v in range(6):
        import alicevision_tpu.geometry as geo

        R = np.asarray(geo.quat_to_mat(syn.poses.q[v]), np.float64)
        sc.set_pose(v, R, np.asarray(syn.poses.c[v], np.float64))
    posed_f = os.path.join(d, "posed.sfm")
    sfmdata.save(sc, posed_f)
    out_f = os.path.join(d, "structure.sfm")
    _run("computeStructureFromKnownPoses", "--input", posed_f,
         "--features", feats_dir, "--matches", matches_f, "--output", out_f)
    out = sfmdata.load(out_f)
    assert out.n_landmarks > 50
    # triangulated points close to GT
    pts_gt = np.asarray(syn.points)
    d_min = np.linalg.norm(
        out.points[:, None, :] - pts_gt[None, :, :], axis=-1
    ).min(-1)
    assert np.median(d_min) < 0.05


def test_select_connected_and_exports(setup, tmp_path):
    d, scene_f, feats_dir, matches_f, _ = setup
    kept_f = str(tmp_path / "kept.txt")
    _run("selectConnectedViews", "--input", scene_f, "--matches", matches_f,
         "--output", kept_f, "--minLinks", "2")
    assert len(open(kept_f).read().split()) == 6

    kp_dir = str(tmp_path / "kp")
    _run("exportKeypoints", "--input", scene_f, "--features", feats_dir,
         "--output", kp_dir)
    svgs = [f for f in os.listdir(kp_dir) if f.endswith(".svg")]
    assert len(svgs) == 6
    assert "<circle" in open(os.path.join(kp_dir, svgs[0])).read()

    m_dir = str(tmp_path / "matches_svg")
    _run("exportMatches", "--input", scene_f, "--features", feats_dir,
         "--matches", matches_f, "--output", m_dir)
    assert len(os.listdir(m_dir)) == 15

    tracks_f = os.path.join(d, "tracks.npz")
    _run("tracksBuilding", "--input", scene_f, "--features", feats_dir,
         "--matches", matches_f, "--output", tracks_f)
    tr_svg = str(tmp_path / "tracks.svg")
    _run("exportTracks", "--input", scene_f, "--tracks", tracks_f,
         "--features", feats_dir, "--output", tr_svg, "--maxTracks", "50")
    assert "<polyline" in open(tr_svg).read()


def test_voctree_utilities(setup, tmp_path):
    d, scene_f, feats_dir, matches_f, _ = setup
    tree_f = str(tmp_path / "tree.npz")
    _run("voctreeCreation", "--features", feats_dir, "--input", scene_f,
         "--output", tree_f, "--branching", "4", "--levels", "2")
    _run("voctreeStatistics", "--tree", tree_f)
    pairs_f = str(tmp_path / "pairs.txt")
    _run("voctreeQueryUtility", "--tree", tree_f, "--input", scene_f,
         "--features", feats_dir, "--output", pairs_f, "--nbNeighbors", "3")
    pairs = np.loadtxt(pairs_f, dtype=int).reshape(-1, 2)
    assert len(pairs) >= 6
