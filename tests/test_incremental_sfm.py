"""End-to-end incremental SfM on the synthetic ring fixture — the TPU
equivalent of the reference's sequentialSfM_test.cpp (whole-engine test on a
synthetic scene with known ground truth)."""

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu import camera as cam
from alicevision_tpu import geometry as geo
from alicevision_tpu.sfm.incremental import IncrementalConfig, IncrementalSfM
from alicevision_tpu.tracks.builder import Tracks
from alicevision_tpu.utils.synthetic import ring_scene


def _tracks_from_scene(scene, noise=None):
    """Perfect tracks: every fully-visible point becomes a track."""
    vis = np.asarray(scene.visible)
    V, P = vis.shape
    t_ids, t_views, t_feats = [], [], []
    feats = {v: [] for v in range(V)}
    n_track = 0
    track_of_point = {}
    for p in range(P):
        views = np.nonzero(vis[:, p])[0]
        if len(views) < 3:
            continue
        for v in views:
            t_ids.append(n_track)
            t_views.append(v)
            t_feats.append(len(feats[v]))
            feats[v].append(np.asarray(scene.observations[v, p]))
        track_of_point[p] = n_track
        n_track += 1
    tracks = Tracks(
        np.array(t_ids, np.int32),
        np.array(t_views, np.int32),
        np.array(t_feats, np.int32),
        n_track,
    )
    features_xy = {v: np.array(f) if f else np.zeros((0, 2)) for v, f in feats.items()}
    return tracks, features_xy, track_of_point


def _align_similarity(a, b):
    """Similarity (s, R, t) aligning point sets a->b (Umeyama)."""
    mu_a, mu_b = a.mean(0), b.mean(0)
    ac, bc = a - mu_a, b - mu_b
    H = bc.T @ ac / len(a)
    U, S, Vt = np.linalg.svd(H)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    var_a = (ac**2).sum() / len(a)
    s = np.trace(np.diag(S) @ D) / var_a
    t = mu_b - s * R @ mu_a
    return s, R, t


def test_incremental_sfm_ring():
    scene = ring_scene(n_views=8, n_points=120, noise_px=0.3, seed=0)
    tracks, features_xy, _ = _tracks_from_scene(scene)
    intr = jax.tree_util.tree_map(lambda a: np.asarray(a)[None], scene.intrinsics)
    intr = cam.Intrinsics(*intr)
    engine = IncrementalSfM(
        tracks,
        features_xy,
        intr,
        view_intrinsic=np.zeros(8, np.int32),
        image_sizes=np.tile([1920, 1080], (8, 1)),
        config=IncrementalConfig(seed=0),
    )
    res = engine.process()

    assert res.posed.sum() == 8, res.posed
    assert res.point_valid.sum() > 80

    # Align estimated camera centers to GT with a similarity and check ATE.
    est = res.pose_c[res.posed]
    gt = np.asarray(scene.poses.c)[res.posed]
    s, R, t = _align_similarity(est, gt)
    ate = np.sqrt(np.mean(np.sum((est @ (s * R).T + t - gt) ** 2, axis=1)))
    # scene radius 5.0; demand sub-1% ATE
    assert ate < 0.05, ate

    # Rotations consistent after alignment.
    for v in np.nonzero(res.posed)[0]:
        R_est_aligned = res.pose_R[v] @ R.T
        ang = np.degrees(
            np.arccos(np.clip((np.trace(R_est_aligned @ np.asarray(scene.poses.R[v]).T) - 1) / 2, -1, 1))
        )
        assert ang < 1.0, (v, ang)


def test_incremental_sfm_export(tmp_path):
    scene = ring_scene(n_views=6, n_points=80, noise_px=0.2, seed=1)
    tracks, features_xy, _ = _tracks_from_scene(scene)
    intr = cam.Intrinsics(*jax.tree_util.tree_map(lambda a: np.asarray(a)[None], scene.intrinsics))
    engine = IncrementalSfM(
        tracks, features_xy, intr,
        view_intrinsic=np.zeros(6, np.int32),
        image_sizes=np.tile([1920, 1080], (6, 1)),
    )
    engine.process()
    sc = engine.to_sfmdata()
    assert sc.n_poses >= 5
    assert sc.n_landmarks > 40
    from alicevision_tpu import sfmdata as sio

    p = str(tmp_path / "out.sfm")
    sio.save(sc, p)
    sc2 = sio.load(p)
    assert sc2.n_poses == sc.n_poses
    assert sc2.n_landmarks == sc.n_landmarks


def test_sfm_augmentation_resume():
    """Reconstruct a subset of views, export, seed a fresh engine with the
    saved scene, and extend to the full view set (the reference's SfM
    augmentation, ReconstructionEngine_sequentialSfM.cpp:183-223)."""

    def make_engine():
        scene = ring_scene(n_views=8, n_points=220, noise_px=0.2, seed=4)
        tracks, features_xy, _ = _tracks_from_scene(scene)
        intr = cam.Intrinsics(*jax.tree_util.tree_map(
            lambda a: np.asarray(a)[None], scene.intrinsics))
        eng = IncrementalSfM(
            tracks, features_xy, intr,
            view_intrinsic=np.zeros(8, np.int32),
            image_sizes=np.tile([1920, 1080], (8, 1)),
            config=IncrementalConfig(seed=4),
        )
        return scene, eng

    scene, eng = make_engine()
    # phase 1: reconstruct only views 0..4 by hiding the rest
    hidden = [5, 6, 7]
    for v in hidden:
        eng.obs_inlier[eng.view_obs[v]] = False
    eng.process()
    assert eng.res.posed[:5].sum() >= 4
    assert not eng.res.posed[hidden].any()
    sc = eng.to_sfmdata()

    # phase 2: fresh engine over the SAME tracks, seeded from the scene
    scene2, eng2 = make_engine()
    eng2.seed_from_sfmdata(sc)
    assert eng2.res.posed.sum() >= 4
    res = eng2.process()
    assert res.posed.sum() == 8, res.posed.sum()
    est = res.pose_c[res.posed]
    gt = np.asarray(scene2.poses.c)[res.posed]
    s_, R, t = _align_similarity(est, gt)
    ate = np.sqrt(np.mean(np.sum((est @ (s_ * R).T + t - gt) ** 2, axis=1)))
    assert ate < 0.05, ate
