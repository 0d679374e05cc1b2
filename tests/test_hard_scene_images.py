"""Hard benchmark through the REAL front-end: pixels -> poses.

Renders the hard ring world as distorted images and runs the actual
pipeline — SIFT -> retrieval -> matching -> incremental SfM — asserting
pose recovery, ATE, and RADIAL-DISTORTION recovery from detected features
(materially harder than the GT-projection variant in test_hard_scene.py,
which remains the fast gate).

ref: src/aliceVision/sfm/pipeline/sequential/sequentialSfM_test.cpp:1
(engine tests always run the real front end),
src/software/utils/main_qualityEvaluation.cpp:1 (GT evaluation).
"""

import os

import numpy as np
import pytest

from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.rendered import render_hard_views


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    d = tmp_path_factory.mktemp("hardimg")
    # 40 views keep the ring's 9-degree neighbour spacing — at 20 views the
    # 18-degree baselines lose covisibility and the chain breaks (measured:
    # 6/20 posed); this config posed 40/40 at ATE 0.77% in validation
    V, W, H = 40, 640, 480
    f = 900.0 * W / 1280
    disto_true = (-0.25, 0.06, -0.005)
    imgs, K, disto, R_gt, c_gt = render_hard_views(
        n_views=V, wh=(W, H), focal_px=f, disto=disto_true
    )
    img_dir = os.path.join(d, "imgs")
    os.makedirs(img_dir)
    for v in range(V):
        np.save(os.path.join(img_dir, f"view_{v:03d}.npy"), imgs[v])
    work = os.path.join(d, "w")
    os.makedirs(work)
    scene = os.path.join(work, "cameraInit.sfm")
    # 2% focal prior error, zero distortion prior — the engine must recover
    # both from the detected features
    stages.camera_init(img_dir, scene, default_focal_px=f * 1.02)
    feats = os.path.join(work, "features")
    stages.feature_extraction(
        scene, feats, max_keypoints=4096, downscale_to=0,
        describer_types="dspsift",
    )
    pairs_f = os.path.join(work, "pairs.txt")
    stages.image_matching(scene, feats, pairs_f, method="voctree",
                          n_neighbors=6)
    matches_f = os.path.join(work, "matches.npz")
    stages.feature_matching(scene, feats, pairs_f, matches_f)
    out = stages.incremental_sfm(
        scene, feats, matches_f, os.path.join(work, "sfm.sfm")
    )
    return out, f, disto_true, c_gt, V


def test_poses_and_ate_from_pixels(pipeline_result):
    out, f, disto_true, c_gt, V = pipeline_result
    vp = out.view_pose
    posed_v = [v for v in range(V) if vp[v] >= 0]
    assert len(posed_v) >= V - 1  # >= 19/20 posed from images alone

    est = np.stack([out.pose_c[vp[v]] for v in posed_v])
    gt = c_gt[posed_v]
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(gc.T @ ec / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((ec**2).sum() / len(est))
    ate = float(np.sqrt(np.mean(np.sum(
        (est @ (s * R).T + (mu_g - s * R @ mu_e) - gt) ** 2, axis=1))))
    radius = float(np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean())
    assert ate / radius < 0.012  # validation run: 0.0077


def test_intrinsics_recovered_from_pixels(pipeline_result):
    out, f, disto_true, c_gt, V = pipeline_result
    # focal within 3% (prior was 2% off)
    rec_f = float(np.mean(out.scale[0]))
    assert abs(rec_f - f) / f < 0.03
    # k1 recovered with the right sign and magnitude from DETECTED features
    k1 = float(out.disto[0][0])
    assert -0.40 < k1 < -0.12  # true -0.25; prior was 0.0
