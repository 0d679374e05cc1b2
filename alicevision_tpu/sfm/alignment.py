"""Scene alignment / similarity transforms.

TPU-native counterpart of the reference's alignment utilities
(ref: src/aliceVision/sfm/utils/alignment.cpp — sfmTransform modes:
auto-centering, alignment to another reconstruction via common poses,
scaling; geometry/rigidTransformation3D.cpp Umeyama estimation). Used by
the sfmTransform/sfmAlignment CLI stages and the ATE evaluation in tests.
"""

from __future__ import annotations

import numpy as np

from ..sfmdata import INVALID, SfMData


def umeyama_similarity(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity s, R, t with dst ~ s R src + t."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    H = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(H)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    if with_scale:
        var = (sc**2).sum() / len(src)
        s = float(np.trace(np.diag(S) @ D) / var)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def transform_scene(scene: SfMData, s: float, R: np.ndarray, t: np.ndarray) -> None:
    """Apply x -> s R x + t to all poses and landmarks in place.

    Camera rotation transforms as R_cam R^T; centers as points.
    """
    scene.points = scene.points @ (s * R).T + t
    scene.pose_c = scene.pose_c @ (s * R).T + t
    scene.pose_R = np.einsum("vij,kj->vik", scene.pose_R, R)


def align_to_scene(scene: SfMData, ref: SfMData, with_scale: bool = True):
    """Align `scene` onto `ref` using poses of shared view ids
    (sfmTransform --method from_poses)."""
    ids_a = {int(v): i for i, v in enumerate(scene.view_ids)}
    src, dst = [], []
    for i, vid in enumerate(ref.view_ids):
        vid = int(vid)
        if vid in ids_a:
            pa = scene.view_pose[ids_a[vid]]
            pb = ref.view_pose[i]
            if pa != INVALID and pb != INVALID:
                src.append(scene.pose_c[pa])
                dst.append(ref.pose_c[pb])
    if len(src) < 3:
        raise ValueError("need >= 3 shared posed views to align")
    s, R, t = umeyama_similarity(np.array(src), np.array(dst), with_scale)
    transform_scene(scene, s, R, t)
    return s, R, t


def auto_center_scale(scene: SfMData, target_extent: float = 1.0):
    """Center on the pose centroid, scale the pose bounding sphere to
    target_extent (sfmTransform --method auto)."""
    if scene.n_poses == 0:
        return 1.0, np.eye(3), np.zeros(3)
    centroid = scene.pose_c.mean(0)
    radius = np.linalg.norm(scene.pose_c - centroid, axis=-1).max()
    s = target_extent / max(radius, 1e-12)
    R = np.eye(3)
    t = -s * centroid
    transform_scene(scene, s, R, t)
    return s, R, t


def ate_rmse(scene: SfMData, ref: SfMData, align: bool = True) -> float:
    """Absolute trajectory error (RMSE of camera centers, after optional
    similarity alignment) — the qualityEvaluation metric
    (ref: src/software/utils/main_qualityEvaluation.cpp)."""
    ids_a = {int(v): i for i, v in enumerate(scene.view_ids)}
    src, dst = [], []
    for i, vid in enumerate(ref.view_ids):
        vid = int(vid)
        if vid in ids_a:
            pa = scene.view_pose[ids_a[vid]]
            pb = ref.view_pose[i]
            if pa != INVALID and pb != INVALID:
                src.append(scene.pose_c[pa])
                dst.append(ref.pose_c[pb])
    src, dst = np.array(src), np.array(dst)
    if align:
        s, R, t = umeyama_similarity(src, dst)
        src = src @ (s * R).T + t
    return float(np.sqrt(np.mean(np.sum((src - dst) ** 2, axis=1))))
