"""Marker-based localization (CCTagLocalizer analog) + refineSequence."""

import jax
import numpy as np

from alicevision_tpu.features.markers import MarkerDetection
from alicevision_tpu.localization import (
    localize_by_markers,
    refine_sequence,
)


def _project(R, c, X, f, pp):
    Xc = (R @ (X - c).T).T
    return f * Xc[:, :2] / Xc[:, 2:3] + np.asarray(pp)


def _look_at(c, target=np.zeros(3)):
    fwd = target - c
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    return np.stack([right, down, fwd])


def test_localize_by_markers_exact():
    rng = np.random.RandomState(0)
    f, W, H = 500.0, 640.0, 480.0
    pp = (W / 2, H / 2)
    marker_world = {
        i: rng.uniform(-1, 1, 3) * np.array([2.0, 2.0, 0.5]) for i in range(10)
    }
    c_gt = np.array([0.5, -4.0, 0.8])
    R_gt = _look_at(c_gt)
    dets = []
    for mid, X in marker_world.items():
        uv = _project(R_gt, c_gt, X[None], f, pp)[0]
        uv += rng.normal(0, 0.3, 2)
        if 0 <= uv[0] < W and 0 <= uv[1] < H:
            dets.append(MarkerDetection(mid, uv, None, 20.0))
    assert len(dets) >= 6
    res = localize_by_markers(
        jax.random.PRNGKey(0), dets, marker_world, f, (W, H)
    )
    assert res.success
    assert np.linalg.norm(res.c - c_gt) < 0.02
    assert np.abs(res.R @ R_gt.T - np.eye(3)).max() < 0.01


def test_localize_by_markers_with_outlier_ids():
    rng = np.random.RandomState(1)
    f, W, H = 500.0, 640.0, 480.0
    pp = (W / 2, H / 2)
    marker_world = {i: rng.uniform(-1, 1, 3) for i in range(12)}
    c_gt = np.array([0.0, -5.0, 0.0])
    R_gt = _look_at(c_gt)
    dets = []
    for mid, X in marker_world.items():
        uv = _project(R_gt, c_gt, X[None], f, pp)[0]
        dets.append(MarkerDetection(mid, uv, None, 20.0))
    # two gross mis-detections (wrong position for a known id)
    dets[0] = MarkerDetection(0, np.array([10.0, 10.0]), None, 20.0)
    dets[1] = MarkerDetection(1, np.array([600.0, 400.0]), None, 20.0)
    res = localize_by_markers(
        jax.random.PRNGKey(0), dets, marker_world, f, (W, H)
    )
    assert res.success
    assert np.linalg.norm(res.c - c_gt) < 0.05
    assert res.n_inliers >= 9


def test_refine_sequence_recovers_poses_and_focal():
    rng = np.random.RandomState(2)
    F, M = 8, 64
    f_gt, W, H = 420.0, 640.0, 480.0
    pp = (W / 2, H / 2)
    pts = rng.uniform(-1, 1, (M, 3)) * np.array([2.0, 2.0, 0.8])
    Rs, cs, uvs = [], [], []
    for k in range(F):
        a = 2 * np.pi * k / 40.0
        c = np.array([4.0 * np.sin(a), -4.0 * np.cos(a), 0.5])
        R = _look_at(c)
        uv = _project(R, c, pts, f_gt, pp) + rng.normal(0, 0.2, (M, 2))
        Rs.append(R)
        cs.append(c)
        uvs.append(uv)
    Rs, cs, uvs = np.stack(Rs), np.stack(cs), np.stack(uvs)
    t_gt = -np.einsum("fij,fj->fi", Rs, cs)

    # perturb poses and focal
    from alicevision_tpu.geometry.rotations import so3_exp

    dR = np.asarray(so3_exp(0.02 * rng.randn(F, 3).astype(np.float32)))
    R0 = np.einsum("fij,fjk->fik", dR, Rs)
    t0 = t_gt + 0.05 * rng.randn(F, 3)
    world = np.broadcast_to(pts, (F, M, 3))
    mask = np.ones((F, M), bool)

    res = refine_sequence(
        R0, t0, world, uvs, mask, focal0=f_gt * 1.08, principal=pp,
        n_rounds=6,
    )
    assert float(res.rms_px) < 0.4
    assert abs(float(res.focal) - f_gt) / f_gt < 0.01
    # pose error
    cs_hat = -np.einsum("fji,fj->fi", np.asarray(res.R), np.asarray(res.t))
    assert np.linalg.norm(cs_hat - cs, axis=1).max() < 0.02


def test_refine_sequence_fixed_focal():
    rng = np.random.RandomState(3)
    F, M = 3, 32
    f_gt, pp = 300.0, (160.0, 120.0)
    pts = rng.uniform(-1, 1, (M, 3))
    c = np.array([0.0, -4.0, 0.0])
    R = _look_at(c)
    uv = _project(R, c, pts, f_gt, pp)
    Rs = np.broadcast_to(R, (F, 3, 3))
    ts = np.broadcast_to(-R @ c, (F, 3))
    res = refine_sequence(
        Rs, ts, np.broadcast_to(pts, (F, M, 3)),
        np.broadcast_to(uv, (F, M, 2)), np.ones((F, M), bool),
        focal0=f_gt, principal=pp, refine_focal=False, n_rounds=2,
    )
    assert float(res.focal) == f_gt
    assert float(res.rms_px) < 1e-2
