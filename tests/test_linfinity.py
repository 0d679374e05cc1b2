"""L-infinity LP solvers (triangulation, resection, global translations)
against exact synthetic geometry — the reference exercises these in
lInfinityCV/*_test.cpp with the same kind of fixtures."""

import numpy as np

from alicevision_tpu.lp import (
    resection_linf,
    translations_from_relative_linf,
    triangulate_linf,
)


def _ring_cameras(n=5, radius=4.0):
    Rs, ts, Ps = [], [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        c = radius * np.array([np.cos(ang), np.sin(ang), 0.0])
        # look at origin
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->cam rows
        t = -R @ c
        Rs.append(R)
        ts.append(t)
        Ps.append(np.concatenate([R, t[:, None]], axis=1))
    return np.array(Rs), np.array(ts), np.array(Ps)


def test_triangulate_linf_exact_and_noisy():
    Rs, ts, Ps = _ring_cameras()
    X = np.array([0.3, -0.2, 0.4])
    uvs = []
    for P in Ps:
        x = P @ np.concatenate([X, [1.0]])
        uvs.append(x[:2] / x[2])
    uvs = np.array(uvs)
    Xe, gamma = triangulate_linf(Ps, uvs)
    assert gamma < 1e-5
    np.testing.assert_allclose(Xe, X, atol=1e-4)

    # Bounded noise: gamma must stay within the noise level.
    rng = np.random.default_rng(0)
    uvn = uvs + rng.uniform(-1e-3, 1e-3, uvs.shape)
    Xe, gamma = triangulate_linf(Ps, uvn)
    assert gamma < 2.5e-3
    np.testing.assert_allclose(Xe, X, atol=0.02)


def test_resection_linf_recovers_projection():
    Rs, ts, Ps = _ring_cameras()
    P_gt = Ps[0]
    rng = np.random.default_rng(1)
    world = rng.normal(size=(20, 3)) * 0.5
    Xh = np.concatenate([world, np.ones((20, 1))], axis=1)
    x = Xh @ P_gt.T
    uv = x[:, :2] / x[:, 2:]
    P, gamma = resection_linf(world, uv)
    assert gamma < 1e-5
    # Compare up to the gauge: normalize both by P[2,3].
    P_n = P / P[2, 3]
    P_gt_n = P_gt / P_gt[2, 3]
    np.testing.assert_allclose(P_n, P_gt_n, atol=1e-3)


def test_global_translations_linf():
    rng = np.random.default_rng(2)
    n = 6
    centers = rng.normal(size=(n, 3)) * 2.0
    edges, dirs = [], []
    for i in range(n):
        for j in range(i + 1, n):
            d = centers[j] - centers[i]
            dirs.append(d / np.linalg.norm(d))
            edges.append((i, j))
    est, gamma = translations_from_relative_linf(n, edges, dirs)
    assert gamma < 1e-5
    # Solution is up to global translation + scale: align and compare.
    est -= est.mean(0)
    gt = centers - centers.mean(0)
    s = np.sum(est * gt) / np.sum(est * est)
    np.testing.assert_allclose(s * est, gt, atol=1e-3)
