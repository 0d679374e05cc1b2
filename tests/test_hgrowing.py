"""Homography-growing match filter tests.

Mirrors the reference's behavior contract for filterMatchesByHGrowing
(ref: src/aliceVision/matchingImageCollection/GeometricFilterMatrix_HGrowing.cpp:107-190)
on a synthetic two-plane scene with outliers.
"""

import numpy as np

from alicevision_tpu.matching.hgrowing import (
    HGrowingParams,
    filter_matches_hgrowing,
)


def _apply_h(H, p):
    ph = p @ H[:2, :2].T + H[:2, 2]
    w = p @ H[2, :2] + H[2, 2]
    return ph / w[:, None]


def _two_plane_scene(seed=0, n1=80, n2=60, n_out=40):
    rng = np.random.RandomState(seed)
    H1 = np.array([[1.05, 0.02, 30.0], [-0.03, 0.98, -12.0], [1e-4, -5e-5, 1.0]])
    H2 = np.array([[0.8, -0.15, 140.0], [0.12, 0.85, 60.0], [-8e-5, 1e-4, 1.0]])
    p1 = rng.uniform(50, 400, (n1, 2))
    p2 = rng.uniform(200, 600, (n2, 2))
    q1 = _apply_h(H1, p1) + rng.normal(0, 0.3, (n1, 2))
    q2 = _apply_h(H2, p2) + rng.normal(0, 0.3, (n2, 2))
    po = rng.uniform(0, 640, (n_out, 2))
    qo = rng.uniform(0, 640, (n_out, 2))
    xyI = np.concatenate([p1, p2, po])
    xyJ = np.concatenate([q1, q2, qo])
    n = len(xyI)
    # seed similarity info: scale ratio / rotation consistent with each H's
    # local linear part (good seeds exist; outliers get random frames)
    scaleI = np.full(n, 2.0)
    oriI = np.zeros(n)
    scaleJ = np.empty(n)
    oriJ = np.empty(n)
    for i in range(n):
        if i < n1:
            A = H1[:2, :2]
        elif i < n1 + n2:
            A = H2[:2, :2]
        else:
            A = None
        if A is None:
            scaleJ[i] = rng.uniform(0.5, 4.0)
            oriJ[i] = rng.uniform(-np.pi, np.pi)
        else:
            scaleJ[i] = 2.0 * np.sqrt(abs(np.linalg.det(A)))
            oriJ[i] = np.arctan2(A[1, 0], A[0, 0])
    labels = np.concatenate(
        [np.zeros(n1, int), np.ones(n2, int), np.full(n_out, -1)]
    )
    return xyI, xyJ, scaleI, scaleJ, oriI, oriJ, labels, (H1, H2)


def test_two_planes_recovered():
    xyI, xyJ, sI, sJ, oI, oJ, labels, (H1, H2) = _two_plane_scene()
    homs, assign, inlier = filter_matches_hgrowing(xyI, xyJ, sI, sJ, oI, oJ)
    assert homs.shape[0] >= 2
    # each true plane is dominated by a single recovered plane id
    for lab in (0, 1):
        ids, counts = np.unique(assign[labels == lab], return_counts=True)
        got = ids[counts.argmax()]
        assert got >= 0
        frac = counts.max() / (labels == lab).sum()
        assert frac > 0.85, frac
    # outliers stay mostly unassigned
    assert (assign[labels == -1] >= 0).mean() < 0.25


def test_recovered_homography_accuracy():
    xyI, xyJ, sI, sJ, oI, oJ, labels, (H1, H2) = _two_plane_scene(seed=3)
    homs, assign, _ = filter_matches_hgrowing(xyI, xyJ, sI, sJ, oI, oJ)
    # the plane claiming the label-0 matches must reproject them to < 5 px
    ids, counts = np.unique(assign[labels == 0], return_counts=True)
    k = int(ids[counts.argmax()])
    err = np.linalg.norm(
        _apply_h(homs[k], xyI[labels == 0]) - xyJ[labels == 0], axis=1
    )
    assert np.median(err) < 2.0


def test_degenerate_inputs():
    # too few matches -> no homographies, everything unassigned
    xy = np.random.RandomState(0).uniform(0, 100, (4, 2))
    homs, assign, inlier = filter_matches_hgrowing(
        xy, xy, np.ones(4), np.ones(4), np.zeros(4), np.zeros(4)
    )
    assert homs.shape == (0, 3, 3)
    assert (assign == -1).all() and not inlier.any()

    # pure-noise matches -> should not fabricate >= 20-match planes
    rng = np.random.RandomState(1)
    xyI = rng.uniform(0, 640, (60, 2))
    xyJ = rng.uniform(0, 640, (60, 2))
    homs, assign, _ = filter_matches_hgrowing(
        xyI,
        xyJ,
        np.ones(60),
        np.ones(60),
        np.zeros(60),
        np.zeros(60),
        HGrowingParams(max_seeds=60),
    )
    assert (assign >= 0).mean() < 0.7


def test_identity_plane_small_tolerances():
    # single plane = identity; strict params still keep >= 20 matches
    rng = np.random.RandomState(2)
    xy = rng.uniform(0, 500, (50, 2))
    homs, assign, inlier = filter_matches_hgrowing(
        xy,
        xy + rng.normal(0, 0.1, (50, 2)),
        np.ones(50),
        np.ones(50),
        np.zeros(50),
        np.zeros(50),
    )
    assert homs.shape[0] == 1
    assert inlier.sum() >= 45
