"""P4Pf, P5Pfr, F10 (distortion) and LO-RANSAC N-view triangulation.

Reference solvers: multiview/resection/P4PfSolver.hpp:21,
P5PfrSolver.hpp:26, relativePose/Fundamental10PSolver.hpp:37,
triangulation/NViewsTriangulationLORansac.hpp:48.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import multiview as mv


def _rotm(rng, s=0.4):
    w = rng.randn(3) * s
    th = np.linalg.norm(w)
    k = w / max(th, 1e-12)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _gen_pose_problems(rng, B, N, k1_range=(0.0, 0.0)):
    W = np.zeros((B, N, 3))
    O = np.zeros((B, N, 2))
    F = np.zeros(B)
    R = np.zeros((B, 3, 3))
    T = np.zeros((B, 3))
    K1 = np.zeros(B)
    b = 0
    while b < B:
        Rb = _rotm(rng)
        tb = np.array([0, 0, 4]) + rng.randn(3) * 0.5
        f = np.exp(rng.uniform(np.log(400), np.log(3000)))
        k1 = rng.uniform(*k1_range)
        X = rng.randn(N, 3) * 1.5
        Xc = (Rb @ X.T).T + tb
        if np.any(Xc[:, 2] < 0.5):
            continue
        xn = Xc[:, :2] / Xc[:, 2:]
        xd = xn.copy()
        ok = True
        for _ in range(200):  # distort: fixed point of the division model
            xd2 = xn * (1 + k1 * np.sum(xd * xd, axis=1, keepdims=True))
            if not np.all(np.isfinite(xd2)) or np.abs(xd2).max() > 10:
                ok = False
                break
            if np.abs(xd2 - xd).max() < 1e-12:
                xd = xd2
                break
            xd = xd2
        if not ok:
            continue
        W[b], O[b], F[b], R[b], T[b], K1[b] = X, xd * f, f, Rb, tb, k1
        b += 1
    return W, O, F, R, T, K1


def test_p4pf_recovers_pose_and_focal():
    rng = np.random.RandomState(1)
    B = 32
    W, O, F, R, T, _ = _gen_pose_problems(rng, B, 4)
    R4, t4, f4, v4 = jax.jit(lambda w, o: mv.p4pf(w, o, 300.0, 4000.0))(
        jnp.asarray(W), jnp.asarray(O)
    )
    R4, f4, v4 = np.asarray(R4), np.asarray(f4), np.asarray(v4)
    ferr = np.abs(f4 - F[:, None]) / F[:, None]
    rerr = np.linalg.norm(R4 - R[:, None], axis=(2, 3))
    best = np.where(v4, ferr + rerr, np.inf).min(axis=1)
    assert (best < 0.01).mean() > 0.85
    assert np.median(best) < 1e-4


def test_p5pfr_recovers_pose_focal_distortion():
    rng = np.random.RandomState(2)
    B = 32
    W, O, F, R, T, K1 = _gen_pose_problems(rng, B, 5, k1_range=(-0.3, 0.1))
    R5, t5, f5, k5, v5 = jax.jit(lambda w, o: mv.p5pfr(w, o, 300.0, 4000.0))(
        jnp.asarray(W), jnp.asarray(O)
    )
    R5, f5, k5, v5 = map(np.asarray, (R5, f5, k5, v5))
    ferr = np.abs(f5 - F[:, None]) / F[:, None]
    kerr = np.abs(k5 - K1[:, None])
    cost = np.where(v5, ferr + np.linalg.norm(R5 - R[:, None], axis=(2, 3)), np.inf)
    sel = np.argmin(cost, axis=1)
    b = np.arange(B)
    assert (ferr[b, sel] < 0.02).mean() > 0.85
    assert np.median(kerr[b, sel]) < 1e-3


def _distort_division(xu, lam):
    """Closed-form inverse of the division model x_u = x_d / (1 + lam r_d^2):
    r_d = (1 - sqrt(1 - 4 lam r_u^2)) / (2 lam r_u)."""
    ru = np.linalg.norm(xu, axis=1, keepdims=True).clip(1e-12)
    disc = np.sqrt(np.maximum(1 - 4 * lam * ru**2, 0.0))
    rd = (1 - disc) / (2 * lam * ru)
    return xu * (rd / ru)


def test_fundamental_10pt_finds_distortion():
    rng = np.random.RandomState(3)
    B = 8
    N = 24
    lam_gt = -0.15  # division-model coefficient at unit mean radius
    X1 = np.zeros((B, N, 2))
    X2 = np.zeros((B, N, 2))
    for b in range(B):
        R = _rotm(rng, 0.3)
        t = rng.randn(3)
        t /= np.linalg.norm(t)
        f = 800.0
        X = rng.randn(N, 3) * 2 + np.array([0, 0, 6])
        x1 = X[:, :2] / X[:, 2:] * f
        Xc2 = (R @ X.T).T + t
        x2 = Xc2[:, :2] / Xc2[:, 2:] * f
        s2 = (np.sum(x1**2) + np.sum(x2**2)) / (2 * N)
        X1[b] = _distort_division(x1, lam_gt / s2)
        X2[b] = _distort_division(x2, lam_gt / s2)

    F10, lam = jax.jit(mv.fundamental_10pt)(
        jnp.asarray(X1, jnp.float32), jnp.asarray(X2, jnp.float32)
    )
    F10, lam = np.asarray(F10), np.asarray(lam)
    # undistort with the estimated lambda and check Sampson residuals
    ok = 0
    for b in range(B):
        u1 = X1[b] / (1 + lam[b] * np.sum(X1[b] ** 2, axis=1, keepdims=True))
        u2 = X2[b] / (1 + lam[b] * np.sum(X2[b] ** 2, axis=1, keepdims=True))
        h1 = np.concatenate([u1, np.ones((N, 1))], axis=1)
        h2 = np.concatenate([u2, np.ones((N, 1))], axis=1)
        Fb = F10[b] / np.linalg.norm(F10[b])
        res = np.abs(np.einsum("ni,ij,nj->n", h2, Fb, h1))
        Fp = h1 @ Fb.T
        Ftp = h2 @ Fb
        den = np.sqrt(Fp[:, 0] ** 2 + Fp[:, 1] ** 2 + Ftp[:, 0] ** 2 + Ftp[:, 1] ** 2)
        ok += np.median(res / den.clip(1e-12)) < 0.5  # sub-pixel Sampson
    assert ok == B


def test_triangulate_nview_robust_rejects_outliers():
    rng = np.random.RandomState(4)
    B, K = 64, 8
    P = np.zeros((B, K, 3, 4))
    x = np.zeros((B, K, 2))
    Xgt = rng.randn(B, 3) * 2
    out_mask = np.zeros((B, K), bool)
    for b in range(B):
        for k in range(K):
            R = _rotm(rng, 0.5)
            c = rng.randn(3) * 4 + np.array([0, 0, -10])
            t = -R @ c
            Km = np.diag([900.0, 900.0, 1.0])
            P[b, k] = Km @ np.concatenate([R, t[:, None]], axis=1)
            Xh = np.append(Xgt[b], 1.0)
            p = P[b, k] @ Xh
            x[b, k] = p[:2] / p[2] + rng.randn(2) * 0.3
        n_out = rng.randint(1, 3)
        idx = rng.choice(K, n_out, replace=False)
        x[b, idx] += rng.randn(n_out, 2) * 80 + 40
        out_mask[b, idx] = True

    X, inl, valid = jax.jit(mv.triangulate_nview_robust)(
        jnp.asarray(P), jnp.asarray(x)
    )
    X, inl, valid = np.asarray(X), np.asarray(inl), np.asarray(valid)
    assert valid.all()
    err = np.linalg.norm(X - Xgt, axis=1)
    assert np.median(err) < 0.01
    assert (err < 0.05).mean() > 0.95
    # outliers excluded from the inlier sets
    assert (inl & out_mask).sum() <= 2


def test_triangulate_nview_robust_beats_plain_dlt_with_outliers():
    rng = np.random.RandomState(5)
    B, K = 32, 6
    P = np.zeros((B, K, 3, 4))
    x = np.zeros((B, K, 2))
    Xgt = rng.randn(B, 3)
    for b in range(B):
        for k in range(K):
            R = _rotm(rng, 0.5)
            c = rng.randn(3) * 4 + np.array([0, 0, -10])
            P[b, k] = np.diag([900.0, 900.0, 1.0]) @ np.concatenate(
                [R, (-R @ c)[:, None]], axis=1
            )
            p = P[b, k] @ np.append(Xgt[b], 1.0)
            x[b, k] = p[:2] / p[2]
        x[b, rng.randint(K)] += 150.0

    Xr, _, _ = mv.triangulate_nview_robust(jnp.asarray(P), jnp.asarray(x))
    Xp = mv.triangulate_nview(jnp.asarray(P), jnp.asarray(x))
    er = np.linalg.norm(np.asarray(Xr) - Xgt, axis=1)
    ep = np.linalg.norm(np.asarray(Xp) - Xgt, axis=1)
    assert np.median(er) < np.median(ep) * 0.1


def test_incremental_sfm_robust_triangulation_with_bad_obs():
    """The LO-RANSAC triangulation path survives corrupted observations
    that break individual tracks (ref: expanding SfmTriangulation)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_incremental_sfm import _tracks_from_scene
    from alicevision_tpu import camera as cam
    from alicevision_tpu.sfm.incremental import IncrementalConfig, IncrementalSfM
    from alicevision_tpu.utils.synthetic import ring_scene

    scene = ring_scene(n_views=8, n_points=100, noise_px=0.3, seed=0)
    tracks, features_xy, _ = _tracks_from_scene(scene)
    # corrupt ~10% of feature positions (simulating bad matches in tracks)
    rng = np.random.RandomState(7)
    for v in features_xy:
        f = features_xy[v]
        if len(f) == 0:
            continue
        k = max(1, len(f) // 10)
        idx = rng.choice(len(f), k, replace=False)
        f[idx] += rng.randn(k, 2) * 120 + 60
    intr = cam.Intrinsics(
        *jax.tree_util.tree_map(lambda a: np.asarray(a)[None], scene.intrinsics)
    )
    eng = IncrementalSfM(
        tracks, features_xy, intr,
        view_intrinsic=np.zeros(8, np.int32),
        image_sizes=np.tile([1920, 1080], (8, 1)),
        config=IncrementalConfig(seed=0, robust_triangulation=True),
    )
    res = eng.process()
    assert res.posed.sum() == 8
    assert res.point_valid.sum() > 50
