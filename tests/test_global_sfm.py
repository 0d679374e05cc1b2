import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import geometry as geo
from alicevision_tpu.sfm import global_sfm as gs
from alicevision_tpu.utils.synthetic import ring_scene


def _gt_edges(scene, n_views, extra_noise_deg=0.0, outlier_frac=0.0, seed=0):
    rng = np.random.RandomState(seed)
    R_gt = np.asarray(scene.poses.R)
    c_gt = np.asarray(scene.poses.c)
    edges, R_rel, dirs_ref = [], [], []
    for i in range(n_views):
        for j in range(i + 1, n_views):
            edges.append((i, j))
            Rr, d_world = gs.relative_motions_from_poses(
                R_gt[i], R_gt[j], c_gt[i], c_gt[j]
            )
            if extra_noise_deg > 0:
                w = np.radians(extra_noise_deg) * rng.randn(3)
                Rr = np.asarray(geo.so3_exp(jnp.asarray(w))) @ Rr
            if outlier_frac > 0 and rng.rand() < outlier_frac:
                Rr = np.asarray(geo.random_rotation(jax.random.PRNGKey(rng.randint(1e6))))
            # direction expressed in camera i frame
            d_i = R_gt[i] @ d_world
            edges_d = d_i
            R_rel.append(Rr)
            dirs_ref.append(edges_d)
    return np.array(edges), np.stack(R_rel), np.stack(dirs_ref)


def _rot_err_deg(R_est, R_gt):
    """Max angular error after gauge alignment (R_est[0] -> R_gt[0])."""
    align = R_gt[0].T @ R_est[0]
    errs = []
    for v in range(len(R_gt)):
        dR = R_est[v] @ align.T @ R_gt[v].T if False else R_est[v] @ (R_gt[v] @ align).T
        a = np.degrees(
            np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        )
        errs.append(a)
    return max(errs)


def test_rotation_averaging_exact():
    scene = ring_scene(n_views=8, n_points=10)
    edges, R_rel, _ = _gt_edges(scene, 8)
    R = np.asarray(gs.rotation_averaging_l2(8, edges, jnp.asarray(R_rel)))
    assert _rot_err_deg(R, np.asarray(scene.poses.R)) < 0.1


def test_rotation_averaging_noisy():
    scene = ring_scene(n_views=10, n_points=10)
    edges, R_rel, _ = _gt_edges(scene, 10, extra_noise_deg=2.0)
    R = np.asarray(gs.rotation_averaging_l2(10, edges, jnp.asarray(R_rel)))
    assert _rot_err_deg(R, np.asarray(scene.poses.R)) < 2.0


def test_rotation_averaging_outliers_irls():
    scene = ring_scene(n_views=10, n_points=10)
    edges, R_rel, _ = _gt_edges(scene, 10, extra_noise_deg=0.5, outlier_frac=0.15, seed=2)
    R0 = np.asarray(gs.rotation_averaging_l2(10, edges, jnp.asarray(R_rel), irls_iters=0))
    R3 = np.asarray(gs.rotation_averaging_l2(10, edges, jnp.asarray(R_rel), irls_iters=4))
    e0 = _rot_err_deg(R0, np.asarray(scene.poses.R))
    e3 = _rot_err_deg(R3, np.asarray(scene.poses.R))
    assert e3 < e0 * 0.8 or e3 < 1.0, (e0, e3)


def test_translation_averaging_recovers_ring():
    scene = ring_scene(n_views=8, n_points=10)
    c_gt = np.asarray(scene.poses.c)
    edges, _, _ = _gt_edges(scene, 8)
    d_world = c_gt[edges[:, 1]] - c_gt[edges[:, 0]]
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    c = np.asarray(gs.translation_averaging_l2(8, edges, jnp.asarray(d_world)))
    # align by similarity (translation + scale; rotation is gauge-fixed = I)
    c_rel = c - c[0]
    g_rel = c_gt - c_gt[0]
    s = np.sum(c_rel * g_rel) / np.maximum(np.sum(c_rel * c_rel), 1e-12)
    err = np.max(np.linalg.norm(s * c_rel - g_rel, axis=-1))
    assert err < 0.05 * np.linalg.norm(g_rel, axis=-1).max(), err


def test_global_sfm_driver():
    scene = ring_scene(n_views=8, n_points=10)
    edges, R_rel, dirs_ref = _gt_edges(scene, 8, extra_noise_deg=0.3)
    eng = gs.GlobalSfM(8, None, np.zeros(8), np.tile([1920, 1080], (8, 1)))
    R, c = eng.run(edges, R_rel, dirs_ref, irls_iters=2)
    assert _rot_err_deg(R, np.asarray(scene.poses.R)) < 1.5
    c_gt = np.asarray(scene.poses.c)
    # estimates live in the averaging gauge (camera-0 frame): align with a
    # full similarity (Umeyama) before measuring the error
    mu_a, mu_b = c.mean(0), c_gt.mean(0)
    H = (c_gt - mu_b).T @ (c - mu_a) / len(c)
    U, S, Vt = np.linalg.svd(H)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    Rs = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((c - mu_a) ** 2).sum() * len(c)
    err = np.linalg.norm((c - mu_a) @ (s * Rs).T + mu_b - c_gt, axis=-1).max()
    scale = np.linalg.norm(c_gt - mu_b, axis=-1).max()
    assert err < 0.15 * scale, (err, scale)


def test_rotation_averaging_l1_outlier_edges():
    """L1 averaging survives corrupted relative rotations that break L2
    (ref: multiview/rotationAveraging/l1.cpp)."""
    import numpy as np
    from alicevision_tpu.sfm.global_sfm import (
        rotation_averaging_l1,
        rotation_residuals_deg,
        relative_motions_from_poses,
    )
    from alicevision_tpu.geometry.rotations import so3_exp
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 8
    R_gt = np.array([np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32))) for _ in range(n)])
    edges, rels = [], []
    for i in range(n):
        for j in range(i + 1, n):
            edges.append((i, j))
            rels.append(R_gt[j] @ R_gt[i].T)
    edges = np.array(edges)
    rels = np.array(rels, np.float32)
    # Corrupt 15% of edges with large random rotations.
    n_bad = int(0.15 * len(edges))
    for e in range(n_bad):
        rels[e] = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 2.0, jnp.float32))) @ rels[e]

    R_est = rotation_averaging_l1(n, edges, jnp.asarray(rels))
    res = np.asarray(rotation_residuals_deg(R_est, jnp.asarray(edges), jnp.asarray(rels)))
    # Clean edges must be consistent to a fraction of a degree.
    assert np.median(res[n_bad:]) < 0.5, np.median(res[n_bad:])


def test_translation_averaging_l1soft_outliers():
    import numpy as np
    import jax.numpy as jnp
    from alicevision_tpu.sfm.global_sfm import translation_averaging_l1soft

    rng = np.random.default_rng(1)
    n = 8
    centers = rng.normal(size=(n, 3)) * 3.0
    edges, dirs = [], []
    for i in range(n):
        for j in range(i + 1, n):
            d = centers[j] - centers[i]
            edges.append((i, j))
            dirs.append(d / np.linalg.norm(d))
    edges = np.array(edges)
    dirs = np.array(dirs)
    # Corrupt a few directions.
    for e in range(3):
        v = rng.normal(size=3)
        dirs[e] = v / np.linalg.norm(v)
    c = np.asarray(translation_averaging_l1soft(n, edges, jnp.asarray(dirs)))
    # Align (translation + scale) and compare.
    c0 = c - c.mean(0)
    g0 = centers - centers.mean(0)
    s = np.sum(c0 * g0) / np.sum(c0 * c0)
    err = np.linalg.norm(s * c0 - g0, axis=-1).max()
    assert err < 0.25, err
