"""Nistér 5-point essential solver: recovery, masks, RANSAC integration.

Mirrors the reference's solver tests (ref:
src/aliceVision/multiview/relativePose/essentialF5PSolver kernel tests via
NViewDataSet fixtures) with batched synthetic relative-pose problems.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import geometry as geo
from alicevision_tpu import multiview as mv
from alicevision_tpu import robust
from alicevision_tpu.utils.synthetic import ring_scene, normalized_obs


def _random_problems(B, seed=0, rot=0.3):
    """B random 5-point relative-pose problems -> (x1, x2, E_gt)."""
    rng = np.random.RandomState(seed)
    X1 = np.zeros((B, 5, 2))
    X2 = np.zeros((B, 5, 2))
    EGT = np.zeros((B, 3, 3))
    for b in range(B):
        w = rng.randn(3) * rot
        th = np.linalg.norm(w)
        k = w / max(th, 1e-12)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        t = rng.randn(3)
        t /= np.linalg.norm(t)
        E = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]) @ R
        EGT[b] = E / np.linalg.norm(E)
        X = rng.randn(5, 3) * 2 + np.array([0, 0, 6])
        X1[b] = X[:, :2] / X[:, 2:]
        Xc2 = (R @ X.T).T + t
        X2[b] = Xc2[:, :2] / Xc2[:, 2:]
    return X1, X2, EGT


def test_essential_5pt_recovers_gt():
    B = 64
    X1, X2, EGT = _random_problems(B)
    E, valid = jax.jit(mv.essential_5pt)(
        jnp.asarray(X1, jnp.float32), jnp.asarray(X2, jnp.float32)
    )
    E = np.asarray(E)
    valid = np.asarray(valid)
    d = np.minimum(
        np.linalg.norm(E - EGT[:, None], axis=(2, 3)),
        np.linalg.norm(E + EGT[:, None], axis=(2, 3)),
    )
    best = np.where(valid, d, np.inf).min(axis=1)
    # f32 chain: expect the vast majority of problems recovered tightly
    assert (best < 1e-2).mean() > 0.9
    assert np.median(best) < 1e-4


def test_essential_5pt_candidates_satisfy_epipolar():
    X1, X2, _ = _random_problems(16, seed=3)
    E, valid = mv.essential_5pt(
        jnp.asarray(X1, jnp.float32), jnp.asarray(X2, jnp.float32)
    )
    E = np.asarray(E)
    valid = np.asarray(valid)
    assert valid.any(axis=1).all()  # at least one real solution per problem
    h1 = np.concatenate([X1, np.ones((16, 5, 1))], axis=-1)
    h2 = np.concatenate([X2, np.ones((16, 5, 1))], axis=-1)
    # x2^T E x1 for every valid candidate
    val = np.einsum("bnk,brkj,bnj->brn", h2, E, h1)
    err = np.abs(val)[valid]
    assert np.percentile(err, 95) < 5e-4


def test_essential_5pt_invalid_slots_masked():
    # degenerate sample: all five points identical -> no usable candidates
    x = np.tile(np.array([[0.1, 0.2]]), (1, 5, 1))
    E, valid = mv.essential_5pt(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32)
    )
    assert np.isfinite(np.asarray(E)).all()


def test_robust_relative_pose_5pt_with_outliers():
    scene = ring_scene(n_views=8, n_points=200, noise_px=0.2)
    i, j = 0, 2
    x1n, x2n = normalized_obs(scene)[i], normalized_obs(scene)[j]
    # corrupt 25% of correspondences
    k = jax.random.PRNGKey(6)
    n = x1n.shape[0]
    out = jax.random.uniform(k, (n,)) < 0.25
    noise = jax.random.normal(jax.random.PRNGKey(8), x2n.shape) * 0.8
    x2c = jnp.where(out[:, None], x2n + noise, x2n)
    R, t, rm = robust.robust_relative_pose(
        jax.random.PRNGKey(7), x1n, x2c, focal_mean=1200.0,
        im_size=(1920, 1080), n_hyps=128, solver="5pt",
    )
    pose_i = geo.Pose(q=scene.poses.q[i : i + 1], c=scene.poses.c[i : i + 1])
    pose_j = geo.Pose(q=scene.poses.q[j : j + 1], c=scene.poses.c[j : j + 1])
    rel_gt = geo.relative_pose(pose_i, pose_j)
    ang = float(jnp.degrees(jnp.linalg.norm(geo.so3_log(R @ rel_gt.R[0].T))))
    assert ang < 0.5
    t_est = t / jnp.linalg.norm(t)
    t_gt = rel_gt.t[0] / jnp.linalg.norm(rel_gt.t[0])
    assert float(jnp.abs(jnp.sum(t_est * t_gt))) > 0.999
