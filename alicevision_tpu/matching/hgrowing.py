"""Homography-growing match filter ([F.Srajer 2016] algo. 1).

TPU-native redesign of the reference's ``filterMatchesByHGrowing``
(ref: src/aliceVision/matchingImageCollection/GeometricFilterMatrix_HGrowing.hpp:23-121,
GeometricFilterMatrix_HGrowing.cpp:62-190, geometricFilterUtils.cpp:94-117):
instead of an OpenMP loop that grows one homography per seed match with
order-dependent early-skip (the reference comments that the parallel
version "modifies results a little"), every seed grows **simultaneously**
under ``vmap`` — the 8 refinement iterations are unrolled at trace time
(iteration 0: similarity from the seed's position/scale/orientation;
iterations 1-4: affinity by masked least squares; 5+: homography by masked
normalized DLT), all with fixed shapes and masked reductions, so one jitted
program serves every pair. Plane extraction is then a deterministic greedy
set cover over the per-seed inlier masks.

Defaults mirror GrowParameters / HGrowingFilteringParam
(GeometricFilterMatrix_HGrowing.hpp:44-106): tolerances 20/10/5 px,
min 6 inliers to refine, 8 refining iterations, max 10 homographies,
min 20 matches per homography.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HGrowingParams", "grow_from_seeds", "filter_matches_hgrowing"]


class HGrowingParams(NamedTuple):
    similarity_tolerance: float = 20.0
    affinity_tolerance: float = 10.0
    homography_tolerance: float = 5.0
    min_inliers_to_refine: int = 6
    nb_refining_iterations: int = 8
    max_nb_homographies: int = 10
    min_nb_matches_per_h: int = 20
    max_seeds: int = 256


def _similarity_from_seed(xy1, scale1, ori1, xy2, scale2, ori2):
    """S = A2 @ A1^-1 with A = [[s c, -s s, x], [s s, s c, y], [0,0,1]].

    ref: geometricFilterUtils.cpp:94-117 (computeSimilarity).
    """

    def frame(xy, s, o):
        c, sn = jnp.cos(o), jnp.sin(o)
        return jnp.array(
            [[s * c, -s * sn, xy[0]], [s * sn, s * c, xy[1]], [0.0, 0.0, 1.0]]
        )

    a1 = frame(xy1, scale1, ori1)
    a2 = frame(xy2, scale2, ori2)
    return a2 @ jnp.linalg.inv(a1)


def _transfer_err2(H, pI, pJ):
    """Squared Euclidean transfer error |dehom(H pI) - pJ|^2, (N,)."""
    ph = pI @ H[:, :2].T + H[:, 2]
    w = jnp.where(jnp.abs(ph[:, 2]) < 1e-12, 1e-12, ph[:, 2])
    proj = ph[:, :2] / w[:, None]
    return jnp.sum((proj - pJ) ** 2, axis=-1)


def _estimate_affinity(pI, pJ, w):
    """Masked least-squares affinity (ref: geometricFilterUtils estimateAffinity).

    x' and y' rows decouple: both solve the same 3x3 normal system
    X^T W X p = X^T W x'.
    """
    n = jnp.maximum(jnp.sum(w), 1.0)
    X = jnp.concatenate([pI, jnp.ones((pI.shape[0], 1), pI.dtype)], axis=1)
    Xw = X * w[:, None]
    G = X.T @ Xw + 1e-6 * jnp.eye(3, dtype=pI.dtype) * n
    rhs = Xw.T @ pJ  # (3, 2)
    sol = jnp.linalg.solve(G, rhs)  # (3, 2) -> rows of A^T
    H = jnp.eye(3, dtype=pI.dtype)
    H = H.at[0, :].set(sol[:, 0])
    H = H.at[1, :].set(sol[:, 1])
    return H


def _estimate_homography(pI, pJ, w):
    """Masked normalized DLT; smallest eigenvector of A^T W A (9x9)."""
    n = jnp.maximum(jnp.sum(w), 1.0)

    def normalize(p):
        mean = jnp.sum(p * w[:, None], axis=0) / n
        d = jnp.sqrt(jnp.sum((p - mean) ** 2, axis=1) + 1e-12)
        s = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / n, 1e-9)
        T = jnp.array(
            [[s, 0.0, -s * mean[0]], [0.0, s, -s * mean[1]], [0.0, 0.0, 1.0]],
            p.dtype,
        )
        return (p - mean) * s, T

    qI, TI = normalize(pI)
    qJ, TJ = normalize(pJ)
    x, y = qI[:, 0], qI[:, 1]
    u, v = qJ[:, 0], qJ[:, 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    r1 = jnp.stack(
        [x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=1
    )  # (N, 9)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    Araw = jnp.concatenate([r1, r2], axis=0)
    G = Araw.T @ A + 1e-9 * jnp.eye(9, dtype=pI.dtype)
    _, vecs = jnp.linalg.eigh(G)
    h = vecs[:, 0].reshape(3, 3)
    H = jnp.linalg.inv(TJ) @ h @ TI
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


@functools.partial(jax.jit, static_argnames=("params",))
def grow_from_seeds(
    pI: jnp.ndarray,
    pJ: jnp.ndarray,
    scaleI: jnp.ndarray,
    scaleJ: jnp.ndarray,
    oriI: jnp.ndarray,
    oriJ: jnp.ndarray,
    valid: jnp.ndarray,
    seed_ids: jnp.ndarray,
    params: HGrowingParams = HGrowingParams(),
):
    """Grow one homography per seed, all seeds at once.

    Args:
      pI, pJ: (N, 2) matched keypoint positions in view I / J.
      scaleI..oriJ: (N,) per-match keypoint scale / orientation.
      valid: (N,) bool mask of matches still in play.
      seed_ids: (S,) int32 indices into the match arrays.

    Returns:
      H: (S, 3, 3) grown homographies, inliers: (S, N) bool, count: (S,).
    """
    p = params

    def grow_one(sid):
        H = _similarity_from_seed(
            pI[sid], scaleI[sid], oriI[sid], pJ[sid], scaleJ[sid], oriJ[sid]
        )
        inl = (_transfer_err2(H, pI, pJ) < p.similarity_tolerance**2) & valid
        for step in range(1, p.nb_refining_iterations):
            w = inl.astype(pI.dtype)
            enough = jnp.sum(inl) >= p.min_inliers_to_refine
            if step <= 4:
                Hn = _estimate_affinity(pI, pJ, w)
                tol = p.affinity_tolerance
            else:
                Hn = _estimate_homography(pI, pJ, w)
                tol = p.homography_tolerance
            H = jnp.where(enough, Hn, H)
            inl = (_transfer_err2(H, pI, pJ) < tol**2) & valid
        return H, inl, jnp.sum(inl)

    return jax.vmap(grow_one)(seed_ids)


def filter_matches_hgrowing(
    xyI: np.ndarray,
    xyJ: np.ndarray,
    scaleI: np.ndarray,
    scaleJ: np.ndarray,
    oriI: np.ndarray,
    oriJ: np.ndarray,
    params: HGrowingParams = HGrowingParams(),
):
    """Full HGrowing filter for one image pair.

    ref: filterMatchesByHGrowing (GeometricFilterMatrix_HGrowing.cpp:107-190).
    Greedy plane extraction over the precomputed per-seed inlier masks
    replaces the reference's per-round regrow; each selected plane claims
    its inliers and later picks are scored on the shrinking remainder.

    Returns (homographies (K,3,3) float ndarray, assignment (N,) int32 with
    plane id or -1, inlier_mask (N,) bool).
    """
    n = xyI.shape[0]
    p = params
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    if n < p.min_inliers_to_refine:
        return (
            np.zeros((0, 3, 3), np.float32),
            np.full(n, -1, np.int32),
            np.zeros(n, bool),
        )
    s = min(n, p.max_seeds)
    seed_ids = jnp.asarray(
        np.round(np.linspace(0, n - 1, s)).astype(np.int32)
    )
    H, inl, cnt = grow_from_seeds(
        f32(xyI),
        f32(xyJ),
        f32(scaleI),
        f32(scaleJ),
        f32(oriI),
        f32(oriJ),
        jnp.ones(n, bool),
        seed_ids,
        params,
    )
    H = np.asarray(H)
    inl = np.asarray(inl)

    remaining = np.ones(n, bool)
    assignment = np.full(n, -1, np.int32)
    homs = []
    for k in range(p.max_nb_homographies):
        scores = (inl & remaining).sum(axis=1)
        best = int(scores.argmax())
        if scores[best] < p.min_nb_matches_per_h:
            break
        sel = inl[best] & remaining
        assignment[sel] = k
        homs.append(H[best])
        remaining &= ~sel
        if remaining.sum() < p.min_nb_matches_per_h:
            break
    homs = (
        np.stack(homs) if homs else np.zeros((0, 3, 3), np.float32)
    )
    return homs, assignment, assignment >= 0
