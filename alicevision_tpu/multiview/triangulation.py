"""Triangulation — batched DLT, midpoint, and masked N-view variants.

TPU-native counterpart of the reference's triangulators
(ref: src/aliceVision/multiview/triangulation/triangulationDLT.hpp,
Triangulation.hpp:105 N-view iterative, NViewsTriangulationLORansac.hpp:48).
All functions are pure, shape-static, vmap/jit friendly; N-view uses a fixed
observation capacity with a validity mask instead of dynamic lists.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..numeric import f32_matmuls

_EPS = 1e-12


@f32_matmuls
def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Two-view DLT. P: (..., 3, 4) projection matrices, x: (..., 2) pixels.

    Returns euclidean points (..., 3). Solved via SVD of the 4x4 design
    matrix (smallest right singular vector), batched.
    """
    rows = jnp.stack(
        [
            x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (..., 4, 4)
    X = _smallest_right_singular(rows)
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < _EPS, _EPS, X[..., 3:])


@f32_matmuls
def triangulate_nview(
    P: jnp.ndarray, x: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Masked N-view DLT.

    P: (..., K, 3, 4) per-view projections, x: (..., K, 2) pixels,
    mask: (..., K) bool validity. Invalid rows are zeroed (contribute
    nothing to the normal equations). Solved via eigendecomposition of
    A^T A (4x4), which is cheap and batches trivially on the MXU.
    """
    r0 = x[..., 0, None] * P[..., 2, :] - P[..., 0, :]  # (..., K, 4)
    r1 = x[..., 1, None] * P[..., 2, :] - P[..., 1, :]
    A = jnp.concatenate([r0, r1], axis=-2)  # (..., 2K, 4)
    if mask is not None:
        m2 = jnp.concatenate([mask, mask], axis=-1).astype(A.dtype)
        A = A * m2[..., None]
    # Row-norm balancing improves conditioning in f32.
    norm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(norm, _EPS)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    w, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]  # eigenvector of smallest eigenvalue
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < _EPS, _EPS, X[..., 3:])


@f32_matmuls
def triangulate_midpoint(
    centers: jnp.ndarray, rays: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """N-view midpoint: least-squares point closest to all rays.

    centers: (..., K, 3) camera centers, rays: (..., K, 3) unit directions in
    world frame. Solves sum_k (I - d d^T)(X - c) = 0.
    """
    d = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True).clip(_EPS)
    eye = jnp.eye(3, dtype=d.dtype)
    Pk = eye - d[..., :, None] * d[..., None, :]  # (..., K, 3, 3)
    if mask is not None:
        Pk = Pk * mask[..., None, None].astype(d.dtype)
    A = jnp.sum(Pk, axis=-3)
    b = jnp.sum(jnp.einsum("...kij,...kj->...ki", Pk, centers), axis=-2)
    # Solve 3x3 with Tikhonov guard for degenerate (parallel-ray) cases.
    A = A + 1e-9 * eye
    return jnp.linalg.solve(A, b[..., :, None])[..., 0]


def _smallest_right_singular(A: jnp.ndarray) -> jnp.ndarray:
    """Right singular vector of the smallest singular value via eigh(A^T A)."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    return V[..., :, 0]


def reprojection_errors(
    P: jnp.ndarray, x: jnp.ndarray, X: jnp.ndarray
) -> jnp.ndarray:
    """Pixel reprojection error of points X (..., 3) in views P (..., K, 3, 4)
    against observations x (..., K, 2). Returns (..., K)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = jnp.einsum("...kij,...j->...ki", P, Xh)
    z = proj[..., 2:]
    uv = proj[..., :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    return jnp.linalg.norm(uv - x, axis=-1)


def depths(P: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Projective depth of X (..., 3) in views P (..., K, 3, 4) -> (..., K)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    return jnp.einsum("...kj,...j->...k", P[..., 2, :], Xh)


def triangulate_nview_robust(
    P: jnp.ndarray,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    threshold_px: float = 4.0,
    max_pairs: int = 28,
    lo_iters: int = 2,
):
    """LO-RANSAC N-view triangulation, batched over tracks.

    TPU-native re-design of the reference's LORANSAC track triangulation
    (ref: src/aliceVision/multiview/triangulation/
    NViewsTriangulationLORansac.hpp:48 — TriangulateNViewsSphericalKernel +
    LORansac with best-model refit): instead of adaptively sampled
    two-view hypotheses, ALL view pairs up to `max_pairs` (a fixed
    lexicographic enumeration, masked) are triangulated by two-view DLT in
    one batch, scored by inlier count then total truncated error over the
    track, and the winner is polished by `lo_iters` rounds of masked
    N-view DLT refit on its inliers — the "local optimization" step.

    P: (..., K, 3, 4) per-view projections; x: (..., K, 2) pixels;
    mask: (..., K) valid observations. Returns (X (..., 3),
    inliers (..., K), valid (...,)).
    """
    K = P.shape[-3]
    if mask is None:
        mask = jnp.ones(x.shape[:-1], bool)

    # fixed pair enumeration (i < j), truncated to max_pairs
    ii, jj = jnp.triu_indices(K, k=1)
    ii, jj = ii[:max_pairs], jj[:max_pairs]

    P1 = P[..., ii, :, :]  # (..., Q, 3, 4)
    P2 = P[..., jj, :, :]
    x1 = x[..., ii, :]
    x2 = x[..., jj, :]
    pair_ok = mask[..., ii] & mask[..., jj]  # (..., Q)

    X0 = triangulate_dlt(P1, P2, x1, x2)  # (..., Q, 3)
    err = reprojection_errors(
        jnp.broadcast_to(P[..., None, :, :, :], X0.shape[:-1] + (K, 3, 4)),
        jnp.broadcast_to(x[..., None, :, :], X0.shape[:-1] + (K, 2)),
        X0,
    )  # (..., Q, K)
    zpos = depths(
        jnp.broadcast_to(P[..., None, :, :, :], X0.shape[:-1] + (K, 3, 4)), X0
    ) > 0
    inl = (err <= threshold_px) & mask[..., None, :] & zpos
    n_inl = jnp.sum(inl, -1)
    # truncated total error breaks inlier-count ties
    tot = jnp.sum(jnp.minimum(err, threshold_px) * mask[..., None, :], -1)
    score = n_inl.astype(x.dtype) - tot / (threshold_px * K)
    score = jnp.where(pair_ok, score, -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    X = jnp.take_along_axis(X0, best[..., None, None], -2)[..., 0, :]
    inliers = jnp.take_along_axis(inl, best[..., None, None], -2)[..., 0, :]

    # local optimization: masked N-view refit on the inlier set
    for _ in range(lo_iters):
        Xr = triangulate_nview(P, x, mask=inliers)
        err_r = reprojection_errors(P, x, Xr)
        inl_r = (err_r <= threshold_px) & mask & (depths(P, Xr) > 0)
        better = jnp.sum(inl_r, -1) >= jnp.sum(inliers, -1)
        X = jnp.where(better[..., None], Xr, X)
        inliers = jnp.where(better[..., None], inl_r, inliers)

    valid = jnp.sum(inliers, -1) >= 2
    return X, inliers, valid
