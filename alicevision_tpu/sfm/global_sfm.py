"""Global SfM: rotation averaging + translation averaging + triangulation.

TPU-native re-design of the reference's global pipeline
(ref: src/aliceVision/sfm/pipeline/global/ReconstructionEngine_globalSfM.hpp:36-53,
GlobalSfMRotationAveragingSolver.cpp — L1 [Chatterjee] / L2 dense,
GlobalSfMTranslationAveragingSolver.cpp — L2-chordal / L1-soft;
multiview/rotationAveraging/l1.cpp, l2.cpp,
translationAveraging/solverL2Chordal.cpp).

Rotation averaging: the L2-chordal solution is the top-3 eigenvector block
of the pairwise rotation graph matrix (dense eigh — batched, MXU-friendly),
projected per-camera to SO(3); an optional IRLS loop reweights edges by
residual for L1 robustness. Translation averaging: the classic L2-chordal
linear system over camera centers and per-edge baseline scales, solved as
one normal-equation system with gauge fixing (c_0 = 0, mean scale = 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import so3_log


def rotation_averaging_l2(
    n_views: int,
    edges: np.ndarray,  # (E, 2) view index pairs (i, j)
    R_rel: jnp.ndarray,  # (E, 3, 3) with R_j = R_rel @ R_i (world->cam)
    weights: jnp.ndarray | None = None,
    irls_iters: int = 0,
) -> jnp.ndarray:
    """Global rotations (V, 3, 3) from pairwise relatives, L2-chordal.

    Builds G with blocks G[i, j] = w_ij R_ij^T (and G[j, i] = w_ij R_ij),
    takes the top-3 eigenvectors, orthonormalizes each 3x3 block via SVD.
    With irls_iters > 0, re-weights edges by 1/(chordal residual) for an
    L1-flavoured robust solution (the [Chatterjee] iteration in spirit).
    """
    E = len(edges)
    ii = jnp.asarray(edges[:, 0])
    jj = jnp.asarray(edges[:, 1])
    w = jnp.ones((E,)) if weights is None else weights

    def solve(w):
        G = jnp.zeros((3 * n_views, 3 * n_views))

        def put(G, a, b, blk, wt):
            rows = 3 * a[:, None, None] + jnp.arange(3)[None, :, None]
            cols = 3 * b[:, None, None] + jnp.arange(3)[None, None, :]
            return G.at[rows, cols].add(blk * wt[:, None, None])

        # R_j = R_ij R_i  =>  blocks couple i and j
        G = put(G, ii, jj, jnp.swapaxes(R_rel, -1, -2), w)  # G[i,j] += R_ij^T
        G = put(G, jj, ii, R_rel, w)  # G[j,i] += R_ij
        deg = jnp.zeros((n_views,)).at[ii].add(w).at[jj].add(w)
        G = G + jnp.kron(jnp.diag(deg), jnp.eye(3))

        _, V = jnp.linalg.eigh(G)
        B = V[:, -3:].reshape(n_views, 3, 3)  # top-3 eigenvector blocks
        # The eigenvectors are only defined up to a common orthogonal mixing
        # Q; if Q is improper (det -1) the per-block SO(3) projections become
        # mutually inconsistent — fix the global chirality first.
        flip = jnp.where(jnp.sum(jnp.linalg.det(B)) < 0, -1.0, 1.0)
        B = B * jnp.array([1.0, 1.0, 1.0])[None, None, :].at[..., 2].mul(flip)
        # Project each block onto SO(3).
        U, _, Vt = jnp.linalg.svd(B)
        det = jnp.linalg.det(U @ Vt)
        D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
        R = U @ (D[..., :, None] * Vt)
        # Fix global gauge: R_0 = I.
        return jnp.einsum("vij,kj->vik", R, R[0])

    R = solve(w)
    for _ in range(irls_iters):
        res = jnp.linalg.norm(
            R[jj] - jnp.einsum("eij,ejk->eik", R_rel, R[ii]), axis=(-2, -1)
        )
        w = 1.0 / (res + 0.1)
        R = solve(w)
    return R


def rotation_averaging_l1(
    n_views: int,
    edges: np.ndarray,
    R_rel: jnp.ndarray,
    outer_iters: int = 8,
    irls_eps: float = 1e-3,
) -> jnp.ndarray:
    """L1 rotation averaging, IRLS in the tangent space [Chatterjee-Govindu]
    (ref: multiview/rotationAveraging/l1.cpp — same fixed point, different
    numerics: the reference runs sparse successive relaxation, here each
    IRLS step is one dense (3V, 3V) solve batched on the chip).

    Starts from the L2-chordal eigen solution, then repeats: per-edge
    residual r_e = log(R_j (R_ij R_i)^T), solve the graph Laplacian system
    for per-view tangent updates with weights 1/max(|r_e|, eps).
    """
    from ..geometry.rotations import so3_exp

    ii = jnp.asarray(edges[:, 0])
    jj = jnp.asarray(edges[:, 1])
    E = len(edges)
    R = rotation_averaging_l2(n_views, edges, R_rel)

    eye3 = jnp.eye(3)

    for _ in range(outer_iters):
        # Residual rotation per edge; want delta_j - delta_i = -log M_e.
        M = jnp.einsum("eij,ekj->eik", R[jj], jnp.einsum("eij,ejk->eik", R_rel, R[ii]))
        r = so3_log(M)  # (E, 3)
        w = 1.0 / jnp.maximum(jnp.linalg.norm(r, axis=-1), irls_eps)
        # Weighted graph Laplacian over 3-vectors (block diagonal scalar).
        L = jnp.zeros((n_views, n_views))
        L = L.at[ii, jj].add(-w).at[jj, ii].add(-w)
        L = L.at[ii, ii].add(w).at[jj, jj].add(w)
        # rhs: sum over incident edges of +-w r
        b = jnp.zeros((n_views, 3)).at[jj].add(-w[:, None] * r).at[ii].add(w[:, None] * r)
        # Gauge: pin view 0.
        L = L.at[0, :].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
        b = b.at[0].set(0.0)
        delta = jnp.linalg.solve(L + 1e-9 * jnp.eye(n_views), b)  # (V, 3)
        R = jnp.einsum("vij,vjk->vik", so3_exp(delta), R)
    # Re-fix gauge R_0 = I.
    return jnp.einsum("vij,kj->vik", R, R[0])


def translation_averaging_l1soft(
    n_views: int,
    edges: np.ndarray,
    dirs_world: jnp.ndarray,
    outer_iters: int = 6,
    irls_eps: float = 1e-3,
) -> jnp.ndarray:
    """Soft-L1 translation averaging: IRLS over the L2-chordal system
    (ref: translationAveraging/solverL1Soft semantics — robust loss on the
    per-edge chordal residual, realized as reweighted dense solves)."""
    edges = np.asarray(edges)
    ii, jj = edges[:, 0], edges[:, 1]
    d = np.asarray(dirs_world)
    w = None
    c = translation_averaging_l2(n_views, edges, jnp.asarray(d))
    for _ in range(outer_iters):
        cn = np.asarray(c)
        diff = cn[jj] - cn[ii]
        # Residual against the best per-edge scale (projection onto d).
        s = np.maximum(np.sum(diff * d, axis=-1), 1e-9)
        res = np.linalg.norm(diff - s[:, None] * d, axis=-1)
        w = 1.0 / np.sqrt(np.maximum(res, irls_eps))
        c = translation_averaging_l2(n_views, edges, jnp.asarray(d), weights=w)
    return c


def rotation_residuals_deg(R, edges, R_rel) -> jnp.ndarray:
    """Per-edge angular residual of the averaged rotations (degrees)."""
    ii, jj = edges[:, 0], edges[:, 1]
    dR = jnp.einsum("eij,ekj->eik", R[jj], jnp.einsum("eij,ejk->eik", R_rel, R[ii]))
    return jnp.degrees(jnp.linalg.norm(so3_log(dR), axis=-1))


def translation_averaging_l2(
    n_views: int,
    edges: np.ndarray,  # (E, 2)
    dirs_world: jnp.ndarray,  # (E, 3) unit direction c_j - c_i in world frame
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Camera centers (V, 3) from pairwise baseline directions, L2-chordal.

    Unknowns x = [c_1..c_V, s_1..s_E]; equations c_j - c_i - s_e d_e = 0,
    gauge: c_0 = 0, sum(s) = E. Solved via dense normal equations.
    """
    E = len(edges)
    ii = edges[:, 0]
    jj = edges[:, 1]
    w = np.ones(E) if weights is None else np.asarray(weights)

    n_unk = 3 * n_views + E
    # Build A (3E + 4, n_unk), b.
    rows = []
    A = np.zeros((3 * E + 4, n_unk))
    b = np.zeros(3 * E + 4)
    d = np.asarray(dirs_world)
    for e in range(E):
        for k in range(3):
            r = 3 * e + k
            A[r, 3 * jj[e] + k] = w[e]
            A[r, 3 * ii[e] + k] = -w[e]
            A[r, 3 * n_views + e] = -w[e] * d[e, k]
    # gauge: c_0 = 0 (3 rows), mean scale = 1
    big = np.sqrt(E) * 10.0
    A[3 * E + 0, 0] = big
    A[3 * E + 1, 1] = big
    A[3 * E + 2, 2] = big
    A[3 * E + 3, 3 * n_views :] = 1.0
    b[3 * E + 3] = E

    AtA = jnp.asarray(A.T @ A) + 1e-9 * jnp.eye(n_unk)
    Atb = jnp.asarray(A.T @ b)
    x = jnp.linalg.solve(AtA, Atb)
    return x[: 3 * n_views].reshape(n_views, 3)


def relative_motions_from_poses(R_i, R_j, c_i, c_j):
    """Ground-truth-style helpers for tests: R_rel with R_j = R_rel R_i and
    world-frame unit baseline direction."""
    R_rel = R_j @ np.swapaxes(R_i, -1, -2)
    d = c_j - c_i
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return R_rel, d


class GlobalSfM:
    """Global reconstruction driver: relative poses -> averaging ->
    triangulation -> BA (ReconstructionEngine_globalSfM::process)."""

    def __init__(self, n_views, intr_table, view_intrinsic, image_sizes):
        self.n_views = n_views
        self.intr = intr_table
        self.view_intrinsic = np.asarray(view_intrinsic)
        self.image_sizes = np.asarray(image_sizes)

    def run(
        self,
        edges: np.ndarray,
        R_rel: np.ndarray,
        dirs_ref: np.ndarray,
        tracks=None,
        features_xy=None,
        irls_iters: int = 3,
    ):
        """edges: (E,2); R_rel: (E,3,3) with R_j = R_rel R_i; dirs_ref: (E,3)
        unit t_ij in the *i-frame* (from essential decomposition: direction
        of c_j - c_i expressed in camera i). Returns (R (V,3,3), c (V,3))."""
        R = rotation_averaging_l2(
            self.n_views, edges, jnp.asarray(R_rel), irls_iters=irls_iters
        )
        # lift pairwise directions to world frame with averaged rotations
        Rn = np.asarray(R)
        d_world = np.einsum(
            "eji,ej->ei", Rn[edges[:, 0]], np.asarray(dirs_ref)
        )  # R_i^T d
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        c = translation_averaging_l2(self.n_views, edges, jnp.asarray(d_world))
        return Rn, np.asarray(c)
