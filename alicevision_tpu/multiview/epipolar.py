"""Epipolar-geometry solvers: F (7/8pt), E (8pt, via-F 5pt-free path), H (4pt).

TPU-native re-design of the reference's minimal solvers
(ref: src/aliceVision/multiview/relativePose/Fundamental7PSolver.hpp,
Fundamental8PSolver.hpp, Essential8PSolver.hpp, Essential5PSolver.hpp:17,
Homography4PSolver.hpp). Every solver is closed-form batched linear algebra
over fixed-size design matrices — made for vmap over thousands of RANSAC
minimal samples at once. Data-dependent polynomial root-finding (7pt cubic,
5pt 10th-degree) is done with companion-matrix eigenvalues, which XLA
batches.

Point conditioning (Hartley normalization) follows
src/aliceVision/robustEstimation/conditioning.cpp.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import pose_from_Rt, Pose
from ..numeric import f32_matmuls

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------


def normalize_points(x: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Hartley normalization: translate centroid to origin, scale mean norm to
    sqrt(2). x: (..., N, 2). Returns (x_norm, T) with T: (..., 3, 3)."""
    if mask is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        d = jnp.linalg.norm(x - mean, axis=-1)
        scale = jnp.sqrt(2.0) / jnp.mean(d, axis=-1).clip(_EPS)
    else:
        w = mask.astype(x.dtype)
        cnt = jnp.sum(w, axis=-1, keepdims=True).clip(1.0)
        mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / cnt[..., None]
        d = jnp.linalg.norm(x - mean, axis=-1) * w
        scale = jnp.sqrt(2.0) * cnt[..., 0] / jnp.sum(d, axis=-1).clip(_EPS)
    s = scale[..., None, None]
    xn = (x - mean) * s
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    T = jnp.stack(
        [
            scale, zeros, -scale * mean[..., 0, 0],
            zeros, scale, -scale * mean[..., 0, 1],
            zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(x.shape[:-2] + (3, 3))
    return xn, T


def _epipolar_design(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rows of the linear system x2^T F x1 = 0. x: (..., N, 2) -> (..., N, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def _nullvectors(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """k smallest right singular vectors of A (..., N, 9) -> (..., k, 9)."""
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    return jnp.moveaxis(V[..., :, :k], -1, -2)


@f32_matmuls
def fundamental_8pt(x1: jnp.ndarray, x2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Normalized 8-point algorithm. x: (..., N>=8, 2) pixels -> F (..., 3, 3).

    Rank-2 constraint enforced by zeroing the smallest singular value.
    """
    x1n, T1 = normalize_points(x1, mask)
    x2n, T2 = normalize_points(x2, mask)
    A = _epipolar_design(x1n, x2n)
    if mask is not None:
        A = A * mask[..., None].astype(A.dtype)
    f = _nullvectors(A, 1)[..., 0, :]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Rank-2 projection.
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = U @ (s[..., :, None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    return F / jnp.linalg.norm(F, axis=(-2, -1), keepdims=True).clip(_EPS)


@f32_matmuls
def fundamental_7pt(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """7-point solver: returns up to 3 solutions (..., 3, 3, 3).

    The cubic det(a F1 + (1-a) F2) = 0 is solved via the companion matrix of
    the cubic polynomial; complex roots are projected to their real part and
    produce duplicated/invalid F which RANSAC scoring naturally rejects.
    """
    x1n, T1 = normalize_points(x1)
    x2n, T2 = normalize_points(x2)
    A = _epipolar_design(x1n, x2n)
    fs = _nullvectors(A, 2)  # (..., 2, 9)
    F1 = fs[..., 0, :].reshape(fs.shape[:-2] + (3, 3))
    F2 = fs[..., 1, :].reshape(fs.shape[:-2] + (3, 3))

    # det(a F1 + (1 - a) F2) = c3 a^3 + c2 a^2 + c1 a + c0.
    # Evaluate the cubic at 4 points and interpolate coefficients — branch-free
    # and avoids hand-expanding the determinant polynomial.
    d = jnp.linalg.det
    ts = jnp.array([0.0, 1.0, -1.0, 2.0], dtype=x1.dtype)
    vals = jnp.stack(
        [d(t * F1 + (1.0 - t) * F2) for t in ts], axis=-1
    )  # (..., 4)
    # Vandermonde solve for [c0, c1, c2, c3].
    V = jnp.stack([ts**0, ts, ts**2, ts**3], axis=-1)  # (4, 4)
    coeffs = jnp.einsum("ij,...j->...i", jnp.linalg.inv(V), vals)
    c0, c1, c2, c3 = (coeffs[..., i] for i in range(4))

    # Closed-form real cubic roots (general eig is CPU-only in XLA).
    from ..numeric import cubic_roots_real

    a, _ = cubic_roots_real(c3, c2, c1, c0)  # (..., 3)

    Fs = a[..., None, None] * F1[..., None, :, :] + (1.0 - a)[..., None, None] * F2[..., None, :, :]
    Fs = jnp.swapaxes(T2, -1, -2)[..., None, :, :] @ Fs @ T1[..., None, :, :]
    return Fs / jnp.linalg.norm(Fs, axis=(-2, -1), keepdims=True).clip(_EPS)


@f32_matmuls
def essential_8pt(x1: jnp.ndarray, x2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """8-point essential from *normalized camera* coords; projects onto the
    essential manifold (two equal singular values)."""
    F = fundamental_8pt(x1, x2, mask)
    U, s, Vt = jnp.linalg.svd(F)
    sm = 0.5 * (s[..., 0] + s[..., 1])
    s = jnp.stack([sm, sm, jnp.zeros_like(sm)], axis=-1)
    return U @ (s[..., :, None] * Vt)


def essential_from_F(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


@f32_matmuls
def homography_4pt(x1: jnp.ndarray, x2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """DLT homography from >= 4 correspondences. x: (..., N, 2) -> H (..., 3, 3)."""
    x1n, T1 = normalize_points(x1, mask)
    x2n, T2 = normalize_points(x2, mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, u1, v1, one, -v2 * u1, -v2 * v1, -v2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    if mask is not None:
        m2 = jnp.concatenate([mask, mask], axis=-1).astype(A.dtype)
        A = A * m2[..., None]
    h = _nullvectors(A, 1)[..., 0, :]
    H = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < _EPS, _EPS, H[..., 2:3, 2:3])


# ---------------------------------------------------------------------------
# Decomposition / residuals
# ---------------------------------------------------------------------------


@f32_matmuls
def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate relative poses (R, t) with |t| = 1.

    Returns (R: (..., 4, 3, 3), t: (..., 4, 3)) — the classic U W V^T
    construction (ref: multiview/essential.cpp motionFromEssential).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce det(U) = det(V) = +1 so the candidates are rotations.
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(dU), jnp.ones_like(dU), dU], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(dV), jnp.ones_like(dV), dV], -1)[..., :, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)
    return R4, t4


def select_cheirality(R4, t4, x1, x2, mask=None):
    """Pick the (R, t) candidate with the most points in front of both views.

    x1, x2: (..., N, 2) normalized-camera correspondences.
    Returns (R (...,3,3), t (...,3), n_front (...,)).
    """
    from .triangulation import triangulate_dlt

    eye34 = jnp.concatenate([jnp.eye(3, dtype=R4.dtype), jnp.zeros((3, 1), R4.dtype)], -1)
    P1 = jnp.broadcast_to(eye34, R4.shape[:-3] + (3, 4))

    def count_front(R, t):
        P2 = jnp.concatenate([R, t[..., :, None]], axis=-1)
        X = triangulate_dlt(
            P1[..., None, :, :], P2[..., None, :, :], x1, x2
        )  # (..., N, 3)
        z1 = X[..., 2]
        Xc2 = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
        z2 = Xc2[..., 2]
        ok = (z1 > 0) & (z2 > 0)
        if mask is not None:
            ok = ok & mask
        return jnp.sum(ok, axis=-1)

    counts = jnp.stack(
        [count_front(R4[..., i, :, :], t4[..., i, :]) for i in range(4)], axis=-1
    )
    best = jnp.argmax(counts, axis=-1)
    R = jnp.take_along_axis(R4, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(t4, best[..., None, None], axis=-2)[..., 0, :]
    return R, t, jnp.max(counts, axis=-1)


@f32_matmuls
def relative_pose_from_essential(E, x1, x2, mask=None) -> Pose:
    R4, t4 = decompose_essential(E)
    R, t, _ = select_cheirality(R4, t4, x1, x2, mask)
    return pose_from_Rt(R, t)


def epipolar_distance_sq(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric squared epipolar (Sampson) distance.

    F: (..., 3, 3), x: (..., N, 2) -> (..., N). This is the residual used for
    RANSAC scoring (matches the reference's errorEstimator choices).
    """
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # (..., N, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Fp1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftp2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    num = jnp.einsum("...ni,...ni->...n", p2, Fp1) ** 2
    den = (
        Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2 + Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2
    ).clip(_EPS)
    return num / den


def homography_error_sq(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer squared error ||H x1 - x2||^2 -> (..., N)."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hp = jnp.einsum("...ij,...nj->...ni", H, p1)
    z = jnp.where(jnp.abs(Hp[..., 2:]) < _EPS, _EPS, Hp[..., 2:])
    uv = Hp[..., :2] / z
    return jnp.sum((uv - x2) ** 2, axis=-1)


@f32_matmuls
def fundamental_10pt(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    n_lambda: int = 33,
    refine_rounds: int = 3,
):
    """F + one shared radial distortion coefficient from >= 10 pixel
    correspondences (division model applied symmetrically to both views).

    TPU-native re-design of the reference's F10 Gröbner solver
    (ref: src/aliceVision/multiview/relativePose/Fundamental10PSolver.hpp:37
    — pose+distortion from 10 pts): a fixed lambda sweep undistorts both
    sides (x_u = x_d / (1 + λ r̂²), radius normalized by each view's spread
    so λ is image-size invariant), the 8-point solve scores each λ by total
    Sampson error, and golden-ratio-style shrinking grids refine λ around
    the winner — fixed budget, batched over RANSAC samples.

    x1, x2: (..., N>=10, 2) *centered* pixels (principal point at origin).
    Returns (F (..., 3, 3), lam (...,)) where the model is
    x2u^T F x1u = 0 with x_u = x / (1 + lam * |x|^2 / s^2), s the mean
    point radius of the pair.
    """
    dt = x1.dtype
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], bool)
    w = mask.astype(dt)
    cnt = jnp.sum(w, -1, keepdims=True).clip(1.0)
    s2 = (
        jnp.sum((jnp.sum(x1 * x1, -1) + jnp.sum(x2 * x2, -1)) * w, -1, keepdims=True)
        / (2.0 * cnt)
    ).clip(_EPS)  # (..., 1) mean squared radius

    def undistort(x, lam):
        # lam: (..., K) broadcast over points; x: (..., N, 2)
        r2 = jnp.sum(x * x, -1) / s2  # (..., N)
        d = 1.0 + lam[..., None] * r2[..., None, :]  # (..., K, N)
        d = jnp.where(jnp.abs(d) < 0.05, 0.05, d)
        return x[..., None, :, :] / d[..., None]

    def score(lam):
        u1 = undistort(x1, lam)
        u2 = undistort(x2, lam)
        F = fundamental_8pt(u1, u2, mask=jnp.broadcast_to(mask[..., None, :], u1.shape[:-1]))
        res = epipolar_distance_sq(F, u1, u2)
        return F, jnp.sum(res * w[..., None, :], -1)

    lo = jnp.full(x1.shape[:-2], -0.5, dt)
    hi = jnp.full(x1.shape[:-2], 0.5, dt)
    best_F = None
    best_lam = None
    for _ in range(refine_rounds):
        lam = lo[..., None] + (hi - lo)[..., None] * jnp.linspace(0.0, 1.0, n_lambda, dtype=dt)
        F, sc = score(lam)
        i = jnp.argmin(sc, axis=-1)
        best_lam = jnp.take_along_axis(lam, i[..., None], -1)[..., 0]
        best_F = jnp.take_along_axis(F, i[..., None, None, None], -3)[..., 0, :, :]
        step = (hi - lo) / (n_lambda - 1)
        lo = best_lam - step
        hi = best_lam + step
    return best_F, best_lam / s2[..., 0]
