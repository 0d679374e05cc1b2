"""Zhang planar camera calibration.

TPU-native counterpart of the reference's OpenCV-backed calibration
(ref: src/aliceVision/calibration/calibration.cpp — cv::calibrateCamera
wrapper). Implemented from scratch as batched linear algebra: per-view
plane homographies (DLT), closed-form intrinsics from the absolute-conic
constraints [Zhang00], per-view pose recovery, then a joint Gauss-Newton
refinement of (fx, fy, cx, cy, k1, k2, poses) on the reprojection error —
all jit-compatible fixed-iteration math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..multiview.epipolar import normalize_points
from ..geometry.rotations import so3_exp, so3_log


def homography_dlt_planar(obj_xy: jnp.ndarray, img_xy: jnp.ndarray) -> jnp.ndarray:
    """Homography board-plane -> image for one view ((N,2),(N,2)) -> (3,3)."""
    from ..multiview.epipolar import homography_4pt

    return homography_4pt(obj_xy, img_xy)


def _v_ij(H, i, j):
    return jnp.stack(
        [
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ]
    )


def intrinsics_from_homographies(Hs: jnp.ndarray) -> jnp.ndarray:
    """Closed-form K from >= 3 homographies (Zhang's B-matrix route).

    Hs: (V, 3, 3). Returns K (3, 3)."""
    rows = []
    for v in range(Hs.shape[0]):
        H = Hs[v]
        rows.append(_v_ij(H, 0, 1))
        rows.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    A = jnp.stack(rows)
    _, Vt = jnp.linalg.eigh(A.T @ A)
    b = Vt[:, 0]
    B11, B12, B22, B13, B23, B33 = b
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    return jnp.array([[alpha, gamma, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])


def pose_from_homography(K: jnp.ndarray, H: jnp.ndarray):
    """Per-view (R, t) from H = K [r1 r2 t] (board plane z=0)."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.linalg.norm(Kinv @ h1).clip(1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=1)
    # project onto SO(3)
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = lam * (Kinv @ h3)
    return R, t


def calibrate_zhang(
    obj_xy: np.ndarray,  # (N, 2) board coords (same for every view)
    img_pts: np.ndarray,  # (V, N, 2) detected corners per view
    refine_iters: int = 20,
):
    """Full calibration. Returns dict with K, dist (k1, k2), poses, rms."""
    V, N, _ = img_pts.shape
    obj = jnp.asarray(obj_xy, jnp.float32)
    imgs = jnp.asarray(img_pts, jnp.float32)

    Hs = jnp.stack([homography_dlt_planar(obj, imgs[v]) for v in range(V)])
    K0 = intrinsics_from_homographies(Hs)
    poses = [pose_from_homography(K0, Hs[v]) for v in range(V)]
    R0 = jnp.stack([p[0] for p in poses])
    t0 = jnp.stack([p[1] for p in poses])

    obj3 = jnp.concatenate([obj, jnp.zeros_like(obj[:, :1])], axis=-1)  # (N,3)

    def unpack(x):
        fx, fy, cx, cy, k1, k2 = x[:6]
        w = x[6 : 6 + 3 * V].reshape(V, 3)
        t = x[6 + 3 * V :].reshape(V, 3)
        return fx, fy, cx, cy, k1, k2, w, t

    def residuals(x):
        fx, fy, cx, cy, k1, k2, w, t = unpack(x)
        R = so3_exp(w)  # (V, 3, 3)
        Xc = jnp.einsum("vij,nj->vni", R, obj3) + t[:, None, :]
        z = Xc[..., 2].clip(1e-6)
        p = Xc[..., :2] / z[..., None]
        r2 = jnp.sum(p * p, axis=-1)
        s = 1.0 + k1 * r2 + k2 * r2 * r2
        u = fx * p[..., 0] * s + cx
        v = fy * p[..., 1] * s + cy
        return (jnp.stack([u, v], -1) - imgs).reshape(-1)

    x0 = jnp.concatenate(
        [
            jnp.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], 0.0, 0.0]),
            so3_log(R0).reshape(-1),
            t0.reshape(-1),
        ]
    )

    def gn_step(x, _):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        JtJ = J.T @ J + 1e-6 * jnp.eye(x.shape[0])
        dx = jnp.linalg.solve(JtJ, J.T @ r)
        x_new = x - dx
        better = jnp.sum(residuals(x_new) ** 2) < jnp.sum(r * r)
        return jnp.where(better, x_new, x), None

    x, _ = jax.lax.scan(gn_step, x0, None, length=refine_iters)
    fx, fy, cx, cy, k1, k2, w, t = unpack(x)
    r = residuals(x)
    rms = jnp.sqrt(jnp.mean(r * r))
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return {
        "K": np.asarray(K),
        "dist": np.array([float(k1), float(k2)]),
        "R": np.asarray(so3_exp(w)),
        "t": np.asarray(t),
        "rms": float(rms),
    }
