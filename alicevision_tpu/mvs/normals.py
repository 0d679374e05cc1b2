"""Normal maps from depth maps — windowed PCA plane fit per pixel.

TPU-native re-design of the reference's NormalMapEstimator
(ref: src/aliceVision/depthMap/NormalMapEstimator.hpp:22,
cuda/planeSweeping/deviceDepthSimilarityMapKernels.cuh:394-460
depthSimMapComputeNormal_kernel): each pixel fits a plane by PCA to the
backprojected 3D points of a (2*wsh+1)^2 window, keeping only neighbors
whose depth is within 30 pixel-sizes of the center (depth-edge gate), and
orients the normal toward the camera.

The CUDA kernel loops the window per thread; here the window is unrolled
into shifted whole-image planes (the gate depends on the *center* depth,
so it is not a separable filter), the 3x3 covariance is accumulated as six
component images, and the smallest eigenvector comes from a few closed-form
inverse iterations — everything elementwise over (H, W) with no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def backproject_depth(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Depth (H, W) + intrinsics -> camera-frame points (H, W, 3)."""
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xs = (jnp.arange(W, dtype=depth.dtype) - cx) / fx
    ys = (jnp.arange(H, dtype=depth.dtype) - cy) / fy
    X = depth * xs[None, :]
    Y = depth * ys[:, None]
    return jnp.stack([X, Y, depth], -1)


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x shifted so out[i, j] = x[i + dy, j + dx], zero-padded."""
    H, W = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(0, -dy), max(0, dy)),
        (max(0, -dx), max(0, dx)),
    ]
    xp = jnp.pad(x, pad)
    y0 = max(0, dy)
    x0 = max(0, dx)
    return xp[..., y0 : y0 + H, x0 : x0 + W]


def normal_map_from_depth(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    wsh: int = 4,
    depth_gate_pixsizes: float = 30.0,
    iters: int = 6,
) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) unit normals in the camera frame, oriented
    toward the camera; invalid pixels (depth <= 0, degenerate windows) get
    (-1, -1, -1) like the reference."""
    dt = depth.dtype
    P = backproject_depth(depth, K)
    valid0 = depth > 0
    # pixel size at each depth: one-pixel step in x at the same depth
    pix_size = depth / K[0, 0]
    gate = depth_gate_pixsizes * pix_size

    # accumulate weighted first/second moments over the unrolled window
    S = jnp.zeros_like(depth)
    m = [jnp.zeros_like(depth) for _ in range(3)]
    c = {(i, j): jnp.zeros_like(depth) for i in range(3) for j in range(i, 3)}
    comps = [P[..., 0], P[..., 1], P[..., 2]]
    for dy in range(-wsh, wsh + 1):
        for dx in range(-wsh, wsh + 1):
            dsh = _shift(depth, dy, dx)
            w = (
                valid0
                & (dsh > 0)
                & (jnp.abs(dsh - depth) < gate)
            ).astype(dt)
            S = S + w
            pe = [_shift(q, dy, dx) * w for q in comps]
            for i in range(3):
                m[i] = m[i] + pe[i]
            for i in range(3):
                for j in range(i, 3):
                    # E[p_i p_j]: reuse the masked shifted planes
                    c[(i, j)] = c[(i, j)] + pe[i] * _shift(comps[j], dy, dx)

    Sn = jnp.maximum(S, 1.0)
    mu = [mi / Sn for mi in m]
    # covariance components
    C = {
        (i, j): c[(i, j)] / Sn - mu[i] * mu[j]
        for i in range(3)
        for j in range(i, 3)
    }
    # ridge keeps the closed-form inverse finite on degenerate windows
    tr = (C[(0, 0)] + C[(1, 1)] + C[(2, 2)]).clip(_EPS)
    ridge = 1e-6 * tr
    a = C[(0, 0)] + ridge
    b = C[(0, 1)]
    cc = C[(0, 2)]
    d = C[(1, 1)] + ridge
    e = C[(1, 2)]
    f = C[(2, 2)] + ridge

    # closed-form inverse of the symmetric 3x3 (adjugate / det)
    co_a = d * f - e * e
    co_b = cc * e - b * f
    co_c = b * e - cc * d
    det = a * co_a + b * co_b + cc * co_c
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    i00 = co_a / det
    i01 = co_b / det
    i02 = co_c / det
    i11 = (a * f - cc * cc) / det
    i12 = (b * cc - a * e) / det
    i22 = (a * d - b * b) / det

    # inverse iteration -> eigenvector of the smallest eigenvalue
    nx = jnp.zeros_like(depth)
    ny = jnp.zeros_like(depth)
    nz = -jnp.ones_like(depth)  # toward the camera as the seed
    for _ in range(iters):
        tx = i00 * nx + i01 * ny + i02 * nz
        ty = i01 * nx + i11 * ny + i12 * nz
        tz = i02 * nx + i12 * ny + i22 * nz
        nn = jnp.sqrt(tx * tx + ty * ty + tz * tz).clip(_EPS)
        nx, ny, nz = tx / nn, ty / nn, tz / nn

    # orient toward the camera: n . p < 0 (p is the viewing ray)
    dot = nx * P[..., 0] + ny * P[..., 1] + nz * P[..., 2]
    flip = jnp.where(dot > 0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    ok = valid0 & (S >= 3)
    n = jnp.stack([nx, ny, nz], -1)
    return jnp.where(ok[..., None], n, -1.0)
