"""Image filtering primitives: separable Gaussian, gradients, resampling.

TPU-native counterpart of the reference's image convolution/resampling
(ref: src/aliceVision/image/convolution.cpp, resampling.hpp). Everything
operates on (..., H, W) float arrays and compiles to XLA convolutions that
fuse well; kernels are static-shape (radius fixed at trace time).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv_1d(img: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Convolve along one spatial axis (-1 or -2) with edge replication.

    Lowered as a 2D NCHW convolution with a (1, K) / (K, 1) kernel over the
    full (H, W) plane — flattening rows into a batch of tiny 1D convs (the
    previous formulation) is pathological on TPU (~40 ms per 512x384 blur vs
    well under a millisecond this way).
    """
    if axis < 0:
        axis += img.ndim
    spatial_axis = axis - (img.ndim - 2)  # 0 = H, 1 = W
    r = (kernel.shape[0] - 1) // 2
    pads = [(0, 0)] * img.ndim
    pads[axis] = (r, r)
    padded = jnp.pad(img, pads, mode="edge")
    lead = padded.shape[:-2]
    x = padded.reshape((-1, 1) + padded.shape[-2:])  # (N, 1, H, W)
    if spatial_axis == 1:
        kern = kernel.reshape(1, 1, 1, -1)
    else:
        kern = kernel.reshape(1, 1, -1, 1)
    out = jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(lead + out.shape[-2:])


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur on (..., H, W)."""
    if sigma <= 0:
        return img
    k = gaussian_kernel_1d(sigma, radius)
    out = _conv_1d(img, k, axis=-1)
    return _conv_1d(out, k, axis=-2)


def _blur_band_matrix(n: int, sigma: float, radius: int | None) -> jnp.ndarray:
    """Banded (n, n) blur matrix with edge-replication semantics —
    out[i] = sum_o k[o] * x[clip(i + o)] exactly like the padded conv."""
    import numpy as np

    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    M = np.zeros((n, n), np.float32)
    idx_base = np.arange(n)
    for o, kv in zip(range(-radius, radius + 1), k):
        M[idx_base, np.clip(idx_base + o, 0, n - 1)] += kv
    return jnp.asarray(M)


def gaussian_blur_mm(
    img: jnp.ndarray,
    sigma: float,
    radius: int | None = None,
    precision: str = "tensorfloat32",
) -> jnp.ndarray:
    """Separable Gaussian blur as two banded MATMULS on (..., H, W).

    On TPU the single-channel NCHW conv lowering leaves the MXU idle —
    measured 5.1 ms vs 1.3 ms (tensorfloat32) / 0.45 ms (default bf16)
    per (320, 272, 480) stack on v5e, ~4-12x. Math matches `gaussian_blur`
    to the TPU conv's own precision class (the f32 conv also rounds
    operands, measured ~4e-3 on [0,1] data); use for bulk cost-volume
    filtering, keep the conv for precision-critical small filters."""
    if sigma <= 0:
        return img
    H, W = img.shape[-2], img.shape[-1]
    BW = _blur_band_matrix(W, sigma, radius)
    BH = _blur_band_matrix(H, sigma, radius)
    y = jnp.einsum("...hw,vw->...hv", img, BW, precision=precision)
    return jnp.einsum("uh,...hv->...uv", BH, y, precision=precision)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Decimate by 2 (every other pixel), matching scale-space conventions."""
    return img[..., ::2, ::2]


def upsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample of (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    return jax.image.resize(img, img.shape[:-2] + (2 * h, 2 * w), method="bilinear")


def gradients(img: jnp.ndarray):
    """Central-difference gradients (gx, gy) on (..., H, W)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1))
    gy = 0.5 * (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2))
    return gx, gy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Sample img (H, W) at continuous xy (..., 2) = (x, y) pixel coords."""
    H, W = img.shape[-2], img.shape[-1]
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # gather on FLAT linear indices: XLA:TPU lowers a 1-D take ~25x faster
    # than the 2-D advanced-indexing gather (measured 0.68 vs 17.3 ms for a
    # 544x960 sample on v5e)
    flat = img.reshape(-1)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take(flat, lin.reshape(-1)).reshape(lin.shape)
        return jnp.where(inside, v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def to_grayscale(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W) using Rec.601 weights (matches OIIO)."""
    w = jnp.array([0.299, 0.587, 0.114], rgb.dtype)
    return jnp.einsum("...c,c->...", rgb, w)
