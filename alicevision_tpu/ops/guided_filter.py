"""Guided filter and edge-aware cost-volume filtering.

The reference's plane-sweep NCC weights every patch pixel by color
similarity to the patch center (adaptive support, gammaC/gammaP —
ref: src/aliceVision/depthMap/cuda/device/Patch.cuh:467-531 and
SgmParams.hpp:30-33). That per-center weighting is inherently
non-separable, which is exactly why the CUDA code runs one thread per
patch. The TPU-native equivalent is guided-image filtering of the cost
volume [Hosni et al., "Cost-Volume Filtering", PAMI 2013; He et al.,
"Guided Image Filtering", ECCV 2010]: the same edge-adaptive aggregation
expressed as a fixed number of box filters — separable cumulative sums
that vectorize over whole images and batch over depth planes.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Mean filter with window (2r+1)^2 over the last two axes, edge-
    normalized (partial windows divide by their true area)."""
    ones = jnp.ones(x.shape[-2:], x.dtype)

    def box1d(v, axis):
        n = v.shape[axis]
        c = jnp.cumsum(v, axis=axis)
        hi = jnp.take(c, jnp.clip(jnp.arange(n) + r, 0, n - 1), axis=axis)
        ilo = jnp.arange(n) - r - 1
        lo = jnp.take(c, jnp.clip(ilo, 0, n - 1), axis=axis)
        shape = [1] * v.ndim
        shape[axis] = n
        mask = (ilo >= 0).reshape(shape)
        return hi - jnp.where(mask, lo, 0.0)

    def box2d(v):
        return box1d(box1d(v, -1), -2)

    area = box2d(ones)
    return box2d(x) / area


def guided_filter(
    guide: jnp.ndarray, x: jnp.ndarray, radius: int = 8, eps: float = 1e-3
) -> jnp.ndarray:
    """He et al. guided filter. guide: (H, W); x: (..., H, W) filtered
    per leading slice with the shared guide. eps in squared guide units."""
    I = guide
    mean_I = box_filter(I, radius)
    var_I = box_filter(I * I, radius) - mean_I * mean_I
    mean_x = box_filter(x, radius)
    cov = box_filter(I[None] * x if x.ndim == 3 else I * x, radius) - mean_I * mean_x
    a = cov / (var_I + eps)
    b = mean_x - a * mean_I
    mean_a = box_filter(a, radius)
    mean_b = box_filter(b, radius)
    return mean_a * I + mean_b


def filter_cost_volume(
    guide: jnp.ndarray, volume: jnp.ndarray, radius: int = 8, eps: float = 1e-3
) -> jnp.ndarray:
    """Edge-aware aggregation of a (D, H, W) cost volume with the reference
    image as guide — the separable TPU analog of the reference's
    gammaC-weighted patch similarity."""
    return guided_filter(guide, volume, radius=radius, eps=eps)
