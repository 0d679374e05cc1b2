"""Image masking helpers (HSV / threshold).

TPU-native counterpart of the reference's imageMasking module
(ref: src/aliceVision/imageMasking/imageMasking.cpp — HSV range masks used
by main_imageMasking.cpp). Pure elementwise math on (H, W, 3) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff < 1e-9, 1e-9, diff)
    h = jnp.where(
        mx == r,
        (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(diff < 1e-9, 0.0, h) / 6.0
    s = jnp.where(mx < 1e-9, 0.0, diff / jnp.where(mx < 1e-9, 1e-9, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_mask(
    rgb: jnp.ndarray,
    h_range=(0.0, 1.0),
    s_range=(0.0, 1.0),
    v_range=(0.0, 1.0),
    invert: bool = False,
) -> jnp.ndarray:
    """Boolean mask of pixels inside the HSV box. Hue wraps around."""
    hsv = rgb_to_hsv(rgb)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h0, h1 = h_range
    if h0 <= h1:
        h_ok = (h >= h0) & (h <= h1)
    else:  # wrap-around range (e.g. reds)
        h_ok = (h >= h0) | (h <= h1)
    m = (
        h_ok
        & (s >= s_range[0])
        & (s <= s_range[1])
        & (v >= v_range[0])
        & (v <= v_range[1])
    )
    return ~m if invert else m


def threshold_mask(gray: jnp.ndarray, lo: float = 0.05, hi: float = 0.95) -> jnp.ndarray:
    return (gray >= lo) & (gray <= hi)
