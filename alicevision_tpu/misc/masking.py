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


def otsu_threshold(gray: jnp.ndarray, n_bins: int = 256) -> jnp.ndarray:
    """Otsu's between-class-variance-maximizing threshold (scalar).

    Counterpart of the reference's autoGrayscaleThreshold
    (ref: src/aliceVision/imageMasking/imageMasking.hpp:46) — a histogram
    reduction plus an argmax over candidate thresholds, fully on-device.
    """
    g = jnp.clip(gray, 0.0, 1.0).reshape(-1)
    hist = jnp.zeros(n_bins).at[
        jnp.clip((g * n_bins).astype(jnp.int32), 0, n_bins - 1)
    ].add(1.0)
    p = hist / jnp.maximum(hist.sum(), 1.0)
    centers = (jnp.arange(n_bins) + 0.5) / n_bins
    w0 = jnp.cumsum(p)
    mu = jnp.cumsum(p * centers)
    mu_t = mu[-1]
    w1 = 1.0 - w0
    safe = jnp.maximum(w0 * w1, 1e-12)
    between = (mu_t * w0 - mu) ** 2 / safe
    k = jnp.argmax(between)
    return centers[k]


def auto_threshold_mask(gray: jnp.ndarray) -> jnp.ndarray:
    """Foreground = pixels above the Otsu threshold."""
    return gray >= otsu_threshold(gray)


def _morph(mask: jnp.ndarray, iterations: int, maximum: bool) -> jnp.ndarray:
    """3x3 binary dilation/erosion via reduce_window (iterated)."""
    import jax.lax as lax

    x = mask.astype(jnp.float32)
    op = lax.max if maximum else lax.min
    init = -jnp.inf if maximum else jnp.inf
    for _ in range(max(0, iterations)):
        x = lax.reduce_window(
            x, init, op, (3, 3), (1, 1), "SAME"
        )
    return x > 0.5


def dilate(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Grow the selected area (ref imageMasking.hpp:66 postprocess_dilate;
    the CLI's growRadius)."""
    return _morph(mask, iterations, maximum=True)


def erode(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Shrink the selected area (ref imageMasking.hpp:73 postprocess_erode;
    the CLI's shrinkRadius)."""
    return _morph(mask, iterations, maximum=False)


def closing(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Dilate then erode — fills holes up to ~iterations px
    (ref imageMasking.hpp:59 postprocess_closing)."""
    return erode(dilate(mask, iterations), iterations)
