"""Video keyframe selection: sharpness + motion scoring.

TPU-native counterpart of the reference's keyframe module
(ref: src/aliceVision/keyframe/KeyframeSelector.hpp:66-98 regular mode,
:253-281 smart mode — Laplacian-variance sharpness + dense-optical-flow
displacement). The OpenCV dense flow is replaced by batched block matching
(integer displacement search as a stack of shifted-difference maps — pure
VPU work), which is what the displacement score actually needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sharpness_score(img: jnp.ndarray) -> jnp.ndarray:
    """Variance of the Laplacian (KeyframeSelector's sharpness measure)."""
    lap = (
        -4.0 * img
        + jnp.roll(img, 1, 0)
        + jnp.roll(img, -1, 0)
        + jnp.roll(img, 1, 1)
        + jnp.roll(img, -1, 1)
    )
    return jnp.var(lap)


def block_flow_displacement(
    a: jnp.ndarray, b: jnp.ndarray, block: int = 16, search: int = 4
) -> jnp.ndarray:
    """Mean per-block displacement magnitude between frames a and b.

    For each (2*search+1)^2 integer shift, compute blockwise SAD of the
    shifted pair; the per-block argmin shift approximates the flow. All
    shifts evaluated as one batched stack — no data-dependent loops.
    """
    H, W = a.shape
    Hc, Wc = (H // block) * block, (W // block) * block
    a = a[:Hc, :Wc]
    b = b[:Hc, :Wc]
    shifts = [(dy, dx) for dy in range(-search, search + 1) for dx in range(-search, search + 1)]
    sads = []
    for dy, dx in shifts:
        diff = jnp.abs(a - jnp.roll(jnp.roll(b, dy, 0), dx, 1))
        blocks = diff.reshape(Hc // block, block, Wc // block, block)
        sads.append(blocks.sum(axis=(1, 3)))
    sad = jnp.stack(sads)  # (S, nby, nbx)
    best = jnp.argmin(sad, axis=0)
    mags = jnp.asarray([np.hypot(dy, dx) for dy, dx in shifts])
    return jnp.mean(mags[best])


def select_keyframes_regular(n_frames: int, step: int) -> np.ndarray:
    """Fixed-stride selection (KeyframeSelector regular mode)."""
    return np.arange(0, n_frames, step)


def select_keyframes_smart(
    frames: list,
    min_gap: int = 5,
    max_gap: int = 60,
    motion_threshold: float = 1.0,
    sharp_window: int = 3,
) -> np.ndarray:
    """Smart selection: accumulate motion until threshold, then pick the
    sharpest frame in a small window (the reference's smart mode logic)."""
    selected = [0]
    acc = 0.0
    last = 0
    i = 1
    n = len(frames)
    sharp = [float(sharpness_score(jnp.asarray(f))) for f in frames]
    while i < n:
        acc += float(
            block_flow_displacement(jnp.asarray(frames[i - 1]), jnp.asarray(frames[i]))
        )
        gap = i - last
        if (acc >= motion_threshold and gap >= min_gap) or gap >= max_gap:
            lo = max(last + 1, i - sharp_window)
            hi = min(n, i + sharp_window + 1)
            best = lo + int(np.argmax(sharp[lo:hi]))
            selected.append(best)
            last = best
            acc = 0.0
        i += 1
    return np.array(sorted(set(selected)))
