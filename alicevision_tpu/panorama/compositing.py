"""Panorama compositing: distance seams + multi-band Laplacian blending.

TPU-native counterpart of the reference's compositing stack
(ref: src/aliceVision/panorama/seams.cpp + distance.cpp — distance
feathering, laplacianPyramid.cpp + laplacianCompositer.hpp — multi-band
blending, graphcut.hpp — graph-cut seams). The graph-cut seam optimizer is
replaced by softmax-of-distance weighting feeding the multi-band blender —
the blender hides the seams the cut would have optimized; a cut-based
refinement can be layered on later without touching the blender.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..image.filtering import downsample2, gaussian_blur, upsample2


def distance_weights(masks: jnp.ndarray, sharpness: float = 0.05) -> jnp.ndarray:
    """Per-view blending weights from distance-to-border of each valid mask.

    masks: (V, H, W) bool. Returns (V, H, W) weights summing to 1 where any
    view covers the pixel. Chamfer-style distance via iterated blurs keeps
    everything on-device (exact EDT is host-bound and unnecessary here).
    """
    m = masks.astype(jnp.float32)
    # smooth interior score: repeated blur of the mask approximates distance
    d = m
    for _ in range(4):
        d = gaussian_blur(d, 2.0) * m
    d = d + 1e-6 * m
    w = d / jnp.sum(d, axis=0, keepdims=True).clip(1e-6)
    return w


def _build_laplacian(img: jnp.ndarray, levels: int):
    pyr = []
    cur = img
    for _ in range(levels - 1):
        low = gaussian_blur(cur, 1.0)
        down = downsample2(low)
        up = upsample2(down)[..., : cur.shape[-2], : cur.shape[-1]]
        pyr.append(cur - up)
        cur = down
    pyr.append(cur)
    return pyr


def laplacian_blend(
    images: jnp.ndarray,  # (V, H, W) single channel
    weights: jnp.ndarray,  # (V, H, W) normalized
    levels: int = 5,
) -> jnp.ndarray:
    """Classic multi-band blending: per-level weighted sum of Laplacians with
    progressively blurred weights (laplacianCompositer.hpp)."""
    lap = [_build_laplacian(images[v], levels) for v in range(images.shape[0])]
    wpyr = []
    for v in range(images.shape[0]):
        cur = weights[v]
        levels_w = [cur]
        for _ in range(levels - 1):
            cur = downsample2(gaussian_blur(cur, 1.0))
            levels_w.append(cur)
        wpyr.append(levels_w)

    blended = []
    for l in range(levels):
        num = sum(lap[v][l] * wpyr[v][l] for v in range(images.shape[0]))
        den = sum(wpyr[v][l] for v in range(images.shape[0]))
        blended.append(num / den.clip(1e-6))

    out = blended[-1]
    for l in range(levels - 2, -1, -1):
        out = upsample2(out)[..., : blended[l].shape[-2], : blended[l].shape[-1]]
        out = out + blended[l]
    return out


def composite_panorama(
    warped: jnp.ndarray,  # (V, H, W) warped views on the pano canvas
    masks: jnp.ndarray,  # (V, H, W) validity
    levels: int = 5,
) -> jnp.ndarray:
    """Seam weights + multi-band blend -> final panorama (H, W)."""
    w = distance_weights(masks)
    pano = laplacian_blend(warped, w, levels=levels)
    covered = jnp.any(masks, axis=0)
    return jnp.where(covered, pano, 0.0)


def seam_labels(masks: jnp.ndarray, sharpness: float = 0.05) -> jnp.ndarray:
    """Hard seam assignment: per-pixel winning view by distance weight
    (ref: panorama/seams.cpp WTA labels; the reference optionally refines
    with a graph-cut — the distance transform already places seams mid-
    overlap, which is what the cut converges to without strong gradients).
    Returns (H, W) int32, -1 where no view covers the pixel."""
    w = distance_weights(masks, sharpness)
    lab = jnp.argmax(w, axis=0).astype(jnp.int32)
    covered = jnp.any(masks, axis=0)
    return jnp.where(covered, lab, -1)


def composite_with_labels(
    warped: jnp.ndarray,  # (V, H, W)
    labels: jnp.ndarray,  # (H, W) int32 from seam_labels
    masks: jnp.ndarray,  # (V, H, W)
    levels: int = 5,
) -> jnp.ndarray:
    """Multi-band blend with hard seam labels as the level-0 weights
    (laplacianCompositer.hpp with graph-cut seams)."""
    V = warped.shape[0]
    onehot = (labels[None] == jnp.arange(V)[:, None, None]).astype(jnp.float32)
    pano = laplacian_blend(warped, onehot, levels=levels)
    covered = jnp.any(masks, axis=0)
    return jnp.where(covered, pano, 0.0)


def fill_holes(img: jnp.ndarray, mask: jnp.ndarray, iters: int = 50) -> jnp.ndarray:
    """Diffusion inpainting of uncovered pixels (panoramaPostProcessing's
    fillHoles): repeated blur, with known pixels clamped each step."""
    out = jnp.where(mask, img, 0.0)
    m = mask.astype(jnp.float32)
    w = m
    for _ in range(iters):
        out_b = gaussian_blur(out, 2.0)
        w_b = gaussian_blur(w, 2.0)
        cand = out_b / w_b.clip(1e-6)
        out = jnp.where(mask, img, cand)
        w = jnp.clip(w_b * 4.0, 0.0, 1.0)
    return out


def crop_to_content(img, mask):
    """Tight bbox of covered pixels -> (img, mask, (y0, y1, x0, x1))."""
    import numpy as np

    m = np.asarray(mask)
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return img, mask, (0, m.shape[0], 0, m.shape[1])
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    return img[..., y0:y1, x0:x1], mask[y0:y1, x0:x1], (y0, y1, x0, x1)
