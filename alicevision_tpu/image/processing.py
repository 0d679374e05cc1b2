"""Image processing operations (the imageProcessing utility stage).

Counterpart of the reference's image-processing tool
(ref: src/software/utils/main_imageProcessing.cpp — resize, contrast,
sharpening, noise reduction, fill holes) and split360
(src/software/utils/main_split360Images.cpp — equirect to pinhole crops).
All filters are jit-able jnp math.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .filtering import bilinear_sample, gaussian_blur


def resize(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    import jax

    H, W = img.shape[:2]
    out = (int(round(H * scale)), int(round(W * scale))) + img.shape[2:]
    return jax.image.resize(img, out, method="linear")


def sharpen(img: jnp.ndarray, amount: float = 1.0, sigma: float = 1.0) -> jnp.ndarray:
    """Unsharp masking."""
    blur = gaussian_blur(img, sigma)
    return jnp.clip(img + amount * (img - blur), 0.0, 1.0)


def adjust_contrast(img: jnp.ndarray, factor: float = 1.2, pivot: float = 0.5) -> jnp.ndarray:
    return jnp.clip((img - pivot) * factor + pivot, 0.0, 1.0)


def bilateral_denoise(
    img: jnp.ndarray, sigma_spatial: float = 2.0, sigma_range: float = 0.1, radius: int = 3
) -> jnp.ndarray:
    """Edge-preserving denoise via an explicit shifted-window bilateral
    filter (batched shifts — no data-dependent loops)."""
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sh = jnp.roll(jnp.roll(img, dy, 0), dx, 1)
            w_s = np.exp(-(dy * dy + dx * dx) / (2 * sigma_spatial**2))
            w_r = jnp.exp(-((sh - img) ** 2) / (2 * sigma_range**2))
            w = w_s * w_r
            num = num + w * sh
            den = den + w
    return num / jnp.maximum(den, 1e-9)


def fill_holes(img: jnp.ndarray, mask: jnp.ndarray, iterations: int = 50) -> jnp.ndarray:
    """Diffusion inpainting of masked-out pixels (fillHoles option)."""
    out = jnp.where(mask, img, 0.0)
    known = mask.astype(img.dtype)
    w = known
    for _ in range(iterations):
        num = (
            jnp.roll(out, 1, 0) * jnp.roll(w, 1, 0)
            + jnp.roll(out, -1, 0) * jnp.roll(w, -1, 0)
            + jnp.roll(out, 1, 1) * jnp.roll(w, 1, 1)
            + jnp.roll(out, -1, 1) * jnp.roll(w, -1, 1)
        )
        den = (
            jnp.roll(w, 1, 0) + jnp.roll(w, -1, 0) + jnp.roll(w, 1, 1) + jnp.roll(w, -1, 1)
        )
        fill = num / jnp.maximum(den, 1e-9)
        newly = (den > 0) & ~(w > 0)
        out = jnp.where(mask, img, jnp.where(newly | (w > 0), jnp.where(w > 0, out, fill), out))
        w = jnp.maximum(w, newly.astype(img.dtype))
    return out


def split_equirect(
    pano: jnp.ndarray,  # (H, W) or (H, W, C)
    n_splits: int = 8,
    fov_deg: float = 90.0,
    out_size: int = 512,
    pitch_deg: float = 0.0,
):
    """Equirect panorama -> N pinhole crops around the horizon
    (main_split360Images equirectangular mode). Returns (imgs (N, s, s[,C]),
    K (3,3), R (N, 3, 3) world->cam rotations)."""
    import jax

    from ..geometry.rotations import so3_exp
    from ..panorama.warping import direction_to_equirect

    H, W = pano.shape[:2]
    f = out_size / (2.0 * np.tan(np.radians(fov_deg) / 2.0))
    K = jnp.asarray(
        [[f, 0, out_size / 2], [0, f, out_size / 2], [0, 0, 1.0]], jnp.float32
    )
    ys = jnp.arange(out_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
    d_cam = jnp.stack(
        [(gx - out_size / 2) / f, (gy - out_size / 2) / f, jnp.ones_like(gx)], -1
    )
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)

    imgs, Rs = [], []
    pitch = np.radians(pitch_deg)
    for i in range(n_splits):
        yaw = 2 * np.pi * i / n_splits
        R = np.asarray(
            so3_exp(jnp.asarray([pitch, 0.0, 0.0]))
            @ so3_exp(jnp.asarray([0.0, yaw, 0.0]))
        )
        d_world = jnp.einsum("ji,hwj->hwi", jnp.asarray(R, jnp.float32), d_cam)
        uv = direction_to_equirect(d_world, (W, H))
        if pano.ndim == 2:
            img = bilinear_sample(pano, uv)
        else:
            img = jnp.stack(
                [bilinear_sample(pano[..., c], uv) for c in range(pano.shape[-1])], -1
            )
        imgs.append(img)
        Rs.append(R)
    return jnp.stack(imgs), K, np.stack(Rs)


# ---------------------------------------------------------------------------
# Lens correction profiles (LCP) and DNG camera profiles (DCP) applied to
# images — the reference parses these in lensCorrectionProfile/ and image/dcp
# and applies them in main_imageProcessing.cpp (lensCorrection options).
# ---------------------------------------------------------------------------


def apply_lcp_geometry(img: jnp.ndarray, alt) -> jnp.ndarray:
    """Undistort an image with an LCP rectilinear model: each undistorted
    output pixel samples the source at the FORWARD-distorted position
    r_d = r_u (1 + k1 r^2 + k2 r^4 + k3 r^6) (inverse warp, no iteration).
    Conventions match the reference's undistortRectilinearGeometryLCP
    (main_imageProcessing.cpp:460-497): principal point = center fractions
    of W/H, focal = fraction of max(W, H). Works on (H, W) or (H, W, C)."""
    chans = img.ndim == 3
    im = jnp.moveaxis(img, -1, 0) if chans else img[None]
    H, W = im.shape[-2:]
    dmax = float(max(H, W))
    pp_x, pp_y = alt.cx * W, alt.cy * H
    sc_x = max(alt.focal_x, 1e-9) * dmax
    sc_y = max(alt.focal_y, 1e-9) * dmax
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    u = (gx - pp_x) / sc_x
    v = (gy - pp_y) / sc_y
    r2 = u * u + v * v
    k1, k2, k3 = alt.radial
    scale = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy = jnp.stack([u * scale * sc_x + pp_x, v * scale * sc_y + pp_y], -1)
    out = jnp.stack([bilinear_sample(c, xy) for c in im])
    return jnp.moveaxis(out, 0, -1) if chans else out[0]


def apply_lcp_vignette(img: jnp.ndarray, alt) -> jnp.ndarray:
    """Devignette with the Adobe model g(r) = 1 + v1 r^2 + v2 r^4 + v3 r^6
    inverted as a 4th-order power series and MULTIPLIED in — the exact
    scheme of the reference's undistortVignetting
    (main_imageProcessing.cpp:427-458), including its width/height
    normalization of r."""
    vg = getattr(alt, "vignette", ())
    if not vg:
        return img
    v1, v2, v3 = (list(vg) + [0.0, 0.0])[:3]
    p1 = -v1
    p2 = v1 * v1 - v2
    p3 = -(v1**3 - 2 * v1 * v2 + v3)
    p4 = v1**4 + v2 * v2 + 2 * v1 * v3 - 3 * v1 * v1 * v2
    H, W = img.shape[:2]
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    u = (gx / W - alt.cx) / max(alt.focal_x, 1e-9)
    v = (gy / H - alt.cy) / max(alt.focal_y, 1e-9)
    r2 = u * u + v * v
    gain = 1.0 + r2 * (p1 + r2 * (p2 + r2 * (p3 + r2 * p4)))
    return img * (gain[..., None] if img.ndim == 3 else gain)
