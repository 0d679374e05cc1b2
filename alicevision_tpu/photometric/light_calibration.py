"""Directional-light calibration from a mirror/glossy sphere.

Counterpart of the reference's lightingCalibration
(ref: src/aliceVision/lightingEstimation/lightingCalibration.cpp —
`brightestPoint` method: detect the specular highlight on a known sphere,
convert it to a surface normal, reflect the view direction). The highlight
search is a Gaussian-smoothed argmax — one separable convolution on the
device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..image.filtering import gaussian_blur


def sphere_normal_at(cx, cy, r, px, py):
    """Outward unit normal of the sphere at image point (px, py); the camera
    looks down +z, the sphere surface towards the camera has n_z < 0."""
    nx = (px - cx) / r
    ny = (py - cy) / r
    nz2 = max(0.0, 1.0 - nx * nx - ny * ny)
    return np.array([nx, ny, -np.sqrt(nz2)])


def calibrate_light_from_sphere(
    img: np.ndarray, cx: float, cy: float, r: float, blur_sigma: float = 2.0
) -> np.ndarray:
    """Unit light direction (pointing FROM the scene TOWARDS the light) from
    the brightest point on the sphere (lightingCalibration.cpp
    calibrateLightFromBrightestPoint)."""
    gray = img if img.ndim == 2 else img.mean(-1)
    sm = np.asarray(gaussian_blur(jnp.asarray(gray, jnp.float32), blur_sigma))
    H, W = sm.shape
    ys, xs = np.mgrid[0:H, 0:W]
    inside = (xs - cx) ** 2 + (ys - cy) ** 2 <= (0.95 * r) ** 2
    masked = np.where(inside, sm, -np.inf)
    iy, ix = np.unravel_index(np.argmax(masked), masked.shape)
    n = sphere_normal_at(cx, cy, r, float(ix), float(iy))
    # view direction from surface to camera is -z axis
    v = np.array([0.0, 0.0, -1.0])
    light = 2.0 * np.dot(n, v) * n - v
    return light / np.linalg.norm(light)


def calibrate_lights(images, spheres) -> np.ndarray:
    """Batch version: one light per image. spheres: (N, 3) of (cx, cy, r)
    or a single (3,) shared sphere."""
    spheres = np.asarray(spheres, float)
    if spheres.ndim == 1:
        spheres = np.tile(spheres, (len(images), 1))
    return np.stack(
        [
            calibrate_light_from_sphere(im, s[0], s[1], s[2])
            for im, s in zip(images, spheres)
        ]
    )
