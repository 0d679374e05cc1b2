"""Spherical (equirectangular) mapping and per-view warping.

TPU-native counterpart of the reference's panorama warping
(ref: src/aliceVision/panorama/sphericalMapping.cpp, warper.cpp,
remapBbox.cpp). The rotation-only camera model of the panorama pipeline
(ReconstructionEngine_panorama) maps pixels to unit directions; warping a
view into the equirect domain is one batched inverse map + bilinear sample.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def equirect_to_direction(uv: jnp.ndarray, pano_wh) -> jnp.ndarray:
    """Equirect pixel (..., 2) -> unit direction (..., 3).

    Convention: u in [0, W) -> longitude [-pi, pi), v in [0, H) -> latitude
    [-pi/2, pi/2]; +z is the forward axis at (lon=0, lat=0), +y down.
    """
    W, H = pano_wh
    lon = (uv[..., 0] / W - 0.5) * 2.0 * jnp.pi
    lat = (uv[..., 1] / H - 0.5) * jnp.pi
    cl = jnp.cos(lat)
    return jnp.stack(
        [cl * jnp.sin(lon), jnp.sin(lat), cl * jnp.cos(lon)], axis=-1
    )


def direction_to_equirect(d: jnp.ndarray, pano_wh) -> jnp.ndarray:
    W, H = pano_wh
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(_EPS)
    lon = jnp.arctan2(d[..., 0], d[..., 2])
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    u = (lon / (2.0 * jnp.pi) + 0.5) * W
    v = (lat / jnp.pi + 0.5) * H
    return jnp.stack([u, v], axis=-1)


def warp_to_equirect(
    img: jnp.ndarray,  # (H, W) or (H, W, C)
    K: jnp.ndarray,  # (3, 3)
    R: jnp.ndarray,  # (3, 3) world->camera rotation (rotation-only pose)
    pano_wh,
):
    """Warp one view into the full equirect canvas.

    Returns (warped (Hp, Wp[, C]), valid (Hp, Wp)). For each pano pixel:
    direction -> camera frame -> pinhole projection -> bilinear sample.
    """
    from ..image.filtering import bilinear_sample

    W, H = pano_wh
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    d_world = equirect_to_direction(jnp.stack([gx, gy], -1), pano_wh)
    d_cam = jnp.einsum("ij,hwj->hwi", R, d_world)
    z = d_cam[..., 2]
    in_front = z > 1e-6
    u = K[0, 0] * d_cam[..., 0] / jnp.where(in_front, z, 1.0) + K[0, 2]
    v = K[1, 1] * d_cam[..., 1] / jnp.where(in_front, z, 1.0) + K[1, 2]

    Hi, Wi = img.shape[:2]
    inside = in_front & (u >= 0) & (u <= Wi - 1) & (v >= 0) & (v <= Hi - 1)
    uv = jnp.stack([u, v], -1)
    if img.ndim == 2:
        out = bilinear_sample(img, uv)
    else:
        out = jnp.stack(
            [bilinear_sample(img[..., c], uv) for c in range(img.shape[-1])], -1
        )
    mask_shape = inside if img.ndim == 2 else inside[..., None]
    return jnp.where(mask_shape, out, 0.0), inside
