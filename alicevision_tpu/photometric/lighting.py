"""Spherical-harmonic lighting estimation.

TPU-native counterpart of the reference's lightingEstimation module
(ref: src/aliceVision/lightingEstimation/augmentedNormals.cpp — order-2 SH
basis from normals, lightingEstimation.cpp — per-channel least squares).
One batched 9-coefficient LS over all masked pixels.
"""

from __future__ import annotations

import jax.numpy as jnp


def augmented_normals(normals: jnp.ndarray) -> jnp.ndarray:
    """Order-2 SH basis evaluated at normals (..., 3) -> (..., 9)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    one = jnp.ones_like(nx)
    return jnp.stack(
        [
            one,
            nx,
            ny,
            nz,
            nx * ny,
            nx * nz,
            ny * nz,
            nx * nx - ny * ny,
            3.0 * nz * nz - 1.0,
        ],
        axis=-1,
    )


def estimate_sh_lighting(
    image: jnp.ndarray,  # (H, W) or (H, W, C) shading image
    normals: jnp.ndarray,  # (H, W, 3)
    albedo: jnp.ndarray | None = None,  # (H, W)
    mask: jnp.ndarray | None = None,  # (H, W)
) -> jnp.ndarray:
    """Least-squares SH coefficients (9,) or (9, C):
    I = albedo * (B(n) @ L)."""
    B = augmented_normals(normals).reshape(-1, 9)
    I = image.reshape(len(B), -1)
    if albedo is not None:
        B = B * albedo.reshape(-1, 1)
    w = (
        mask.reshape(-1, 1).astype(B.dtype)
        if mask is not None
        else jnp.ones((len(B), 1), B.dtype)
    )
    Bw = B * w
    BtB = Bw.T @ B + 1e-6 * jnp.eye(9)
    BtI = Bw.T @ I
    return jnp.linalg.solve(BtB, BtI).squeeze()


def render_sh(normals: jnp.ndarray, L: jnp.ndarray, albedo=None) -> jnp.ndarray:
    """Shade normals with SH coefficients (inverse of the estimator)."""
    s = augmented_normals(normals) @ L
    if albedo is not None:
        s = s * albedo
    return s
