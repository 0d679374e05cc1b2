"""Photometric stereo + normal integration.

TPU-native counterpart of the reference's photometricStereo module
(ref: src/aliceVision/photometricStereo/photometricStereo.cpp calibrated
solve, normalIntegration.cpp DCT/Poisson integration). The per-pixel
normal/albedo least squares is one batched 3xL solve over the whole image;
the Poisson integration is the classic DCT solver on jnp.fft.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def photometric_stereo(
    images: jnp.ndarray,  # (L, H, W) intensities under L known lights
    light_dirs: jnp.ndarray,  # (L, 3) unit directions (toward the light)
    light_intensities: jnp.ndarray | None = None,  # (L,)
    mask: jnp.ndarray | None = None,  # (H, W)
):
    """Calibrated PS: I = rho * max(0, n . l). Returns (normals (H,W,3),
    albedo (H,W)). Solved in closed form via the 3x3 normal equations per
    pixel (batched)."""
    L, H, W = images.shape
    if light_intensities is not None:
        images = images / light_intensities[:, None, None].clip(1e-6)
    Ld = light_dirs  # (L, 3)
    # G = argmin ||L G - I||: G = (L^T L)^-1 L^T I, per pixel
    LtL = Ld.T @ Ld  # (3, 3)
    LtI = jnp.einsum("li,lhw->ihw", Ld, images)  # (3, H, W)
    G = jnp.einsum("ij,jhw->ihw", jnp.linalg.inv(LtL + 1e-9 * jnp.eye(3)), LtI)
    G = jnp.moveaxis(G, 0, -1)  # (H, W, 3)
    albedo = jnp.linalg.norm(G, axis=-1)
    normals = G / albedo[..., None].clip(1e-9)
    if mask is not None:
        normals = jnp.where(mask[..., None], normals, 0.0)
        albedo = jnp.where(mask, albedo, 0.0)
    return normals, albedo


def normal_integration_dct(normals: jnp.ndarray, cg_iters: int = 400) -> jnp.ndarray:
    """Depth from normals by least-squares gradient integration
    (normalIntegration.cpp's Poisson path).

    Minimizes ||grad z - (p, q)||^2 with forward-difference operators and
    solves the normal equations with matrix-free conjugate gradients — the
    boundary flux of a non-periodic field (e.g. a pure ramp) is captured
    exactly, unlike the homogeneous-Neumann cosine-transform shortcut.
    """
    nz = jnp.where(jnp.abs(normals[..., 2]) < 1e-6, 1e-6, normals[..., 2])
    p = -normals[..., 0] / nz
    q = -normals[..., 1] / nz
    H, W = p.shape

    def gx(z):  # forward difference, zero on the last column
        return (jnp.roll(z, -1, 1) - z).at[:, -1].set(0.0)

    def gy(z):
        return (jnp.roll(z, -1, 0) - z).at[-1, :].set(0.0)

    def gxT(r):  # adjoint of gx
        r = r.at[:, -1].set(0.0)
        return jnp.roll(r, 1, 1).at[:, 0].set(0.0) - r

    def gyT(r):
        r = r.at[-1, :].set(0.0)
        return jnp.roll(r, 1, 0).at[0, :].set(0.0) - r

    def A(z):
        # + tiny Tikhonov pins the free constant (gauge) for CG
        return gxT(gx(z)) + gyT(gy(z)) + 1e-6 * z

    b = gxT(p.at[:, -1].set(0.0)) + gyT(q.at[-1, :].set(0.0))
    z, _ = jax.scipy.sparse.linalg.cg(A, b, maxiter=cg_iters, tol=1e-8)
    return z - jnp.mean(z)
