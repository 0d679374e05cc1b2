"""Distortion calibration from line straightness.

TPU-native counterpart of the reference's line-based distortion estimation
(ref: src/aliceVision/calibration/distortionEstimationLine.cpp — used by
the 3DE/nodal distortion workflows: straight scene lines must undistort to
straight image lines). Given tracked line points (e.g. checkerboard rows or
user-marked lines), Gauss-Newton minimizes the point-to-fitted-line
residual of the *undistorted* points over the radial coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import camera as cam


def _line_residuals(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal distances of (G, N, 2) point groups to their best-fit
    lines, masked. The best-fit line per group comes from the covariance
    eigenvector, differentiable end-to-end."""
    w = mask.astype(pts.dtype)[..., None]
    cnt = jnp.sum(w, axis=1).clip(1.0)
    mean = jnp.sum(pts * w, axis=1, keepdims=True) / cnt[:, None]
    d = (pts - mean) * w
    cov = jnp.einsum("gni,gnj->gij", d, d)
    # Normal = eigenvector of the smaller eigenvalue of the 2x2 covariance.
    # The half-angle form is cancellation-free in f32 (the lam - c route
    # loses ~5 digits when the variances differ by orders of magnitude).
    a, b, c = cov[:, 0, 0], cov[:, 0, 1], cov[:, 1, 1]
    theta = 0.5 * jnp.arctan2(2.0 * b, a - c)  # major-axis direction
    n = jnp.stack([-jnp.sin(theta), jnp.cos(theta)], -1)  # minor axis
    res = jnp.einsum("gni,gi->gn", pts - mean, n)
    return res * mask.astype(pts.dtype)


def calibrate_distortion_from_lines(
    line_pts: jnp.ndarray,  # (G, N, 2) distorted pixel points per line
    mask: jnp.ndarray,  # (G, N) validity
    intr: cam.Intrinsics,  # initial intrinsics (focal/pp fixed here)
    n_params: int = 3,
    iters: int = 25,
):
    """Fit radial k1..k3 (RADIALK3 model) so undistorted lines are straight.

    Returns (disto (DISTO_PARAMS,), rms_before, rms_after).
    """

    def undistort(disto_vec, pts):
        row = intr._replace(
            disto_kind=jnp.asarray(cam.DISTO_RADIALK3, jnp.int32), disto=disto_vec
        )
        p = cam.ima2cam(row, pts)
        u = cam.remove_distortion(row.disto_kind, row.disto, p)
        return cam.cam2ima(row, u)

    def residuals(params):
        disto_vec = jnp.zeros((cam.DISTO_PARAMS,)).at[:n_params].set(params)
        und = undistort(disto_vec, line_pts)
        return _line_residuals(und, mask).reshape(-1)

    params = jnp.zeros((n_params,))
    r0 = residuals(params)
    rms_before = jnp.sqrt(jnp.mean(r0 * r0))

    def step(params, _):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)
        JtJ = J.T @ J + 1e-8 * jnp.eye(n_params)
        new = params - jnp.linalg.solve(JtJ, J.T @ r)
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r * r)
        return jnp.where(better, new, params), None

    params, _ = jax.lax.scan(step, params, None, length=iters)
    r1 = residuals(params)
    rms_after = jnp.sqrt(jnp.mean(r1 * r1))
    disto = jnp.zeros((cam.DISTO_PARAMS,)).at[:n_params].set(params)
    return disto, float(rms_before), float(rms_after)
