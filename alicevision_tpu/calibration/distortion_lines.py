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
import numpy as np

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


def calibrate_undistortion_from_lines(
    line_pts,  # (G, N, 2) distorted pixel points per line
    mask,  # (G, N) validity
    undist,  # camera.undistortion.Undistortion — initial state (model + size)
    free_idx=None,  # parameter indices to optimize (default: all of the model)
    iters: int = 40,
):
    """Fit an Undistortion-family model (3DE lens grids) so that undistorted
    lines are straight — the workflow of the reference's
    aliceVision_distortionCalibration with --undistortionModelName
    (ref: src/aliceVision/calibration/distortionEstimationLine.cpp +
    software/pipeline/main_distortionCalibration.cpp).

    Levenberg-Marquardt over the selected undistortion parameters with the
    same differentiable point-to-fitted-line residual as the distortion path.
    Returns (fitted Undistortion, rms_before, rms_after) in pixels.
    """
    from ..camera import undistortion as und

    kind = int(undist.kind)
    if free_idx is None:
        free_idx = list(range(und.N_UNDIST_PARAMS[kind]))
    free_idx = jnp.asarray(free_idx, jnp.int32)
    base = jnp.asarray(undist.params)

    diag = undist.half_diagonal()
    pa = 1.0 if undist.is_desqueezed else undist.pixel_aspect_ratio
    center = 0.5 * jnp.asarray(undist.size) + jnp.asarray(undist.offset)
    norm = jnp.array([diag, pa * diag])
    pts_n = (jnp.asarray(line_pts) - center) / norm

    def residuals(theta):
        p = base.at[free_idx].set(theta)
        u = und.undistort_normalized(kind, p, undist.pixel_aspect_ratio, pts_n)
        u_pix = u * norm + center
        return _line_residuals(u_pix, jnp.asarray(mask)).reshape(-1)

    theta = base[free_idx]
    r0 = residuals(theta)
    rms_before = jnp.sqrt(jnp.mean(r0 * r0))
    n = theta.shape[0]

    def step(carry, _):
        theta, lam = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        JtJ = J.T @ J
        new = theta - jnp.linalg.solve(JtJ + lam * jnp.eye(n), J.T @ r)
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r * r)
        theta = jnp.where(better, new, theta)
        lam = jnp.where(better, lam * 0.5, lam * 4.0).clip(1e-10, 1e6)
        return (theta, lam), None

    (theta, _), _ = jax.lax.scan(step, (theta, jnp.array(1e-4)), None, length=iters)
    r1 = residuals(theta)
    rms_after = jnp.sqrt(jnp.mean(r1 * r1))
    fitted = undist._replace(params=np.asarray(base.at[free_idx].set(theta)))
    return fitted, float(rms_before), float(rms_after)
