"""Distortion model conversion and undistortion-map export.

Counterparts of the reference's distortion tooling
(ref: src/software/convert/main_convertDistortion.cpp — refit one
distortion model with another by sampling the image domain;
src/software/export/main_exportDistortion.cpp — write undistortion STMaps
and Nuke node scripts).

The refit is a batched Gauss-Newton on a dense grid of normalized points —
every sample evaluates in one vmapped `add_distortion` call, the normal
equations are a single (P, K) matmul pair on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import models as m


def _sample_grid(intr_row, n: int = 24) -> jnp.ndarray:
    """Normalized-plane samples covering the image domain."""
    w, h = float(intr_row.size[0]), float(intr_row.size[1])
    xs = jnp.linspace(0.0, w, n)
    ys = jnp.linspace(0.0, h, n)
    pix = jnp.stack(jnp.meshgrid(xs, ys), -1).reshape(-1, 2)
    return m.ima2cam(intr_row, pix)


def fit_distortion(
    intr_row, target_kind: int, iters: int = 20, n_grid: int = 24
) -> np.ndarray:
    """Fit `target_kind` distortion parameters reproducing the source
    intrinsic's distortion field over the image domain. Returns the new
    parameter row (DISTO_PARAMS,)."""
    # undistorted normalized grid -> distorted by the SOURCE model
    p_und = _sample_grid(intr_row, n_grid)
    p_und = m.remove_distortion(intr_row.disto_kind, intr_row.disto, p_und)
    target = m.add_distortion(intr_row.disto_kind, intr_row.disto, p_und)

    kind = jnp.asarray(target_kind)

    def residuals(params):
        pred = m.add_distortion(kind, params, p_und)
        return (pred - target).reshape(-1)

    params = jnp.zeros(m.DISTO_PARAMS)
    J_fn = jax.jacfwd(residuals)
    n_active = {
        m.DISTO_RADIALK1: 1,
        m.DISTO_RADIALK3: 3,
        m.DISTO_BROWN: 5,
        m.DISTO_FISHEYE: 4,
        m.DISTO_FISHEYE1: 1,
        m.DISTO_NONE: 0,
    }.get(int(target_kind), m.DISTO_PARAMS)
    if n_active == 0:
        return np.zeros(m.DISTO_PARAMS)
    mask = jnp.arange(m.DISTO_PARAMS) < n_active

    for _ in range(iters):
        r = residuals(params)
        J = J_fn(params) * mask[None, :]
        JtJ = J.T @ J + 1e-9 * jnp.eye(m.DISTO_PARAMS)
        step = jnp.linalg.solve(JtJ, J.T @ r)
        params = params - step * mask
    return np.asarray(params)


def convert_intrinsic_distortion(scene, intrinsic_idx: int, target_kind: int):
    """In-place conversion of one intrinsic's distortion model."""
    import jax.tree_util as jtu

    intr = scene.intrinsics_table(np.float64)
    row = jtu.tree_map(lambda a: a[intrinsic_idx], intr)
    params = fit_distortion(row, target_kind)
    scene.disto_kind[intrinsic_idx] = np.int32(target_kind)
    scene.disto[intrinsic_idx] = params
    return params


def undistort_stmap(intr_row, hw=None) -> np.ndarray:
    """(H, W, 2) STMap: for each output (undistorted) pixel, the normalized
    [0,1]^2 source coordinate in the distorted image
    (ref: main_exportDistortion.cpp `--exportSTMaps`)."""
    if hw is None:
        hw = (int(intr_row.size[1]), int(intr_row.size[0]))
    H, W = hw
    ys, xs = jnp.mgrid[0:H, 0:W]
    pix = jnp.stack([xs + 0.5, ys + 0.5], -1).astype(jnp.float64)
    p = m.ima2cam(intr_row, pix)
    p_dist = m.add_distortion(intr_row.disto_kind, intr_row.disto, p)
    src = m.cam2ima(intr_row, p_dist)
    wh = jnp.asarray([W, H], jnp.float64)
    stmap = src / wh
    # STMap convention: t axis bottom-up
    stmap = stmap.at[..., 1].set(1.0 - stmap[..., 1])
    return np.asarray(stmap, np.float32)


def distort_stmap(intr_row, hw=None) -> np.ndarray:
    """Inverse map: for each distorted pixel, the undistorted source."""
    if hw is None:
        hw = (int(intr_row.size[1]), int(intr_row.size[0]))
    H, W = hw
    ys, xs = jnp.mgrid[0:H, 0:W]
    pix = jnp.stack([xs + 0.5, ys + 0.5], -1).astype(jnp.float64)
    p = m.ima2cam(intr_row, pix)
    p_und = m.remove_distortion(intr_row.disto_kind, intr_row.disto, p)
    src = m.cam2ima(intr_row, p_und)
    wh = jnp.asarray([W, H], jnp.float64)
    stmap = src / wh
    stmap = stmap.at[..., 1].set(1.0 - stmap[..., 1])
    return np.asarray(stmap, np.float32)
