"""Camera localization against a reconstructed scene.

TPU-native counterpart of the reference's localization module
(ref: src/aliceVision/localization/VoctreeLocalizer.hpp:34-153 — retrieval
+ feature matching + resection; sfm/pipeline/localization/SfMLocalizer.hpp
— P3P ACRANSAC + pose refine). The landmark "descriptor index" is the mean
descriptor of each track's observations; query matching is one MXU matmul;
the pose comes from the batched robust P3P + Gauss-Newton refit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import robust
from ..matching.descriptor_matching import match_bruteforce


class LocalizationResult(NamedTuple):
    R: np.ndarray  # (3, 3) world->cam
    c: np.ndarray  # (3,) camera center
    n_inliers: int
    success: bool


def build_landmark_index(
    points: np.ndarray,  # (L, 3)
    obs_landmark: np.ndarray,  # (O,)
    obs_desc: np.ndarray,  # (O, D) descriptor of each observation
) -> tuple[np.ndarray, np.ndarray]:
    """Mean descriptor per landmark -> (desc (L, D), points (L, 3))."""
    L = len(points)
    D = obs_desc.shape[1]
    acc = np.zeros((L, D), np.float64)
    cnt = np.zeros(L)
    np.add.at(acc, obs_landmark, obs_desc)
    np.add.at(cnt, obs_landmark, 1.0)
    desc = acc / np.maximum(cnt, 1)[:, None]
    norm = np.linalg.norm(desc, axis=-1, keepdims=True)
    return (desc / np.maximum(norm, 1e-12)).astype(np.float32), points


def match_2d3d(
    landmark_desc: np.ndarray,  # (L, D)
    landmark_pts: np.ndarray,  # (L, 3)
    query_desc: np.ndarray,  # (N, D)
    query_norm: np.ndarray,  # (N, 2) undistorted normalized coords
    ratio: float = 0.85,
) -> tuple[np.ndarray, np.ndarray]:
    """Descriptor-matched (world (M, 3), obs (M, 2)) correspondences —
    the matching half of SfMLocalizer::Localize, exposed so the rig path
    can resect all cameras JOINTLY (rigResection.cpp)."""
    if len(query_desc) == 0:
        return np.zeros((0, 3)), np.zeros((0, 2))
    m = match_bruteforce(
        jnp.asarray(query_desc),
        jnp.asarray(landmark_desc),
        jnp.ones(len(query_desc), bool),
        jnp.ones(len(landmark_desc), bool),
        ratio=ratio,
        cross_check=False,
    )
    idx2 = np.asarray(m.idx2)
    sel = np.nonzero(idx2 >= 0)[0]
    return landmark_pts[idx2[sel]], np.asarray(query_norm)[sel]


def localize_image(
    key: jax.Array,
    landmark_desc: np.ndarray,  # (L, D)
    landmark_pts: np.ndarray,  # (L, 3)
    query_desc: np.ndarray,  # (N, D)
    query_norm: np.ndarray,  # (N, 2) undistorted normalized coords
    focal_px: float,
    im_size: tuple[float, float],
    ratio: float = 0.85,
    min_inliers: int = 12,
    n_hyps: int = 256,
) -> LocalizationResult:
    """2D-3D matching + robust P3P resection (SfMLocalizer::Localize)."""
    world, obs = match_2d3d(
        landmark_desc, landmark_pts, query_desc, query_norm, ratio
    )
    if len(world) < min_inliers:
        return LocalizationResult(np.eye(3), np.zeros(3), 0, False)
    n = len(world)
    cap = 1 << int(np.ceil(np.log2(max(n, 32))))
    world_p = np.pad(world, ((0, cap - n), (0, 0)))
    obs_p = np.pad(obs, ((0, cap - n), (0, 0)))
    valid = np.zeros(cap, bool)
    valid[:n] = True

    rp = robust.robust_resection_p3p(
        key,
        jnp.asarray(world_p, jnp.float32),
        jnp.asarray(obs_p, jnp.float32),
        focal_px,
        im_size,
        valid=jnp.asarray(valid),
        n_hyps=n_hyps,
    )
    ni = int(rp.n_inliers)
    if ni < min_inliers:
        return LocalizationResult(np.eye(3), np.zeros(3), ni, False)
    R = np.asarray(rp.R)
    return LocalizationResult(R, -R.T @ np.asarray(rp.t), ni, True)
