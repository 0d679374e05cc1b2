"""Depth-map filtering + dense point-cloud fusion.

TPU-native counterpart of the reference's fusion front half
(ref: src/aliceVision/fuseCut/Fuser.hpp:21-34 cross-view consistency
filtering used by main_depthMapFiltering.cpp:142-144, and
fuseCut/PointCloud.hpp:44 createDensePointCloud used by
main_meshing.cpp:400-401). Consistency checks are batched projections of
whole depth maps into neighbour views; the voxel-grid simplification runs
host-side on the fused cloud.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6


def backproject_depth_map(depth: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, c: jnp.ndarray):
    """Depth map (H, W) -> world points (H, W, 3). R, c: world->cam pose."""
    H, W = depth.shape
    ys = jnp.arange(H, dtype=depth.dtype)
    xs = jnp.arange(W, dtype=depth.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    x_cam = jnp.stack(
        [
            (gx - K[0, 2]) / K[0, 0] * depth,
            (gy - K[1, 2]) / K[1, 1] * depth,
            depth,
        ],
        axis=-1,
    )
    return jnp.einsum("ji,hwj->hwi", R, x_cam) + c  # R^T x + c


def project_points(X: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, c: jnp.ndarray):
    """World points (..., 3) -> (pixel (..., 2), depth (...,))."""
    x_cam = jnp.einsum("ij,...j->...i", R, X - c)
    z = x_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = K[0, 0] * x_cam[..., 0] / zs + K[0, 2]
    v = K[1, 1] * x_cam[..., 1] / zs + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def _sample_nearest(img: jnp.ndarray, uv: jnp.ndarray, fill: float):
    H, W = img.shape
    x = jnp.round(uv[..., 0]).astype(jnp.int32)
    y = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    lin = jnp.clip(y, 0, H - 1) * W + jnp.clip(x, 0, W - 1)
    v = jnp.take(img.reshape(-1), lin.reshape(-1)).reshape(lin.shape)
    return jnp.where(ok, v, fill), ok


@jax.jit
def consistency_filter(
    depths: jnp.ndarray,  # (V, H, W) per-view depth maps (<=0 = invalid)
    K: jnp.ndarray,  # (V, 3, 3)
    R: jnp.ndarray,  # (V, 3, 3) world->cam
    c: jnp.ndarray,  # (V, 3)
    min_consistent: int = 3,
    rel_tol: float = 0.01,
):
    """Keep pixels whose depth reprojects consistently into enough other
    views (Fuser::filterDepthMaps semantics). Returns filtered (V, H, W)
    with inconsistent pixels set to -1, plus the consistency counts."""
    V = depths.shape[0]

    def per_view(r):
        Xw = backproject_depth_map(depths[r], K[r], R[r], c[r])  # (H, W, 3)

        def check(o):
            uv, z_proj = project_points(Xw, K[o], R[o], c[o])
            d_other, inside = _sample_nearest(depths[o], uv, -1.0)
            ok = (
                inside
                & (d_other > 0)
                & (jnp.abs(d_other - z_proj) < rel_tol * z_proj)
                & (z_proj > 0)
            )
            return ok & (o != r)

        counts = jnp.sum(jax.vmap(check)(jnp.arange(V)), axis=0)
        valid = (depths[r] > 0) & (counts + 1 >= min_consistent)
        return jnp.where(valid, depths[r], -1.0), counts

    return jax.vmap(per_view)(jnp.arange(V))


def _ring_offsets(V: int, k: int):
    """Distinct ring-neighbour offsets ±1..±k_eff, capped so wraparound
    never double-counts a view and never includes self. For even V at
    k >= V/2 the antipodal view (+V/2 ≡ −V/2) is included exactly once,
    so the window degenerates to the dense all-pairs set."""
    k_pos = min(int(k), V // 2)
    k_neg = k_pos if 2 * k_pos < V else k_pos - 1
    return [o for o in range(-k_neg, k_pos + 1) if o != 0]


@partial(jax.jit, static_argnames=("k", "min_consistent"))
def consistency_filter_ring(
    depths: jnp.ndarray,  # (V, H, W) per-view depth maps (<=0 = invalid)
    K: jnp.ndarray,  # (V, 3, 3)
    R: jnp.ndarray,  # (V, 3, 3) world->cam
    c: jnp.ndarray,  # (V, 3)
    k: int = 4,
    min_consistent: int = 3,
    rel_tol: float = 0.01,
):
    """`consistency_filter` restricted to a BOUNDED ring-neighbour set:
    each view checks only the ±k adjacent views in capture order (with
    wraparound), the same bounded consistency set the reference uses
    (ref: src/aliceVision/fuseCut/Fuser.hpp:21-34 — each view is checked
    against its chosen neighbour cameras, not all V).

    This is the single-device parity reference for the multi-chip halo
    filter (mvs/sharded.py): with view order = capture order the ring
    window is the index-space proxy for the reference's covisibility
    neighbour selection."""
    V = depths.shape[0]
    offs = jnp.asarray(_ring_offsets(V, k), jnp.int32)

    def per_view(r):
        Xw = backproject_depth_map(depths[r], K[r], R[r], c[r])

        def check(off):
            o = jnp.mod(r + off, V)
            uv, z_proj = project_points(Xw, K[o], R[o], c[o])
            d_other, inside = _sample_nearest(depths[o], uv, -1.0)
            return (
                inside
                & (d_other > 0)
                & (jnp.abs(d_other - z_proj) < rel_tol * z_proj)
                & (z_proj > 0)
            )

        counts = jnp.sum(jax.vmap(check)(offs), axis=0)
        valid = (depths[r] > 0) & (counts + 1 >= min_consistent)
        return jnp.where(valid, depths[r], -1.0), counts

    return jax.vmap(per_view)(jnp.arange(V))


def fuse_point_cloud(
    depths: np.ndarray,  # (V, H, W) filtered depth maps
    colors: np.ndarray | None,  # (V, H, W, 3) or None
    K: np.ndarray,
    R: np.ndarray,
    c: np.ndarray,
    sim: np.ndarray | None = None,  # (V, H, W) similarity, optional weight
    voxel_size: float = 0.0,
):
    """Fuse all valid depth pixels into one world-space cloud (+ colors,
    + per-point view id), with optional voxel-grid simplification
    (PointCloud::createDensePointCloud's voxel filtering)."""
    pts_all, col_all, view_all = [], [], []
    V = depths.shape[0]
    for v in range(V):
        d = depths[v]
        m = d > 0
        if not m.any():
            continue
        Xw = np.asarray(
            backproject_depth_map(
                jnp.asarray(d), jnp.asarray(K[v]), jnp.asarray(R[v]), jnp.asarray(c[v])
            )
        )
        pts_all.append(Xw[m])
        view_all.append(np.full(int(m.sum()), v, np.int32))
        if colors is not None:
            col_all.append(colors[v][m])
    if not pts_all:
        return (
            np.zeros((0, 3)),
            np.zeros((0, 3), np.uint8),
            np.zeros(0, np.int32),
        )
    pts = np.concatenate(pts_all)
    views = np.concatenate(view_all)
    cols = (
        np.concatenate(col_all)
        if colors is not None
        else np.full((len(pts), 3), 255, np.uint8)
    )

    if voxel_size > 0:
        keys = np.floor(pts / voxel_size).astype(np.int64)
        # hash voxel coords; keep first point per voxel
        h = keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
        _, first = np.unique(h, return_index=True)
        pts, cols, views = pts[first], cols[first], views[first]
    return pts, cols, views


def depth_range_from_landmarks(
    points: np.ndarray, R: np.ndarray, c: np.ndarray, margin: float = 0.2
):
    """Per-view (d_min, d_max) from SfM landmark depths
    (SgmDepthList.cpp:48-75 derives hypotheses from landmarks)."""
    x_cam = (R @ (points - c).T).T
    z = x_cam[:, 2]
    z = z[z > 0]
    if len(z) == 0:
        return 0.1, 100.0
    lo, hi = np.percentile(z, [2, 98])
    span = hi - lo
    return float(max(lo - margin * span, 1e-3)), float(hi + margin * span)
