"""Camera-frustum intersection for pair selection.

TPU-native counterpart of the reference's frustum filtering
(ref: src/aliceVision/sfm/FrustumFilter.cpp, geometry/Frustum.hpp —
exact convex-polytope intersection per pair, looped on CPU). Here the
frusta of all posed views are built as one (V, 8, 3) corner tensor and the
pairwise separating-axis test runs as a single vmapped kernel over the
(V*V) pair grid — candidate axes are the face normals and side-edge cross
products of both frusta, exact for convex polyhedra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..sfmdata.scene import SfMData


def frustum_corners(K, R, c, wh, z_near: float, z_far: float) -> jnp.ndarray:
    """8 world-space corners of a view frustum. K (3,3), R (3,3) world->cam,
    c (3,), wh (2,). Rows 0-3 near plane, 4-7 far plane (x then y order)."""
    w, h = wh[0], wh[1]
    pix = jnp.asarray([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]])
    Kinv = jnp.linalg.inv(K)
    rays = jnp.concatenate([pix, jnp.ones((4, 1))], axis=-1) @ Kinv.T  # (4,3) cam
    near = rays * z_near
    far = rays * z_far
    cam_pts = jnp.concatenate([near, far], axis=0)  # (8,3)
    return cam_pts @ R + c  # R^T x + c, world frame


def _frustum_axes(corners: jnp.ndarray) -> jnp.ndarray:
    """Face normals (5) + side edge directions (4) of one frustum."""
    n0, n1, n2, n3, f0, f1, f2, f3 = [corners[i] for i in range(8)]
    # side planes: each contains edge (n_i->f_i) and (n_i->n_{i+1})
    sides = []
    nears = [n0, n1, n2, n3]
    fars = [f0, f1, f2, f3]
    for i in range(4):
        e_depth = fars[i] - nears[i]
        e_ring = nears[(i + 1) % 4] - nears[i]
        sides.append(jnp.cross(e_ring, e_depth))
    far_normal = jnp.cross(f1 - f0, f3 - f0)
    edges = jnp.stack([fars[i] - nears[i] for i in range(4)])
    faces = jnp.stack(sides + [far_normal])
    return faces, edges


def _sat_disjoint(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """True if a separating axis exists between corner sets (8,3)."""
    fa, ea = _frustum_axes(ca)
    fb, eb = _frustum_axes(cb)
    cross = jnp.cross(ea[:, None, :], eb[None, :, :]).reshape(-1, 3)
    axes = jnp.concatenate([fa, fb, cross], axis=0)  # (26, 3)
    norm = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    axes = axes / jnp.where(norm < 1e-12, 1.0, norm)
    pa = ca @ axes.T  # (8, 26)
    pb = cb @ axes.T
    degenerate = (norm[:, 0] < 1e-12)
    sep = (pa.max(0) < pb.min(0) - 1e-9) | (pb.max(0) < pa.min(0) - 1e-9)
    return jnp.any(sep & ~degenerate)


def scene_frusta(scene: SfMData, z_near=None, z_far=None) -> tuple:
    """(view_indices, corners (V,8,3)) for all posed views. When the scene
    has structure, per-view depth ranges come from observed landmarks (the
    reference derives near/far the same way, FrustumFilter.cpp:init)."""
    views = scene.valid_views()
    corners = []
    for v in views:
        K, R, c = scene.camera_matrices(v)
        zn, zf = z_near, z_far
        if zn is None or zf is None:
            sel = scene.obs_view == v
            if np.any(sel):
                X = scene.points[scene.obs_landmark[sel]]
                z = (X - c) @ R[2]
                z = z[z > 0]
                if len(z):
                    zn = zn or max(float(np.percentile(z, 2)) * 0.8, 1e-3)
                    zf = zf or float(np.percentile(z, 98)) * 1.2
            zn = zn or 0.1
            zf = zf or 100.0
        corners.append(
            frustum_corners(
                jnp.asarray(K, jnp.float32),
                jnp.asarray(R, jnp.float32),
                jnp.asarray(c, jnp.float32),
                jnp.asarray(scene.view_sizes[v], jnp.float32),
                zn,
                zf,
            )
        )
    return views, jnp.stack(corners) if corners else jnp.zeros((0, 8, 3))


def frustum_pairs(scene: SfMData, z_near=None, z_far=None) -> np.ndarray:
    """All view pairs whose frusta intersect, as (P, 2) view indices
    (ref: FrustumFilter::getFrustumIntersectionPairs)."""
    views, corners = scene_frusta(scene, z_near, z_far)
    V = len(views)
    if V < 2:
        return np.zeros((0, 2), np.int64)
    ii, jj = jnp.triu_indices(V, k=1)
    disjoint = jax.jit(jax.vmap(_sat_disjoint))(corners[ii], corners[jj])
    keep = np.nonzero(~np.asarray(disjoint))[0]
    pairs = np.stack([views[np.asarray(ii)[keep]], views[np.asarray(jj)[keep]]], -1)
    return pairs.astype(np.int64)
