"""Mesh rasterization: depth maps, normal maps, visibility.

TPU-native counterparts of the reference's mesh-rendering utilities
(ref: src/software/pipeline/main_depthMapRendering.cpp,
main_normalMapRendering.cpp — render depth/normals of a mesh into each
camera; src/software/pipeline/main_meshRemoveUnseenFaces.cpp — drop faces
not observed by any camera).

Design: a z-buffer rasterizer as a fully batched reduction instead of a
scanline loop. Faces are processed in fixed-size chunks; for each chunk an
(F_chunk, H, W) edge-function test + perspective-correct 1/z interpolation
produces candidate depths, and the z-buffer is a running `min` across
chunks — map-reduce over faces, no data-dependent control flow, so the
whole render jit-compiles onto the MXU/VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 32  # faces per scan step: keeps the (chunk, H*W) temporaries in VMEM-friendly sizes


def _project(V, K, R, c):
    """World verts (N,3) -> pixel (N,2), camera depth (N,)."""
    Xc = (V - c) @ R.T
    z = Xc[:, 2]
    uv = (Xc @ K.T)[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[:, None]
    return uv, z


@partial(jax.jit, static_argnames=("hw",))
def _raster_depth(Vp, z, F, hw):
    """Z-buffer raster. Vp (N,2) pixel verts, z (N,) depths, F (M,3) faces
    (padded with -1 rows allowed). Returns (depth (H,W), face_id (H,W))."""
    H, W = hw
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = jnp.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2)  # (P,2)

    M = F.shape[0]
    pad = (-M) % _CHUNK
    Fp = jnp.concatenate([F, jnp.full((pad, 3), -1, F.dtype)], axis=0)
    n_chunks = Fp.shape[0] // _CHUNK

    def edge(a, b, p):
        # signed area of (a,b,p): (b-a) x (p-a)
        return (b[:, None, 0] - a[:, None, 0]) * (p[None, :, 1] - a[:, None, 1]) - (
            b[:, None, 1] - a[:, None, 1]
        ) * (p[None, :, 0] - a[:, None, 0])

    def body(carry, fc):
        zbuf, fbuf = carry
        valid_f = fc[:, 0] >= 0
        idx = jnp.maximum(fc, 0)
        a, b, cc = Vp[idx[:, 0]], Vp[idx[:, 1]], Vp[idx[:, 2]]
        za, zb, zc = z[idx[:, 0]], z[idx[:, 1]], z[idx[:, 2]]
        w0 = edge(b, cc, px)
        w1 = edge(cc, a, px)
        w2 = edge(a, b, px)
        area = w0 + w1 + w2
        # inside if all barycentrics share the sign of the area
        s = jnp.sign(area)
        inside = (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0) & (
            jnp.abs(area) > 1e-12
        )
        inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
        b0, b1, b2 = w0 * inv_area, w1 * inv_area, w2 * inv_area
        # 1/z is affine in screen space -> perspective-correct depth
        inv_z = (
            b0 * (1.0 / jnp.maximum(za, 1e-9))[:, None]
            + b1 * (1.0 / jnp.maximum(zb, 1e-9))[:, None]
            + b2 * (1.0 / jnp.maximum(zc, 1e-9))[:, None]
        )
        depth = 1.0 / jnp.maximum(inv_z, 1e-12)
        front = (za > 1e-6) & (zb > 1e-6) & (zc > 1e-6)
        ok = inside & (front & valid_f)[:, None]
        depth = jnp.where(ok, depth, jnp.inf)
        best = jnp.argmin(depth, axis=0)  # (P,)
        dmin = jnp.take_along_axis(depth, best[None], axis=0)[0]
        new_z = jnp.minimum(zbuf, dmin)
        new_f = jnp.where(dmin < zbuf, best, fbuf)
        return (new_z, new_f), None

    # track local-best face index per chunk plus the chunk id to recover
    # the global face id afterwards
    zbuf0 = jnp.full((H * W,), jnp.inf)
    fbuf0 = jnp.full((H * W,), -1, jnp.int32)

    def body2(carry, ci):
        (zbuf, fbuf) = carry
        fc = jax.lax.dynamic_slice_in_dim(Fp, ci * _CHUNK, _CHUNK, axis=0)
        (zb2, local), _ = body((zbuf, jnp.full((H * W,), -1, jnp.int32)), fc)
        upd = zb2 < zbuf
        fbuf = jnp.where(upd, ci * _CHUNK + local, fbuf)
        return (jnp.minimum(zbuf, zb2), fbuf), None

    (zbuf, fbuf), _ = jax.lax.scan(
        body2, (zbuf0, fbuf0), jnp.arange(n_chunks)
    )
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(H, W)
    face_id = jnp.where(jnp.isfinite(zbuf), fbuf, -1).reshape(H, W)
    return depth, face_id


def render_depth_map(V, F, K, R, c, hw):
    """Render the depth map of mesh (V, F) into camera (K, R world->cam, c).
    Returns (depth (H,W) float32 with 0 = no hit, face_id (H,W) int32)."""
    Vj = jnp.asarray(V, jnp.float32)
    uv, z = _project(Vj, jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
                     jnp.asarray(c, jnp.float32))
    depth, fid = _raster_depth(uv, z, jnp.asarray(F, jnp.int32), tuple(hw))
    return np.asarray(depth), np.asarray(fid)


def face_normals(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    n = np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]])
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def render_normal_map(V, F, K, R, c, hw, camera_frame: bool = True):
    """Render per-face normals into the camera. Returns (H,W,3) float32
    (zeros where no face) (ref: main_normalMapRendering.cpp)."""
    depth, fid = render_depth_map(V, F, K, R, c, hw)
    n = face_normals(np.asarray(V, np.float64), np.asarray(F))
    if camera_frame:
        n = n @ np.asarray(R).T
    # orient towards the camera (-z in camera frame)
    if camera_frame:
        flip = n[:, 2] > 0
        n[flip] *= -1.0
    out = np.zeros((*depth.shape, 3), np.float32)
    hit = fid >= 0
    out[hit] = n[fid[hit]]
    return out, depth


def visible_faces(V, F, cams, hw_list=None) -> np.ndarray:
    """Count, per face, in how many cameras it is the front-most surface.
    cams: list of (K, R, c) or (K, R, c, (H, W)). Returns (F,) int counts
    (ref: main_meshRemoveUnseenFaces.cpp visibility accumulation)."""
    counts = np.zeros(len(F), np.int64)
    for k, camt in enumerate(cams):
        if len(camt) == 4:
            K, R, c, hw = camt
        else:
            K, R, c = camt
            hw = hw_list[k] if hw_list else (480, 640)
        _, fid = render_depth_map(V, F, K, R, c, hw)
        seen = np.unique(fid[fid >= 0])
        counts[seen] += 1
    return counts


def remove_unseen_faces(V, F, cams, min_views: int = 1):
    """Drop faces seen by fewer than min_views cameras; compacts vertices."""
    from .ops import compact

    counts = visible_faces(V, F, cams)
    keep = counts >= min_views
    return compact(V, F[keep])
