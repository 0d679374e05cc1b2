"""Undistortion models — the pixel-to-pixel lens-grid family (3DE).

TPU-native counterpart of the reference's `camera::Undistortion` hierarchy
(ref: src/aliceVision/camera/Undistortion.hpp:20-155, Undistortion.cpp:12-36,
Undistortion3DEA4.cpp, Undistortion3DEClassicLD.cpp, Undistortion3DERadial4.cpp,
UndistortionRadial.cpp). Contrary to the distortion models in
`camera/models.py`, undistortion is a *pixel-to-pixel* operation independent
of focal length: points are centered on (size/2 + offset), normalized by the
half-diagonal, warped by the model polynomial, and de-normalized.

Instead of one virtual class per model we keep integer model codes and pure
functions; the per-model "undistort" polynomial is selected host-side (the
model of an intrinsic is static) and everything is batched over points and
jit-able. The Newton inverse uses the exact 2x2 Jacobian from `jax.jacfwd`
with a fixed iteration count (branch-free), replacing the reference's
while-loop (Undistortion3DEA4.cpp:316-334).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Model codes — order matches the reference's EUNDISTORTION
# (ref: src/aliceVision/camera/cameraCommon.hpp:33-40).
UNDIST_NONE = 0
UNDIST_RADIALK3 = 1
UNDIST_3DEANAMORPHIC4 = 2
UNDIST_3DECLASSICLD = 3
UNDIST_3DERADIAL4 = 4

UNDIST_PARAMS = 14  # padded parameter slots (3DEA4 uses 13)

# Serialization names (ref: cameraCommon.hpp:188-204 EUNDISTORTION_enumToString).
UNDIST_NAMES = {
    UNDIST_NONE: "none",
    UNDIST_RADIALK3: "radialk3",
    UNDIST_3DEANAMORPHIC4: "3deanamorphic4",
    UNDIST_3DECLASSICLD: "3declassicld",
    UNDIST_3DERADIAL4: "3deradial4",
}
UNDIST_CODES = {v: k for k, v in UNDIST_NAMES.items()}

N_UNDIST_PARAMS = {
    UNDIST_NONE: 0,
    UNDIST_RADIALK3: 3,
    UNDIST_3DEANAMORPHIC4: 13,
    UNDIST_3DECLASSICLD: 5,
    UNDIST_3DERADIAL4: 8,
}


def default_params(kind: int) -> np.ndarray:
    """Neutral (identity) parameters, padded to UNDIST_PARAMS
    (ref: Undistortion3DEA4.hpp:27, Undistortion3DEClassicLD.hpp:27)."""
    d = np.zeros(UNDIST_PARAMS)
    if kind == UNDIST_3DEANAMORPHIC4:
        d[11] = 1.0  # sqx
        d[12] = 1.0  # sqy
    elif kind == UNDIST_3DECLASSICLD:
        d[1] = 1.0  # squeeze (divides x coefficients)
    return d


# ---------------------------------------------------------------------------
# Per-model normalized warps (points (..., 2), params (UNDIST_PARAMS,))
# ---------------------------------------------------------------------------


def _radialk3(params, pa, p):
    """ref: UndistortionRadial.cpp:12-26."""
    k1, k2, k3 = params[0], params[1], params[2]
    r2 = jnp.sum(p * p, axis=-1)
    s = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    return p * s[..., None]


def _a4_base(params, p):
    """The unrotated anamorphic polynomial (ref: Undistortion3DEA4.cpp:32-60).

    cos(2t)/cos(4t) are expanded in x, y to stay finite at r = 0:
    r2*cos2t = x^2 - y^2 and r4*cos4t = x^4 - 6x^2y^2 + y^4.
    """
    cx02, cy02, cx22, cy22 = params[0], params[1], params[2], params[3]
    cx04, cy04, cx24, cy24 = params[4], params[5], params[6], params[7]
    cx44, cy44 = params[8], params[9]
    x, y = p[..., 0], p[..., 1]
    xx, yy = x * x, y * y
    r2 = xx + yy
    r2c2 = xx - yy  # r2 * cos(2 theta)
    r4 = r2 * r2
    r4c2 = r2 * r2c2  # r4 * cos(2 theta)
    r4c4 = xx * xx - 6.0 * xx * yy + yy * yy  # r4 * cos(4 theta)
    dx = 1.0 + cx02 * r2 + cx04 * r4 + cx22 * r2c2 + cx24 * r4c2 + cx44 * r4c4
    dy = 1.0 + cy02 * r2 + cy04 * r4 + cy22 * r2c2 + cy24 * r4c2 + cy44 * r4c4
    return jnp.stack([x * dx, y * dy], axis=-1)


def _anamorphic4(params, pa, p):
    """ref: Undistortion3DEA4.cpp:62-90 (rotate by phi, base warp, squeeze,
    rotate back; x pre-divided by the pixel aspect ratio)."""
    phi, sqx, sqy = params[10], params[11], params[12]
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    xu = p[..., 0] / pa
    yu = p[..., 1]
    rx = cphi * xu - sphi * yu
    ry = sphi * xu + cphi * yu
    b = _a4_base(params, jnp.stack([rx, ry], axis=-1))
    sx = b[..., 0] * pa * sqx
    sy = b[..., 1] * sqy
    return jnp.stack([cphi * sx + sphi * sy, -sphi * sx + cphi * sy], axis=-1)


def _classicld(params, pa, p):
    """ref: Undistortion3DEClassicLD.cpp:12-45."""
    c2, sq, cx, cy, c4 = params[0], params[1], params[2], params[3], params[4]
    cxx = c2 / sq
    cxy = (c2 + cx) / sq
    cxxx = c4 / sq
    cxxy = 2.0 * c4 / sq
    cxyy = c4 / sq
    cyx = c2 + cy
    cyy = c2
    cyxx = c4
    cyyx = 2.0 * c4
    cyyy = c4
    x, y = p[..., 0], p[..., 1]
    x2, y2 = x * x, y * y
    x4, y4, x2y2 = x2 * x2, y2 * y2, x2 * y2
    nx = x * (1.0 + cxx * x2 + cxy * y2 + cxxx * x4 + cxxy * x2y2 + cxyy * y4)
    ny = y * (1.0 + cyx * x2 + cyy * y2 + cyxx * x4 + cyyx * x2y2 + cyyy * y4)
    return jnp.stack([nx, ny], axis=-1)


def _radial4(params, pa, p):
    """ref: Undistortion3DERadial4.cpp:12-56 (radial + de-centering terms,
    then the cylindric-bending shear matrix)."""
    c2, u1, v1, c4, u3, v3 = (params[i] for i in range(6))
    phi, b = params[6], params[7]
    q = jnp.sqrt(1.0 + b)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    m11 = cphi * cphi * q + sphi * sphi / q
    m12 = (q - 1.0 / q) * cphi * sphi
    m22 = cphi * cphi / q + sphi * sphi * q
    x, y = p[..., 0], p[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    r4 = r2 * r2
    s = 1.0 + c2 * r2 + c4 * r4
    rx = x * s + (r2 + 2.0 * x2) * (u1 + u3 * r2) + 2.0 * xy * (v1 + v3 * r2)
    ry = y * s + (r2 + 2.0 * y2) * (v1 + v3 * r2) + 2.0 * xy * (u1 + u3 * r2)
    return jnp.stack([m11 * rx + m12 * ry, m12 * rx + m22 * ry], axis=-1)


def _identity(params, pa, p):
    return p


_MODEL_FNS = {
    UNDIST_NONE: _identity,
    UNDIST_RADIALK3: _radialk3,
    UNDIST_3DEANAMORPHIC4: _anamorphic4,
    UNDIST_3DECLASSICLD: _classicld,
    UNDIST_3DERADIAL4: _radial4,
}


def undistort_normalized(kind: int, params, pa, p):
    """Apply the model warp in normalized coords. `kind` is a static host int
    (the reference resolves it by virtual dispatch; here by table lookup)."""
    return _MODEL_FNS[int(kind)](jnp.asarray(params), jnp.asarray(pa), jnp.asarray(p))


def inverse_normalized(kind: int, params, pa, p, iters: int = 20):
    """Newton inverse: q such that undistort(q) = p
    (ref: Undistortion3DEA4.cpp:316-334 — while-loop Newton; here a fixed
    iteration count with an exact autodiff 2x2 Jacobian, branch-free)."""
    kind = int(kind)
    if kind == UNDIST_NONE:
        return jnp.asarray(p)
    params = jnp.asarray(params)
    pa = jnp.asarray(pa)
    p = jnp.asarray(p)

    def point_fn(q):
        return _MODEL_FNS[kind](params, pa, q)

    jac_fn = jax.jacfwd(point_fn)

    def one(q0, target):
        def body(_, q):
            f = point_fn(q) - target
            J = jac_fn(q)
            det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
            det = jnp.where(jnp.abs(det) < 1e-24, 1e-24, det)
            dx = (J[1, 1] * f[0] - J[0, 1] * f[1]) / det
            dy = (-J[1, 0] * f[0] + J[0, 0] * f[1]) / det
            return q - jnp.stack([dx, dy])

        return jax.lax.fori_loop(0, iters, body, q0)

    flat = p.reshape(-1, 2)
    out = jax.vmap(one)(flat, flat)
    return out.reshape(p.shape)


# ---------------------------------------------------------------------------
# Pixel-space wrappers (the Undistortion base-class contract)
# ---------------------------------------------------------------------------


class Undistortion(NamedTuple):
    """One intrinsic's undistortion state
    (ref: Undistortion.hpp:147-154 protected members)."""

    kind: int
    params: np.ndarray  # (UNDIST_PARAMS,)
    size: np.ndarray  # (2,) w, h
    offset: np.ndarray  # (2,)
    pixel_aspect_ratio: float = 1.0
    is_desqueezed: bool = False
    diagonal: float = 0.0  # 0 -> computed from size

    @staticmethod
    def make(kind: int, w: int, h: int, params=None, offset=(0.0, 0.0),
             pixel_aspect_ratio: float = 1.0, is_desqueezed: bool = False,
             diagonal: float = 0.0) -> "Undistortion":
        d = default_params(kind)
        if params is not None:
            params = np.asarray(params, np.float64)
            d[: len(params)] = params
        return Undistortion(int(kind), d, np.array([w, h], np.float64),
                            np.asarray(offset, np.float64),
                            float(pixel_aspect_ratio), bool(is_desqueezed),
                            float(diagonal))

    def half_diagonal(self) -> float:
        """ref: Undistortion.hpp:68-79 setSize (y compressed by the pixel
        aspect ratio unless the plate is already desqueezed)."""
        if self.diagonal > 0:
            return float(self.diagonal)
        w, h = float(self.size[0]), float(self.size[1])
        hh = h if self.is_desqueezed else h / self.pixel_aspect_ratio
        return 0.5 * float(np.hypot(w, hh))


def _norm_consts(u: Undistortion):
    diag = u.half_diagonal()
    pa = 1.0 if u.is_desqueezed else u.pixel_aspect_ratio
    center = 0.5 * np.asarray(u.size, np.float64) + np.asarray(u.offset, np.float64)
    return diag, pa, center


def undistort_pixels(u: Undistortion, pix):
    """Pixel -> undistorted pixel (ref: Undistortion.cpp:12-36)."""
    diag, pa, center = _norm_consts(u)
    pix = jnp.asarray(pix)
    n = (pix - center) / jnp.array([diag, pa * diag])
    out = undistort_normalized(u.kind, u.params, u.pixel_aspect_ratio, n)
    return out * jnp.array([diag, pa * diag]) + center


def inverse_pixels(u: Undistortion, pix, iters: int = 20):
    """Undistorted pixel -> distorted pixel (adds lens distortion back;
    ref: Undistortion.cpp inverse via inverseNormalized)."""
    diag, pa, center = _norm_consts(u)
    pix = jnp.asarray(pix)
    n = (pix - center) / jnp.array([diag, pa * diag])
    out = inverse_normalized(u.kind, u.params, u.pixel_aspect_ratio, n, iters)
    return out * jnp.array([diag, pa * diag]) + center


def undistort_image(u: Undistortion, img, out_hw=None):
    """Resample an image so lens distortion is removed.

    Each output (undistorted) pixel p samples the source plate at
    inverse(p) — the model's Newton inverse maps clean coordinates back to
    where they lived in the distorted plate. This matches the reference's
    use of `Undistortion::inverse` as the sampling map when undistorting
    plates (ref: camera/Undistortion.hpp:137 "add distortion (return p'
    such that undisto(p') = p)").
    """
    from ..image.filtering import bilinear_sample

    img = jnp.asarray(img)
    h, w = (img.shape[0], img.shape[1]) if out_hw is None else out_hw
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    src = inverse_pixels(u, grid).reshape(h, w, 2).astype(img.dtype)
    if img.ndim == 3:  # (H, W, C) -> sample each channel plane
        out = jnp.stack(
            [bilinear_sample(img[..., c], src) for c in range(img.shape[-1])],
            axis=-1,
        )
        return out
    return bilinear_sample(img, src)


# ---------------------------------------------------------------------------
# Scene integration (SfMData.intrinsic_extra round-trip dict)
# ---------------------------------------------------------------------------

_EXTRA_KEY = "undistortion"


def to_extra(u: Undistortion) -> dict:
    return {
        "type": UNDIST_NAMES[u.kind],
        "params": [float(x) for x in u.params[: N_UNDIST_PARAMS[u.kind]]],
        "offset": [float(u.offset[0]), float(u.offset[1])],
        "pixelAspectRatio": float(u.pixel_aspect_ratio),
        "isDesqueezed": bool(u.is_desqueezed),
        "diagonal": float(u.half_diagonal()),
    }


def from_extra(extra: dict, w: int, h: int):
    d = extra.get(_EXTRA_KEY)
    if not d or d.get("type", "none") == "none":
        return None
    return Undistortion.make(
        UNDIST_CODES[d["type"]], w, h, d.get("params"),
        tuple(d.get("offset", (0.0, 0.0))),
        float(d.get("pixelAspectRatio", 1.0)),
        bool(d.get("isDesqueezed", False)),
        float(d.get("diagonal", 0.0)),
    )


def scene_undistortion(scene, intrinsic_idx: int):
    """The Undistortion of one intrinsic, or None."""
    w, h = int(scene.sizes[intrinsic_idx, 0]), int(scene.sizes[intrinsic_idx, 1])
    return from_extra(scene.intrinsic_extra[intrinsic_idx], w, h)


def set_scene_undistortion(scene, intrinsic_idx: int, u: Undistortion) -> None:
    scene.intrinsic_extra[intrinsic_idx][_EXTRA_KEY] = to_extra(u)
