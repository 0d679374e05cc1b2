"""SO(3) primitives: quaternions, rotation matrices, exp/log maps.

TPU-native counterpart of the reference's Eigen-based lie algebra helpers
(ref: src/aliceVision/geometry/lie.hpp). Everything is a pure function over
jnp arrays and batches transparently under vmap: a "rotation" is either a
unit quaternion ``(..., 4)`` stored (w, x, y, z) or a matrix ``(..., 3, 3)``.

float32 throughout — algorithms are conditioned for single precision
(Shepperd's method for mat->quat, Taylor fallbacks near theta=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (w, x, y, z)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the best-conditioned one with jnp.where (TPU-friendly, no cond).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_k^2 (k = w, x, y, z).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the candidate whose pivot (diagonal combination) is largest.
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.where(
        best == 0, qw, jnp.where(best == 1, qx, jnp.where(best == 2, qy, qz))
    )
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> skew-symmetric (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    m = jnp.stack(
        [zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1
    )
    return m.reshape(w.shape[:-1] + (3, 3))


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3): axis-angle (..., 3) -> matrix.

    Rodrigues with Taylor fallback for small angles (f32-safe).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(w)
    # K@K == w w^T - theta^2 I in closed form: exact on the VPU, and avoids
    # the MXU's bfloat16 default truncating a rotation product.
    KK = w[..., :, None] * w[..., None, :] - theta2[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=w.dtype), K.shape
    )
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(_EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO(3) -> so(3), robust via quaternion route (f32-safe)."""
    q = mat_to_quat(R)
    w = q[..., 0].clip(-1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm < _EPS, 2.0, theta / vnorm.clip(_EPS))
    return v * scale[..., None]


def quat_exp_tangent(q: jnp.ndarray, dw: jnp.ndarray) -> jnp.ndarray:
    """Right-multiply a rotation (as quat) by exp(dw): the retraction used by
    the BA manifold (ref: sfm/bundle/manifolds/so3.hpp semantics)."""
    half = 0.5 * dw
    theta2 = jnp.sum(half * half, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    w = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 2.0, jnp.cos(theta[..., 0]))
    k = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    dq = jnp.concatenate([w[..., None], k * half], axis=-1)
    return quat_normalize(quat_mul(q, dq))


def random_rotation(key, shape=()) -> jnp.ndarray:
    """Uniform random rotation matrices via normalized Gaussian quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_mat(quat_normalize(q))
