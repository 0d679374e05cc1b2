"""SE(3) poses, reference-convention compatible.

The reference stores a pose as (rotation R, center c) with the world->camera
map ``x_cam = R @ (x_world - c)`` (ref: src/aliceVision/geometry/Pose3.hpp).
We keep that convention so .sfm files interoperate bit-for-bit, but store
batches as struct-of-arrays: rotations ``(..., 4)`` unit quaternions (w,x,y,z)
and centers ``(..., 3)``. Matrix forms are materialized only at use sites.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .rotations import (
    mat_to_quat,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
)


class Pose(NamedTuple):
    """Batched SE(3): world->camera rotation (quat) + camera center (world)."""

    q: jnp.ndarray  # (..., 4) unit quaternion, world->camera
    c: jnp.ndarray  # (..., 3) camera center in world frame

    @property
    def R(self) -> jnp.ndarray:  # (..., 3, 3)
        return quat_to_mat(self.q)

    @property
    def t(self) -> jnp.ndarray:
        """Translation of the [R|t] form: t = -R @ c."""
        return -quat_rotate(self.q, self.c)


def pose_identity(shape=()) -> Pose:
    q = jnp.zeros(shape + (4,)).at[..., 0].set(1.0)
    return Pose(q=q, c=jnp.zeros(shape + (3,)))


def pose_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> Pose:
    """From the projective [R|t] form (x_cam = R x + t): c = -R^T t."""
    c = -jnp.einsum("...ji,...j->...i", R, t)
    return Pose(q=mat_to_quat(R), c=c)


def pose_from_Rc(R: jnp.ndarray, c: jnp.ndarray) -> Pose:
    return Pose(q=mat_to_quat(R), c=c)


def transform(pose: Pose, x_world: jnp.ndarray) -> jnp.ndarray:
    """World -> camera: R @ (x - c). Broadcasts over leading dims."""
    return quat_rotate(pose.q, x_world - pose.c)


def inverse_transform(pose: Pose, x_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera -> world: R^T @ x + c."""
    return quat_rotate(quat_conj(pose.q), x_cam) + pose.c


def compose(a: Pose, b: Pose) -> Pose:
    """(a * b)(x) = a(b(x)): world -> b -> a.

    Matches Pose3::operator* of the reference: R = Ra Rb, c = cb + Rb^T ca.
    """
    q = quat_normalize(quat_mul(a.q, b.q))
    c = b.c + quat_rotate(quat_conj(b.q), a.c)
    return Pose(q=q, c=c)


def pose_inverse(p: Pose) -> Pose:
    qi = quat_conj(p.q)
    return Pose(q=qi, c=-quat_rotate(p.q, p.c))


def relative_pose(a: Pose, b: Pose) -> Pose:
    """Pose of camera b expressed in camera a's frame: b * a^{-1}."""
    return compose(b, pose_inverse(a))


def projection_matrix(K: jnp.ndarray, pose: Pose) -> jnp.ndarray:
    """P = K [R | t] with t = -R c. Shapes broadcast: (...,3,3) x Pose."""
    R = pose.R
    t = pose.t[..., :, None]
    return K @ jnp.concatenate([R, t], axis=-1)
