"""Multi-camera rig calibration.

TPU-native counterpart of the reference's rig module
(ref: src/aliceVision/rig/Rig.cpp — estimate fixed sub-pose of each camera
relative to the rig body from per-frame tracked poses). The relative pose
of camera k w.r.t. camera 0 is averaged over frames: rotations via
quaternion eigen-averaging, centers by the mean — a closed-form robust
batched estimator instead of the reference's iterative refinement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry import Pose, compose, pose_from_Rc, pose_inverse
from ..geometry.rotations import mat_to_quat, quat_to_mat


def average_quaternions(qs: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Markley quaternion averaging: principal eigenvector of sum q q^T."""
    w = jnp.ones(qs.shape[0]) if weights is None else weights
    M = jnp.einsum("n,ni,nj->ij", w, qs, qs)
    _, V = jnp.linalg.eigh(M)
    q = V[:, -1]
    return q * jnp.sign(q[0] + 1e-12)


def calibrate_rig(poses_per_cam: list) -> list:
    """poses_per_cam[k] = (R (F, 3, 3), c (F, 3)) tracked world->cam poses of
    camera k over F frames. Returns the fixed relative Pose of each camera
    in camera-0's frame (sub-poses), list of (R_rel, c_rel)."""
    R0, c0 = poses_per_cam[0]
    out = []
    for Rk, ck in poses_per_cam:
        F = len(Rk)
        rel_q = []
        rel_c = []
        for f in range(F):
            p0 = pose_from_Rc(jnp.asarray(R0[f]), jnp.asarray(c0[f]))
            pk = pose_from_Rc(jnp.asarray(Rk[f]), jnp.asarray(ck[f]))
            rel = compose(pk, pose_inverse(p0))  # camera k in camera-0 frame
            rel_q.append(rel.q)
            rel_c.append(rel.c)
        q = average_quaternions(jnp.stack(rel_q))
        c = jnp.mean(jnp.stack(rel_c), axis=0)
        out.append((np.asarray(quat_to_mat(q)), np.asarray(c)))
    return out
