"""Pure-rotation SfM (nodal / panorama reconstruction).

TPU-native counterpart of the reference's rotation-only pipeline
(ref: src/aliceVision/sfm/pipeline/panorama/ReconstructionEngine_panorama.cpp,
multiview/relativePose/Rotation3PSolver.hpp used by
src/software/pipeline/main_nodalSfM.cpp:55-64). Relative rotations come
from batched 2-point Kabsch hypotheses on bearing vectors with a-contrario
selection on angular residuals; global rotations from the L2-chordal
averaging of sfm/global_sfm.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..robust.ransac import acransac_select, logalpha0_point, sample_minimal
from ..multiview.resection import kabsch
from .global_sfm import rotation_averaging_l2


def _kabsch_rotation_only(src, dst, mask=None):
    """Rotation-only Kabsch on unit bearings (no translation/centroid)."""
    if mask is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = mask.astype(src.dtype)
    H = jnp.einsum("...ni,...nj->...ij", dst * w[..., None], src)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return U @ (D[..., :, None] * Vt)


def robust_rotation(
    key: jax.Array,
    b1: jnp.ndarray,  # (N, 3) unit bearings in view 1
    b2: jnp.ndarray,  # (N, 3) unit bearings in view 2 (same scene points)
    focal_px: float,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 128,
    max_error_px: float = 4.0,
):
    """Relative rotation R with b2 ~ R b1, AC-RANSAC on angular residuals.

    Residuals are measured as tan(angle) ~ normalized-plane displacement so
    the NFA alpha0 of the point model applies unchanged.
    """
    n = b1.shape[0]
    idx = sample_minimal(key, n, 2, n_hyps, valid)
    R_h = _kabsch_rotation_only(b1[idx], b2[idx])  # (H, 3, 3)

    rot = jnp.einsum("hij,nj->hni", R_h, b1)  # (H, N, 3)
    cosang = jnp.clip(jnp.einsum("hni,ni->hn", rot, b2), -1.0, 1.0)
    res_sq = jnp.tan(jnp.arccos(cosang)) ** 2

    w, h = im_size
    sel = acransac_select(
        res_sq,
        sample_size=2,
        logalpha0=logalpha0_point(w / focal_px, h / focal_px),
        mult_error=1.0,
        valid=valid,
        max_threshold_sq=(max_error_px / focal_px) ** 2,
    )
    # Refit on inliers.
    R_best = _kabsch_rotation_only(b1, b2, mask=sel.inliers)
    rot = jnp.einsum("ij,nj->ni", R_best, b1)
    cosang = jnp.clip(jnp.einsum("ni,ni->n", rot, b2), -1.0, 1.0)
    res_ref = jnp.tan(jnp.arccos(cosang)) ** 2
    v = jnp.ones_like(sel.inliers) if valid is None else valid
    inl = (res_ref <= sel.threshold_sq) & v
    better = jnp.sum(inl) >= sel.n_inliers
    R_out = jnp.where(better, R_best, R_h[sel.best_hyp])
    inl_out = jnp.where(better, inl, sel.inliers)
    return R_out, inl_out, sel


class RotationSfM:
    """Nodal reconstruction: pairwise rotations -> global rotations."""

    def __init__(self, n_views: int, focal_px: float, im_size):
        self.n_views = n_views
        self.focal = focal_px
        self.im_size = im_size

    def run(self, key, pair_bearings: dict, irls_iters: int = 2):
        """pair_bearings: {(i, j): (b_i (N,3), b_j (N,3))} matched bearings.

        Returns (R (V, 3, 3) world->cam global rotations, per-pair inlier
        counts)."""
        edges, R_rel, counts = [], [], {}
        for (i, j), (bi, bj) in pair_bearings.items():
            key, k = jax.random.split(key)
            R, inl, _ = robust_rotation(
                k, jnp.asarray(bi), jnp.asarray(bj), self.focal, self.im_size
            )
            edges.append((i, j))
            R_rel.append(np.asarray(R))
            counts[(i, j)] = int(jnp.sum(inl))
        R = rotation_averaging_l2(
            self.n_views,
            np.array(edges),
            jnp.asarray(np.stack(R_rel)),
            irls_iters=irls_iters,
        )
        return np.asarray(R), counts


def refine_rotations_with_constraints(
    R_init,  # (V, 3, 3) world->cam global rotations
    rotation_priors: list,  # dicts {view_i, view_j, R_j_i}
    constraints2d: list,  # dicts {view_i, uv_i, view_j, uv_j}
    intr=None,  # batched Intrinsics (for bearing computation)
    view_intrinsic=None,  # (V,) int
    iters: int = 10,
    prior_weight: float = 1.0,
    constraint_weight: float = 1.0,
    fix_first: bool = True,
):
    """Gauss-Newton refinement of global rotations against the scene-model
    constraints (ref: the panorama/nodal engines consume
    SfMData::rotationpriors and ::constraints2d,
    ReconstructionEngine_panorama.cpp / sfmData/SfMData.hpp:60-68).

    Residuals:
      * priors: so3_log(R_j R_i^T (R_j_i)^T) — 3 per prior;
      * constraints2d: cross-product of the two rays rotated to world,
        ||R_i^T b_i x R_j^T b_j|| — a pure-rotation epipolar alignment.
    Returns the refined (V, 3, 3) rotations.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import camera as cam_mod
    from ..geometry.rotations import so3_exp, so3_log

    V = len(R_init)
    R0 = jnp.asarray(R_init, jnp.float32)

    pi = jnp.asarray([p["view_i"] for p in rotation_priors], jnp.int32)
    pj = jnp.asarray([p["view_j"] for p in rotation_priors], jnp.int32)
    pR = jnp.asarray(
        np.stack([np.asarray(p["R_j_i"]) for p in rotation_priors])
        if rotation_priors
        else np.zeros((0, 3, 3)),
        jnp.float32,
    )

    def bearing(view, uv):
        if intr is None:
            b = jnp.concatenate([jnp.asarray(uv, jnp.float32), jnp.ones(1)], 0)
        else:
            ii = int(view_intrinsic[view]) if view_intrinsic is not None else 0
            row = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[ii], intr)
            p = cam_mod.ima2cam(row, jnp.asarray(uv, jnp.float32))
            p = cam_mod.remove_distortion(row.disto_kind, row.disto, p)
            b = jnp.concatenate([p, jnp.ones(1)], 0)
        return b / jnp.linalg.norm(b)

    ci = jnp.asarray([c["view_i"] for c in constraints2d], jnp.int32)
    cj = jnp.asarray([c["view_j"] for c in constraints2d], jnp.int32)
    bi = jnp.stack(
        [bearing(c["view_i"], c["uv_i"]) for c in constraints2d]
    ) if constraints2d else jnp.zeros((0, 3))
    bj = jnp.stack(
        [bearing(c["view_j"], c["uv_j"]) for c in constraints2d]
    ) if constraints2d else jnp.zeros((0, 3))

    live = jnp.ones((V, 1), jnp.float32)
    if fix_first:
        live = live.at[0].set(0.0)

    def residuals(w):  # w: (V, 3) tangents
        R = so3_exp(w * live) @ R0
        res = []
        if len(rotation_priors):
            E = R[pj] @ jnp.swapaxes(R[pi], -1, -2) @ jnp.swapaxes(pR, -1, -2)
            res.append(prior_weight * so3_log(E).reshape(-1))
        if len(constraints2d):
            wi = jnp.einsum("nji,nj->ni", R[ci], bi)  # R^T b -> world ray
            wj = jnp.einsum("nji,nj->ni", R[cj], bj)
            res.append(constraint_weight * jnp.cross(wi, wj).reshape(-1))
        return jnp.concatenate(res) if res else jnp.zeros((1,))

    w = jnp.zeros((V, 3), jnp.float32)
    for _ in range(iters):
        r, lin = jax.linearize(residuals, w)
        basis = jnp.eye(V * 3, dtype=jnp.float32).reshape(V * 3, V, 3)
        J = jax.vmap(lin)(basis)
        JtJ = J @ J.T + 1e-8 * jnp.eye(V * 3)
        g = J @ r
        step = -jnp.linalg.solve(JtJ, g).reshape(V, 3)
        w_new = w + step
        if float(jnp.sum(residuals(w_new) ** 2)) < float(jnp.sum(r * r)):
            w = w_new
    import numpy as _np

    return _np.asarray(so3_exp(w * live) @ R0)
