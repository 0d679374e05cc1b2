"""High-level robust model estimators: F / E / H / absolute pose.

TPU-native equivalents of the reference's geometric-verification functors
(ref: src/aliceVision/matchingImageCollection/GeometricFilterMatrix_F_AC.hpp,
_E_AC.hpp, _H_AC.hpp; sfm resection at
src/aliceVision/sfm/pipeline/sequential/ReconstructionEngine_sequentialSfM.hpp:71).
Each estimator: draw a fixed batch of minimal samples -> solve all hypotheses
closed-form -> score the full residual matrix -> AC-RANSAC selection ->
refit on inliers. Fully jittable at static (padded) correspondence counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..numeric import f32_matmuls

from .. import multiview as mv
from .ransac import (
    acransac_select,
    logalpha0_line,
    logalpha0_point,
    sample_minimal,
)


def _logalpha0_line_t(w, h):
    """logalpha0 for point-to-line models, traced-arg safe (w/h may be
    jnp scalars, e.g. an image size divided by a refined focal that must
    not bake into the jit cache key)."""
    area = w * h
    diam = jnp.sqrt(w * w + h * h)
    return jnp.log10(2.0 * diam / area)


def _logalpha0_point_t(w, h):
    return jnp.log10(jnp.pi / (w * h))


class RobustModel(NamedTuple):
    model: jnp.ndarray  # (3,3) F/E/H — or (R: (3,3), t: (3,)) packed 3x4 for pose
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    nfa: jnp.ndarray  # () float32
    threshold_sq: jnp.ndarray  # () adaptive threshold


@f32_matmuls
def robust_fundamental(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
) -> RobustModel:
    """AC-RANSAC fundamental matrix from pixel correspondences (N, 2)."""
    n = x1.shape[0]
    idx = sample_minimal(key, n, 8, n_hyps, valid)
    F = mv.fundamental_8pt(x1[idx], x2[idx])  # (H, 3, 3)
    res = mv.epipolar_distance_sq(F, x1[None], x2[None])  # (H, N)
    sel = acransac_select(
        res,
        sample_size=8,
        logalpha0=logalpha0_line(*im_size),
        mult_error=0.5,
        valid=valid,
        max_threshold_sq=max_error_px**2,
    )
    # Refit on inliers (masked 8pt over all inliers).
    F_best = mv.fundamental_8pt(x1, x2, mask=sel.inliers)
    res_ref = mv.epipolar_distance_sq(F_best, x1, x2)
    inl = (res_ref <= sel.threshold_sq) & (
        sel.inliers | (jnp.ones_like(sel.inliers) if valid is None else valid)
    )
    # Keep the refit only if it does not lose inliers.
    better = jnp.sum(inl) >= sel.n_inliers
    F_out = jnp.where(better, F_best, F[sel.best_hyp])
    inl_out = jnp.where(better, inl, sel.inliers)
    return RobustModel(F_out, inl_out, jnp.sum(inl_out), sel.best_nfa, sel.threshold_sq)


@f32_matmuls
def robust_essential(
    key: jax.Array,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    focal_mean: float,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
    solver: str = "5pt",
) -> RobustModel:
    """AC-RANSAC essential matrix from *normalized camera* correspondences.

    solver="5pt" draws minimal 5-correspondence samples through the Nistér
    solver (all polished candidate roots become hypotheses, invalid slots
    scored +inf), matching the reference's default relative-pose kernel
    (ref: multiview/relativePose/Essential5PSolver.hpp:17); "8pt" uses the
    linear essential solver. Residuals are epipolar distances in the
    normalized plane; the NFA alpha0 uses the image domain mapped through
    the mean focal, mirroring the reference's essential kernel
    normalization.
    """
    n = x1n.shape[0]
    if solver == "5pt":
        sample_size = 5
        idx = sample_minimal(key, n, 5, n_hyps, valid)
        Ec, ev = mv.essential_5pt(x1n[idx], x2n[idx])  # (H, 24, 3, 3)
        E = Ec.reshape((-1, 3, 3))
        res = mv.epipolar_distance_sq(E, x1n[None], x2n[None])
        res = jnp.where(ev.reshape(-1)[:, None], res, jnp.inf)
    else:
        sample_size = 8
        idx = sample_minimal(key, n, 8, n_hyps, valid)
        E = mv.essential_8pt(x1n[idx], x2n[idx])
        res = mv.epipolar_distance_sq(E, x1n[None], x2n[None])
    w, h = im_size
    sel = acransac_select(
        res,
        sample_size=sample_size,
        logalpha0=_logalpha0_line_t(w / focal_mean, h / focal_mean),
        mult_error=0.5,
        valid=valid,
        max_threshold_sq=(max_error_px / focal_mean) ** 2,
    )
    E_best = mv.essential_8pt(x1n, x2n, mask=sel.inliers)
    res_ref = mv.epipolar_distance_sq(E_best, x1n, x2n)
    v = jnp.ones_like(sel.inliers) if valid is None else valid
    inl = (res_ref <= sel.threshold_sq) & v
    better = jnp.sum(inl) >= sel.n_inliers
    E_out = jnp.where(better, E_best, E[sel.best_hyp])
    inl_out = jnp.where(better, inl, sel.inliers)
    return RobustModel(E_out, inl_out, jnp.sum(inl_out), sel.best_nfa, sel.threshold_sq)


@f32_matmuls
def robust_homography(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
) -> RobustModel:
    n = x1.shape[0]
    idx = sample_minimal(key, n, 4, n_hyps, valid)
    H = mv.homography_4pt(x1[idx], x2[idx])
    res = mv.homography_error_sq(H, x1[None], x2[None])
    sel = acransac_select(
        res,
        sample_size=4,
        logalpha0=logalpha0_point(*im_size),
        mult_error=1.0,
        valid=valid,
        max_threshold_sq=max_error_px**2,
    )
    H_best = mv.homography_4pt(x1, x2, mask=sel.inliers)
    res_ref = mv.homography_error_sq(H_best, x1, x2)
    v = jnp.ones_like(sel.inliers) if valid is None else valid
    inl = (res_ref <= sel.threshold_sq) & v
    better = jnp.sum(inl) >= sel.n_inliers
    H_out = jnp.where(better, H_best, H[sel.best_hyp])
    inl_out = jnp.where(better, inl, sel.inliers)
    return RobustModel(H_out, inl_out, jnp.sum(inl_out), sel.best_nfa, sel.threshold_sq)


class RobustPose(NamedTuple):
    R: jnp.ndarray  # (3, 3) world->camera
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray
    nfa: jnp.ndarray
    threshold_sq: jnp.ndarray  # in normalized-plane units


@f32_matmuls
def robust_resection_p3p(
    key: jax.Array,
    world: jnp.ndarray,
    obs_norm: jnp.ndarray,
    focal_mean: float,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 128,
    max_error_px: float = 4.0,
    refine_iters: int = 8,
) -> RobustPose:
    """AC-RANSAC absolute pose: P3P hypotheses + GN refit on inliers.

    world: (N, 3), obs_norm: (N, 2) undistorted normalized-plane obs.
    Mirrors the reference's resection step (P3P ACRANSAC + refinement,
    ref: multiview/resection/P3PSolver.hpp:19 + SfMLocalizer refine).
    """
    n = world.shape[0]
    idx = sample_minimal(key, n, 3, n_hyps, valid)
    ones = jnp.ones_like(obs_norm[..., :1])
    rays = jnp.concatenate([obs_norm, ones], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    R4, t4, ok4 = mv.p3p(world[idx], rays[idx])  # (H, 4, ...)

    Hh = R4.shape[0]
    Rf = R4.reshape(Hh * 4, 3, 3)
    tf = t4.reshape(Hh * 4, 3)
    okf = ok4.reshape(Hh * 4)

    # Residuals in the normalized plane for all candidates x all points.
    Xc = jnp.einsum("hij,nj->hni", Rf, world) + tf[:, None, :]
    z = Xc[..., 2]
    uv = Xc[..., :2] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)[..., None]
    res = jnp.sum((uv - obs_norm[None]) ** 2, axis=-1)
    res = jnp.where((z > 0) & okf[:, None], res, jnp.inf)

    w, h = im_size
    sel = acransac_select(
        res,
        sample_size=3,
        logalpha0=_logalpha0_point_t(w / focal_mean, h / focal_mean),
        mult_error=1.0,
        valid=valid,
        max_threshold_sq=(max_error_px / focal_mean) ** 2,
    )
    R0, t0 = Rf[sel.best_hyp], tf[sel.best_hyp]
    Rr, tr = mv.gauss_newton_pose_refine(
        R0, t0, world, obs_norm, mask=sel.inliers, iters=refine_iters
    )
    # Recompute inliers under the refined pose.
    Xc = jnp.einsum("ij,nj->ni", Rr, world) + tr[None, :]
    z = Xc[..., 2]
    uv = Xc[..., :2] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)[..., None]
    res_r = jnp.sum((uv - obs_norm) ** 2, axis=-1)
    v = jnp.ones_like(sel.inliers) if valid is None else valid
    inl = (res_r <= sel.threshold_sq) & (z > 0) & v
    better = jnp.sum(inl) >= sel.n_inliers
    R_out = jnp.where(better, Rr, R0)
    t_out = jnp.where(better, tr, t0)
    inl_out = jnp.where(better, inl, sel.inliers)
    return RobustPose(
        R_out, t_out, inl_out, jnp.sum(inl_out), sel.best_nfa, sel.threshold_sq
    )


@f32_matmuls
def robust_relative_pose(
    key: jax.Array,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    focal_mean: float,
    im_size: tuple[float, float],
    valid: jnp.ndarray | None = None,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
    solver: str = "5pt",
):
    """Essential + cheirality -> relative pose (the SfM initial-pair step,
    ref: sfm/pipeline/sequential makeInitialPair3D)."""
    rm = robust_essential(
        key, x1n, x2n, focal_mean, im_size, valid, n_hyps, max_error_px, solver
    )
    R4, t4 = mv.decompose_essential(rm.model)
    R, t, _ = mv.select_cheirality(R4, t4, x1n, x2n, mask=rm.inliers)
    return R, t, rm


# ---------------------------------------------------------------------------
# Batched (single-dispatch) wrappers.
#
# The eager estimators above cost dozens of dispatches per call; on a
# relay-attached TPU each dispatch is a host round trip (~25 ms measured),
# which made per-pair/per-view robust estimation the e2e wall (DESIGN.md
# §6d). These wrappers jit + vmap a whole bucket of same-capacity problems
# into ONE XLA dispatch — the TPU analog of the reference's OpenMP loop
# over pairs (matchingImageCollection/GeometricFilter.hpp:60-75) and its
# group resection (ReconstructionEngine_sequentialSfM.cpp:407-520).
# focal_mean stays a traced scalar so intrinsics refinement never recompiles.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px"))
def robust_fundamental_batch(
    keys, x1, x2, im_size, valid, n_hyps: int = 256, max_error_px: float = 4.0
) -> RobustModel:
    """AC-RANSAC F for a (B, N, 2) bucket of pairs — one dispatch."""
    return jax.vmap(
        lambda k, a, b, v: robust_fundamental(
            k, a, b, im_size, v, n_hyps, max_error_px
        )
    )(keys, x1, x2, valid)


@partial(
    jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px", "refine_iters")
)
def robust_resection_p3p_batch(
    keys,
    world,
    obs_norm,
    focal_mean,
    im_size,
    valid,
    n_hyps: int = 128,
    max_error_px: float = 4.0,
    refine_iters: int = 8,
) -> RobustPose:
    """Batched robust resection: (B, N, 3) worlds, (B, N, 2) normalized
    observations, shared focal — ONE dispatch for a whole resection group."""
    return jax.vmap(
        lambda k, w, o, v: robust_resection_p3p(
            k, w, o, focal_mean, im_size, v, n_hyps, max_error_px, refine_iters
        )
    )(keys, world, obs_norm, valid)


class RelativePoseBatch(NamedTuple):
    R: jnp.ndarray  # (B, 3, 3)
    t: jnp.ndarray  # (B, 3)
    inliers: jnp.ndarray  # (B, N)
    n_inliers: jnp.ndarray  # (B,)


@partial(
    jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px", "solver")
)
def robust_relative_pose_batch(
    keys,
    x1n,
    x2n,
    focal_mean,
    im_size,
    valid,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
    solver: str = "5pt",
) -> RelativePoseBatch:
    """Batched initial-pair relative pose — one dispatch for all candidate
    pairs of the SfM initialization (makeInitialPair3D candidates)."""

    def one(k, a, b, v):
        R, t, rm = robust_relative_pose(
            k, a, b, focal_mean, im_size, v, n_hyps, max_error_px, solver
        )
        return R, t, rm.inliers, rm.n_inliers

    R, t, inl, n_inl = jax.vmap(one)(keys, x1n, x2n, valid)
    return RelativePoseBatch(R, t, inl, n_inl)
