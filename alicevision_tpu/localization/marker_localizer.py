"""Marker-based localization + trajectory refinement.

Counterparts of the reference's CCTagLocalizer (localize a camera against a
scene whose landmarks are CCTag marker centers,
ref: src/aliceVision/localization/CCTagLocalizer.hpp:37-108 — detection,
id-association, resection) and of the sequence-refinement pass
(ref: src/aliceVision/localization/optimization.cpp refineSequence — BA
over the localized frames with the 3D structure held FIXED, shared
intrinsics refined jointly).

TPU-native design: id association is an exact table lookup (markers match
by id, no descriptor distance), the pose comes from the batched robust P3P,
and refineSequence becomes a jitted alternation of (a) a vmapped per-frame
Gauss-Newton pose polish over the whole sequence at once and (b) a
closed-form 1-D Newton update of the shared focal from all frames'
residuals — landmarks fixed, exactly like the reference's
`refineSequence(..., b_refine_structure=false)` default.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import robust
from ..features.markers import MarkerDetection, detect_cctags
from .localizer import LocalizationResult


def localize_by_markers(
    key: jax.Array,
    detections: list[MarkerDetection],
    marker_world: dict[int, np.ndarray],
    focal_px: float,
    im_size: tuple[float, float],
    min_markers: int = 4,
    n_hyps: int = 64,
    max_error_px: float = 4.0,
) -> LocalizationResult:
    """Associate detected marker ids with known 3D marker positions and
    resect (CCTagLocalizer::localize). Needs >= min_markers visible."""
    pts2d, pts3d = [], []
    W, H = im_size
    for d in detections:
        if d.marker_id in marker_world:
            pts2d.append(d.center)
            pts3d.append(np.asarray(marker_world[d.marker_id], np.float64))
    if len(pts2d) < max(min_markers, 4):
        return LocalizationResult(np.eye(3), np.zeros(3), 0, False)
    world = np.stack(pts3d)
    uv = np.stack(pts2d)
    obs_norm = (uv - np.array([W / 2.0, H / 2.0])) / focal_px
    n = len(world)
    cap = max(8, 1 << int(np.ceil(np.log2(n))))
    world_p = np.pad(world, ((0, cap - n), (0, 0)))
    obs_p = np.pad(obs_norm, ((0, cap - n), (0, 0)))
    valid = np.zeros(cap, bool)
    valid[:n] = True
    rp = robust.robust_resection_p3p(
        key,
        jnp.asarray(world_p, jnp.float32),
        jnp.asarray(obs_p, jnp.float32),
        focal_px,
        im_size,
        valid=jnp.asarray(valid),
        n_hyps=n_hyps,
        max_error_px=max_error_px,
    )
    ni = int(rp.n_inliers)
    if ni < min_markers:
        return LocalizationResult(np.eye(3), np.zeros(3), ni, False)
    R = np.asarray(rp.R)
    return LocalizationResult(R, -R.T @ np.asarray(rp.t), ni, True)


def localize_image_by_markers(
    key: jax.Array,
    img: np.ndarray,
    marker_world: dict[int, np.ndarray],
    focal_px: float,
    **kw,
) -> LocalizationResult:
    """Detect CCTag ring markers in `img`, then localize_by_markers."""
    dets = detect_cctags(np.asarray(img, np.float32))
    H, W = np.asarray(img).shape[:2]
    return localize_by_markers(
        key, dets, marker_world, focal_px, (float(W), float(H)), **kw
    )


# ---------------------------------------------------------------------------
# Sequence refinement (optimization.cpp refineSequence analog)
# ---------------------------------------------------------------------------


class SequenceRefineResult(NamedTuple):
    R: jnp.ndarray  # (F, 3, 3) world->cam
    t: jnp.ndarray  # (F, 3)
    focal: jnp.ndarray  # scalar shared focal (px)
    rms_px: jnp.ndarray  # scalar final RMS reprojection error


def refine_sequence(
    R0: jnp.ndarray,  # (F, 3, 3)
    t0: jnp.ndarray,  # (F, 3)
    world: jnp.ndarray,  # (F, M, 3) fixed 3D points per frame (padded)
    uv: jnp.ndarray,  # (F, M, 2) pixel observations
    mask: jnp.ndarray,  # (F, M) valid observations
    focal0: float,
    principal: tuple[float, float],
    n_rounds: int = 4,
    pose_iters: int = 4,
    refine_focal: bool = True,
) -> SequenceRefineResult:
    """Joint Gauss-Newton over all frame poses + the shared focal, with the
    structure fixed. The normal equations are block-diagonal in the 6-dof
    poses with one dense coupling column to the shared focal, so each GN
    round eliminates the focal by a Schur complement over the batched 6x6
    pose blocks — the focal/forward-translation coupling that makes naive
    pose/focal alternation crawl is solved exactly (same structure as the
    reference's joint Ceres problem in optimization.cpp refineSequence).
    Every per-frame quantity is one vmapped batch; `n_rounds * pose_iters`
    joint Schur GN steps run in total (the two knobs exist for signature
    parity with the alternating API; each step is a full joint solve).
    """
    from ..geometry.rotations import so3_exp

    pp = jnp.asarray(principal, jnp.float32)
    world = jnp.asarray(world, jnp.float32)
    uv = jnp.asarray(uv, jnp.float32)
    w = jnp.asarray(mask).astype(jnp.float32)[..., None]  # (F, M, 1)

    def frame_residual(dx, df, Ri, ti, wi, uvi, f):
        Rn = so3_exp(dx[:3]) @ Ri
        tn = ti + dx[3:]
        Xc = wi @ Rn.T + tn
        proj = Xc[..., :2] / Xc[..., 2:].clip(1e-6)
        return ((f + df) * proj + pp - uvi).reshape(-1)

    def gn_step(carry, _):
        R, t, f = carry
        zeros6 = jnp.zeros((R.shape[0], 6), jnp.float32)
        zero1 = jnp.zeros((), jnp.float32)

        def lin(Ri, ti, wi, uvi, wgt):
            r = frame_residual(zeros6[0], zero1, Ri, ti, wi, uvi, f)
            Jp = jax.jacfwd(
                lambda d: frame_residual(d, zero1, Ri, ti, wi, uvi, f)
            )(zeros6[0])
            Jf = jax.jacfwd(
                lambda d: frame_residual(zeros6[0], d, Ri, ti, wi, uvi, f)
            )(zero1)
            wflat = jnp.repeat(wgt.reshape(-1), 2)
            r = r * wflat
            Jp = Jp * wflat[:, None]
            Jf = Jf * wflat
            A = Jp.T @ Jp + 1e-6 * jnp.eye(6)
            b = -Jp.T @ r
            g = Jp.T @ Jf
            h = Jf @ Jf
            c = -Jf @ r
            return A, b, g, h, c

        A, b, g, h, c = jax.vmap(lin)(R, t, world, uv, w)
        Ainv_b = jnp.linalg.solve(A, b[..., None])[..., 0]
        Ainv_g = jnp.linalg.solve(A, g[..., None])[..., 0]
        if refine_focal:
            S = jnp.sum(h) - jnp.einsum("fi,fi->", g, Ainv_g) + 1e-6
            df = (jnp.sum(c) - jnp.einsum("fi,fi->", g, Ainv_b)) / S
        else:
            df = jnp.zeros(())
        dx = Ainv_b - Ainv_g * df
        R = jax.vmap(lambda d, Ri: so3_exp(d[:3]) @ Ri)(dx, R)
        t = t + dx[:, 3:]
        return (R, t, f + df), None

    (R, t, f), _ = jax.lax.scan(
        gn_step,
        (jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
         jnp.asarray(focal0, jnp.float32)),
        None,
        length=n_rounds * max(1, pose_iters),
    )
    m = jnp.asarray(mask)
    Xc = jnp.einsum("fij,fnj->fni", R, world) + t[:, None, :]
    proj = Xc[..., :2] / Xc[..., 2:].clip(1e-6)
    err = (f * proj + pp - uv) * m.astype(jnp.float32)[..., None]
    rms = jnp.sqrt(jnp.sum(err**2) / jnp.maximum(m.sum() * 2, 1))
    return SequenceRefineResult(R, t, f, rms)
