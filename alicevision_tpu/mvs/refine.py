"""Depth-map refinement: local volume re-sampling + color-guided smoothing.

TPU-native counterpart of the reference's Refine stage
(ref: src/aliceVision/depthMap/Refine.hpp:66-83 refineRc —
upscale SGM depth, re-sample a thin volume of depth offsets around the SGM
estimate (halfNbDepths x nbSubsamples), pick the best, then iterative
color-guided depth/sim optimization
(cuda/.../deviceDepthSimilarityMapKernels.cuh:110-531)).

The thin refinement volume is per-pixel (each pixel has its own depth
hypotheses), so the homography trick of the SGM stage no longer applies —
instead each (offset, tcam) pair backprojects the current depth map +
offset and gathers the T-cam image through one bilinear warp; ZNCC again
via separable blurs.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..image.filtering import bilinear_sample, gaussian_blur

_EPS = 1e-6


def _project_with_depth(depth, K_ref, K_t, R_rel, t_rel):
    """Per-pixel projection of ref pixels at the given depth into a T-cam.

    depth: (H, W). Returns T-cam pixel coords (H, W, 2) and validity."""
    H, W = depth.shape
    ys = jnp.arange(H, dtype=depth.dtype)
    xs = jnp.arange(W, dtype=depth.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    x_cam = jnp.stack(
        [
            (gx - K_ref[0, 2]) / K_ref[0, 0] * depth,
            (gy - K_ref[1, 2]) / K_ref[1, 1] * depth,
            depth,
        ],
        axis=-1,
    )
    x_t = jnp.einsum("ij,hwj->hwi", R_rel, x_cam) + t_rel
    z = x_t[..., 2]
    ok = z > _EPS
    u = K_t[0, 0] * x_t[..., 0] / jnp.where(ok, z, 1.0) + K_t[0, 2]
    v = K_t[1, 1] * x_t[..., 1] / jnp.where(ok, z, 1.0) + K_t[1, 2]
    return jnp.stack([u, v], -1), ok


@partial(jax.jit, static_argnames=("n_offsets",))
def refine_depth_map(
    depth_sgm: jnp.ndarray,  # (H, W) SGM depth (<= 0 invalid)
    ref_img: jnp.ndarray,  # (H, W)
    t_imgs: jnp.ndarray,  # (T, H, W)
    K_ref: jnp.ndarray,
    K_t: jnp.ndarray,  # (T, 3, 3)
    R_rel: jnp.ndarray,  # (T, 3, 3)
    t_rel: jnp.ndarray,  # (T, 3)
    rel_step: float = 0.005,  # relative inverse-depth step per offset
    n_offsets: int = 15,  # halfNbDepths (RefineParams.hpp:19-25)
    sigma_window: float = 1.5,
):
    """Sample ZNCC at depth offsets around the SGM estimate per pixel and
    take the parabola-refined best (Refine::refineAndFuseDepthSimMap).

    The reference-image window moments are hoisted out of the offset sweep
    (they do not depend on the hypothesis): each (offset, tcam) pair then
    needs 4 separable blurs instead of 6. Measured on-chip at the reference
    operating point (960x544, 31 offsets, T=4) the stage is bound by the
    per-pixel bilinear gathers, not the blurs — 3.47 -> 3.44 s/view, and
    vmapping offsets wider (AV_REFINE_CHUNK>1) only inflates the warp
    intermediates (chunk 8 measured 13% slower). The hoisted ref moments
    use full support (no warp-validity mask), matching the reference's
    clamped-texture patch reads (Patch.cuh compNCCby3DptsYK)."""
    offsets = (jnp.arange(n_offsets * 2 + 1) - n_offsets).astype(ref_img.dtype)
    inv = 1.0 / jnp.maximum(depth_sgm, _EPS)

    blur = lambda x: gaussian_blur(x, sigma_window)  # noqa: E731
    mr = blur(ref_img)
    rr = jnp.maximum(blur(ref_img * ref_img) - mr * mr, 0.0)

    def score_at(off):
        d = 1.0 / jnp.maximum(inv * (1.0 + off * rel_step), _EPS)

        def per_t(timg, Kt, Rr, tr):
            uv, ok = _project_with_depth(d, K_ref, Kt, Rr, tr)
            warp = bilinear_sample(timg, uv)
            H, W = timg.shape
            inside = (
                ok
                & (uv[..., 0] >= 0)
                & (uv[..., 0] <= W - 1)
                & (uv[..., 1] >= 0)
                & (uv[..., 1] <= H - 1)
            )
            w = inside.astype(ref_img.dtype)
            wsum = blur(w).clip(1e-4)
            mt = blur(warp * w) / wsum
            tt = blur(warp * warp * w) / wsum - mt * mt
            rt = blur(ref_img * warp * w) / wsum - mr * mt
            den = jnp.sqrt(jnp.maximum(rr * tt, _EPS))
            ncc = jnp.clip(rt / den, -1.0, 1.0)
            return jnp.where(blur(w) > 0.5, ncc, -1.0)

        sims = jax.vmap(per_t)(t_imgs, K_t, R_rel, t_rel)
        return jnp.mean(sims, axis=0)

    # chunked vmap: wide enough to pack the VPU/MXU, chunked to bound the
    # (chunk, T, H, W) warp intermediates in HBM
    n_tot_off = offsets.shape[0]
    chunk = int(os.environ.get("AV_REFINE_CHUNK", "1"))
    pad = (-n_tot_off) % chunk
    off_p = jnp.pad(offsets, (0, pad))
    sims = jax.lax.map(
        jax.vmap(score_at), off_p.reshape(-1, chunk)
    ).reshape(-1, *ref_img.shape)[:n_tot_off]  # (2n+1, H, W)
    best = jnp.argmax(sims, axis=0)
    n_tot = offsets.shape[0]
    s0 = jnp.take_along_axis(sims, best[None], axis=0)[0]
    bm = jnp.clip(best - 1, 0, n_tot - 1)
    bp = jnp.clip(best + 1, 0, n_tot - 1)
    sm = jnp.take_along_axis(sims, bm[None], axis=0)[0]
    sp = jnp.take_along_axis(sims, bp[None], axis=0)[0]
    denom = sm - 2 * s0 + sp
    delta = jnp.where(jnp.abs(denom) > _EPS, 0.5 * (sm - sp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best > 0) & (best < n_tot - 1)
    off_star = offsets[best] + jnp.where(interior, delta, 0.0)

    inv_new = inv * (1.0 + off_star * rel_step)
    depth_new = 1.0 / jnp.maximum(inv_new, _EPS)
    depth_new = jnp.where(depth_sgm > 0, depth_new, depth_sgm)
    return depth_new, s0


@partial(jax.jit, static_argnames=("iterations",))
def color_guided_optimize(
    depth: jnp.ndarray,  # (H, W)
    ref_img: jnp.ndarray,  # (H, W)
    iterations: int = 20,
    sigma_spatial: float = 2.0,
    edge_gain: float = 30.0,
    step: float = 0.5,
):
    """Edge-preserving depth smoothing guided by the reference image
    (the color-optimization loop of Refine, deviceDepthSimilarityMapKernels
    :479-531): joint-bilateral-flavoured diffusion where image edges gate
    the depth flow. Runs in inverse depth to respect perspective."""
    inv = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, _EPS), 0.0)
    valid = depth > 0

    def edge_w(shift_fn):
        return jnp.exp(-edge_gain * jnp.abs(shift_fn(ref_img) - ref_img))

    shifts = [
        lambda a: jnp.roll(a, 1, 0),
        lambda a: jnp.roll(a, -1, 0),
        lambda a: jnp.roll(a, 1, 1),
        lambda a: jnp.roll(a, -1, 1),
    ]
    ws = [edge_w(s) for s in shifts]

    def body(inv, _):
        num = jnp.zeros_like(inv)
        den = jnp.zeros_like(inv)
        for s, w in zip(shifts, ws):
            nb = s(inv)
            ok = s(valid).astype(inv.dtype) * w
            num = num + ok * nb
            den = den + ok
        target = num / jnp.maximum(den, _EPS)
        new = jnp.where(den > 1e-4, inv + step * (target - inv), inv)
        return jnp.where(valid, new, inv), None

    inv, _ = jax.lax.scan(body, inv, None, length=iterations)
    return jnp.where(valid, 1.0 / jnp.maximum(inv, _EPS), depth)
