"""Depth-map refinement: local volume re-sampling + color-guided smoothing.

TPU-native counterpart of the reference's Refine stage
(ref: src/aliceVision/depthMap/Refine.hpp:66-83 refineRc —
upscale SGM depth, re-sample a thin volume of depth offsets around the SGM
estimate (halfNbDepths x nbSubsamples), pick the best, then iterative
color-guided depth/sim optimization
(cuda/.../deviceDepthSimilarityMapKernels.cuh:110-531)).

The thin refinement volume is per-pixel (each pixel has its own depth
hypotheses), so the SGM stage's per-plane homography trick does not apply
directly. Two paths:

  * `refine_depth_map` (gather path): each (offset, tcam) pair
    backprojects the current depth map + offset and samples the T-cam
    through one flat-take bilinear warp; ZNCC via separable blurs.
  * `refine_depth_map_auto` (fast path, default in the pipeline): per-pair
    Fusiello rectification turns every hypothesis into a pure horizontal
    shift, and one masked-shift lax.scan over the integer disparity range
    produces ALL offset warps with zero per-pixel gathers (see the section
    comment below and DESIGN.md §6c).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

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
            # the cross term uses the warp-validity-masked ref mean so the
            # numerator stays a covariance near validity boundaries; the
            # denominator keeps the hoisted full-support rr/mr (clamped-
            # texture semantics, Patch.cuh compNCCby3DptsYK)
            mr_w = blur(ref_img * w) / wsum
            rt = blur(ref_img * warp * w) / wsum - mr_w * mt
            den = jnp.sqrt(jnp.maximum(rr * tt, _EPS))
            ncc = jnp.clip(rt / den, -1.0, 1.0)
            return jnp.where(blur(w) > 0.5, ncc, -1.0)

        sims = jax.vmap(per_t)(t_imgs, K_t, R_rel, t_rel)
        return jnp.mean(sims, axis=0)

    # chunked vmap: wide enough to pack the VPU/MXU, chunked to bound the
    # (chunk, T, H, W) warp intermediates in HBM
    n_tot_off = offsets.shape[0]
    chunk = max(1, int(os.environ.get("AV_REFINE_CHUNK", "1")))
    pad = (-n_tot_off) % chunk
    off_p = jnp.pad(offsets, (0, pad))
    sims = jax.lax.map(
        jax.vmap(score_at), off_p.reshape(-1, chunk)
    ).reshape(-1, *ref_img.shape)[:n_tot_off]  # (2n+1, H, W)
    return _select_best_offset(sims, offsets, inv, rel_step, depth_sgm)


def _select_best_offset(sims, offsets, inv, rel_step, depth_sgm):
    """Argmax over the offset axis + parabola subsample refinement
    (Refine's retrieveBestDepth semantics). sims: (2n+1, H, W)."""
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


# ---------------------------------------------------------------------------
# Gather-free rectified refine (the fast path)
# ---------------------------------------------------------------------------
#
# The gather path above spends ~85% of its time in (2n+1) x T per-pixel
# bilinear warps. Rectification removes them: in the Fusiello-rectified
# frame of a (ref, tcam) pair, the hypothesis at relative inverse-depth
# offset k for rectified pixel (u, v) is a pure horizontal shift
#
#     disp_k(u, v) = fx * B * (alpha u + beta v + gamma) * inv(u, v) * (1 + k * rel_step)
#
# (same linear-in-(u,v) factor as mvs/rectified.py's SGM sweep; inv is the
# SGM inverse depth resampled into the rectified frame). All 2n+1 warps are
# then produced by ONE lax.scan over the integer disparity range: iteration
# s shifts the rectified tcam row block by s (a dynamic slice of a padded
# buffer, no gather) and accumulates it into every offset whose per-pixel
# integer disparity equals s, with bilinear fractional weights. ZNCC per
# offset via batched separable blurs, and the per-pair (2n+1, H, W) score
# volume returns to the original ref grid through the coalesced shared-index
# row-gather of `_unrectify_volume` (one gather per pair, amortised over all
# offsets). Measured on v5e at 544x960, 31 offsets, T=4: the scan evaluates
# all 31 warps in ~17 ms/pair vs ~530 ms for 31 bilinear gathers.
#
# ref: src/aliceVision/depthMap/Refine.hpp:66-83 (refineRc),
# cuda/planeSweeping/deviceSimilarityVolumeKernels.cuh:235
# (volume_refineSimilarity_kernel) — same hypothesis set, rectified warping.


def _disparity_bounds(K_ref, K_t, R_rel, t_rel, depth_range, rel_span, hw):
    """Host-side integer scan bounds for one pair: range of
    fx*B*(alpha u + beta v + gamma)*inv*(1 +- rel_span) over the image."""
    import numpy as np

    K_ref = np.asarray(K_ref, np.float64)
    R = np.asarray(R_rel, np.float64)
    t = np.asarray(t_rel, np.float64)
    c2 = -R.T @ t
    B = float(np.linalg.norm(c2))
    v1 = c2 / max(B, 1e-12)
    z = np.array([0.0, 0.0, 1.0])
    v2 = np.cross(z, v1)
    v2 /= max(np.linalg.norm(v2), 1e-12)
    v3 = np.cross(v1, v2)
    R_rect = np.stack([v1, v2, v3])
    fx, fy = K_ref[0, 0], K_ref[1, 1]
    cx, cy = K_ref[0, 2], K_ref[1, 2]
    alpha = R_rect[0, 2] / fx
    beta = R_rect[1, 2] / fy
    gamma = R_rect[2, 2] - alpha * cx - beta * cy
    H, W = hw
    corners_w = [alpha * u + beta * v + gamma
                 for u in (0.0, W - 1.0) for v in (0.0, H - 1.0)]
    inv_lo, inv_hi = 1.0 / depth_range[1], 1.0 / depth_range[0]
    vals = [fx * B * w * iv * f
            for w in corners_w for iv in (inv_lo, inv_hi)
            for f in (1.0 - rel_span, 1.0 + rel_span)]
    lo = int(np.floor(min(vals))) - 2
    hi = int(np.ceil(max(vals))) + 2
    # bucket to multiples of 64 so nearby scenes share one compile
    lo = (lo // 64) * 64
    hi = -((-hi) // 64) * 64
    return lo, hi


@partial(
    jax.jit,
    static_argnames=("rel_step", "n_offsets", "s_min", "s_max",
                     "sigma_window"),
)
def _pair_refine_scores_rectified(
    depth_sgm, ref_img, t_img, K_ref, K_t, R_rel, t_rel,
    rel_step, n_offsets, s_min, s_max, sigma_window=1.5,
):
    """(2n+1, H, W) refine score volume for ONE tcam in the ORIGINAL ref
    frame, with all warps produced by a single masked-shift scan."""
    from .plane_sweep import warp_homography
    from .rectified import _unrectify_volume, fusiello_rectification

    H, W = ref_img.shape
    R_rect, H_ref, H_t, B = fusiello_rectification(K_ref, K_t, R_rel, t_rel)
    H_ref_inv = jnp.linalg.inv(H_ref)

    ref_rect, ref_ok = warp_homography(ref_img, H_ref_inv, (H, W))
    t_rect, t_okb = warp_homography(t_img, jnp.linalg.inv(H_t), (H, W))
    inv_map = jnp.where(
        depth_sgm > 0, 1.0 / jnp.maximum(depth_sgm, _EPS), 0.0
    )
    # Bilinear resampling of the base inverse depth, masked to fully-valid
    # 4-tap neighbourhoods. Nearest-neighbour resampling here puts a
    # half-pixel-gradient error (~several 1/10-plane steps on real maps)
    # between the hypotheses the scores were computed at and the base the
    # selection applies offsets to — measured as a 20% accuracy LOSS of the
    # sub-sampled fine sweep vs the dense reference grid. Bilinear keeps
    # evaluation and selection consistent to O(curvature); pixels whose
    # neighbourhood spans an invalid sample stay invalid (no blending
    # across depth holes).
    inv_raw, _ = warp_homography(inv_map, H_ref_inv, (H, W))
    vmask, _ = warp_homography(
        (inv_map > 0).astype(jnp.float32), H_ref_inv, (H, W)
    )
    inv_rect = jnp.where(
        vmask > 0.999, inv_raw / jnp.maximum(vmask, 1e-6), 0.0
    )

    fx = K_ref[0, 0]
    fy = K_ref[1, 1]
    cx = K_ref[0, 2]
    cy = K_ref[1, 2]
    alpha = R_rect[0, 2] / fx
    beta = R_rect[1, 2] / fy
    gamma = R_rect[2, 2] - alpha * cx - beta * cy
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    wlin = alpha * us + beta * vs + gamma  # (H, W)
    disp0 = fx * B * wlin * inv_rect  # (H, W) base disparity

    n_off = 2 * n_offsets + 1
    offs = (jnp.arange(n_off, dtype=jnp.float32) - n_offsets) * rel_step

    # padded so iteration s can slice the tcam rows shifted by s for any
    # s in [s_min, s_max]
    pad_l = max(s_max, 0)
    pad_r = max(-s_min, 0)
    padded = jnp.pad(t_rect, ((0, 0), (pad_l, pad_r)))

    # exact warped-validity without a second scan channel: the rectified
    # tcam's valid region is the homography image of a rectangle — a convex
    # quad, i.e. ONE u-interval [lo(v), hi(v)] per row. A shifted bilinear
    # sample at p = u - disp is valid iff both taps lie in the interval.
    uu = us  # (1, W)
    lo_v = jnp.min(jnp.where(t_okb, uu, jnp.inf), axis=1, keepdims=True)
    hi_v = jnp.max(jnp.where(t_okb, uu, -jnp.inf), axis=1, keepdims=True)

    # bulk (5, CH, H, W) moment stacks blur as banded matmuls — the
    # single-channel conv lowering leaves the MXU idle (see
    # image/filtering.gaussian_blur_mm; same win as the SGM ZNCC)
    from ..image.filtering import gaussian_blur_mm

    blur = lambda x: gaussian_blur_mm(x, sigma_window)  # noqa: E731
    mr = blur(ref_rect)
    rr = jnp.maximum(blur(ref_rect * ref_rect) - mr * mr, 0.0)

    # Per-chunk windowed warps. A chunk of CH consecutive offsets spans a
    # per-pixel disparity interval of width <= max|disp| * CH * rel_step —
    # a handful of integer columns — so scanning the GLOBAL [s_min, s_max]
    # range (190+ steps at the reference operating point) pays (CH, H, W)
    # accumulator read+write traffic per step for steps that contribute
    # nothing to this chunk. Measured as the dense-RefineParams wall:
    # ~0.63 s/pair at 544x960, 301 offsets, bandwidth-bound on the carry.
    # Split it:
    #   1. extract the J-plane per-pixel window
    #      wnd[j] = t_rect[v, u - s0(u,v) - j]  (s0 = chunk disparity
    #      floor) with a global-range scan whose carry is only (J, H, W),
    #      unroll=8 so XLA keeps the carry live across unrolled steps (a
    #      flat J*H*W take was measured 2.5-6x SLOWER than this scan —
    #      TPU random-gather throughput, profile_refine_dense4.py);
    #   2. hat-sum the window into the (CH, H, W) warps over J steps:
    #      w_j = max(0, 1 - |p - j|), p = dk - s0, which on the two
    #      adjacent planes is exactly the (1-frac, frac) bilinear pair of
    #      the former global scan — BIT-EXACT output, measured 4.4x
    #      faster per chunk (112 -> 25 ms dense, profile_refine_dense5).
    CH = min(2 * n_offsets + 1, 64)
    J = min(
        int(np.ceil(max(abs(s_min), abs(s_max)) * CH * rel_step)) + 4,
        s_max - s_min + 3,
    )

    def chunk_scores(offs_c):
        """Scores for one chunk of offsets: windowed warps + ZNCC."""
        scale_k = (1.0 + offs_c)[:, None, None]  # (CH, 1, 1)
        # chunk window start: floor of the chunk's per-pixel disparity
        # minimum (offsets are monotone, so the extremes are the ends)
        s0 = jnp.floor(jnp.minimum(
            disp0 * (1.0 + offs_c[0]), disp0 * (1.0 + offs_c[-1])
        )) - 1.0  # (H, W)
        jjf = jnp.arange(J, dtype=jnp.float32)[:, None, None]

        def ext(acc, s):
            sl = jax.lax.dynamic_slice_in_dim(
                padded, pad_l - s, W, axis=1
            )  # (H, W): value at (v, u) = t_rect[v, u - s]
            m = s0[None] == s.astype(jnp.float32) - jjf
            return acc + jnp.where(m, sl[None], 0.0), None

        wnd, _ = jax.lax.scan(
            ext, jnp.zeros((J, H, W), jnp.float32),
            jnp.arange(s_min, s_max + 1, dtype=jnp.int32), unroll=8,
        )

        pw = disp0[None] * scale_k - s0[None]  # window-frame disparity

        def hat(acc, jw):
            jf, wj = jw
            w = jnp.maximum(1.0 - jnp.abs(pw - jf), 0.0)  # (CH, H, W)
            return acc + w * wj[None], None

        acc0 = jnp.zeros((offs_c.shape[0], H, W), jnp.float32)
        warps, _ = jax.lax.scan(
            hat, acc0, (jnp.arange(J, dtype=jnp.float32), wnd),
            unroll=min(J, 16),
        )
        disp_k = disp0[None] * scale_k
        p = uu[None] - disp_k
        valid = (
            (p >= lo_v[None])
            & (p <= hi_v[None] - 1.0)
            & ref_ok[None]
            & (inv_rect > 0)[None]
        )
        # all per-offset moment blurs in ONE stacked convolution (the same
        # fusion as the SGM sweep's ZNCC — separate conv calls per moment
        # measured ~2x slower)
        w = valid.astype(jnp.float32)
        wz = warps * w
        stack = jnp.stack(
            [w, wz, wz * warps, ref_rect[None] * wz, ref_rect[None] * w]
        )  # (5, CH, H, W)
        bl = blur(stack)
        wsum = bl[0].clip(1e-4)
        mt = bl[1] / wsum
        tt = bl[2] / wsum - mt * mt
        mr_w = bl[4] / wsum
        rt = bl[3] / wsum - mr_w * mt
        den = jnp.sqrt(jnp.maximum(rr[None] * tt, _EPS))
        ncc = jnp.clip(rt / den, -1.0, 1.0)
        return jnp.where(bl[0] > 0.5, ncc, -1.0)  # (CH, H, W)

    # Offset-chunking bounds HBM: the dense RefineParams grid (301
    # hypotheses) would otherwise stack (5, 301, H, W) moment planes —
    # ~3 GB at 544x960 plus warp temps, which EXHAUSTS v5e HBM (measured).
    # lax.map over <=64-offset chunks keeps peak memory at one chunk while
    # total scan/ZNCC work is unchanged. (CH is defined above — the window
    # size J is derived from it.)
    n_pad = (-n_off) % CH
    offs_p = jnp.concatenate([offs, jnp.full((n_pad,), offs[-1])])
    sims_rect = jax.lax.map(
        chunk_scores, offs_p.reshape(-1, CH)
    ).reshape(-1, H, W)[:n_off]
    return _unrectify_volume(sims_rect, H_ref, (H, W), fill=-1.0)


def _pair_refine_scores_gather(
    depth_sgm, ref_img, t_img, K_ref, K_t, R_rel, t_rel,
    rel_step, n_offsets, sigma_window=1.5,
):
    """(2n+1, H, W) refine scores for ONE tcam via per-offset bilinear
    warps — the fallback for pairs whose rectification is degenerate."""
    offsets = (
        jnp.arange(n_offsets * 2 + 1) - n_offsets
    ).astype(ref_img.dtype)
    inv = 1.0 / jnp.maximum(depth_sgm, _EPS)
    blur = lambda x: gaussian_blur(x, sigma_window)  # noqa: E731
    mr = blur(ref_img)
    rr = jnp.maximum(blur(ref_img * ref_img) - mr * mr, 0.0)
    H, W = t_img.shape

    def score_at(off):
        d = 1.0 / jnp.maximum(inv * (1.0 + off * rel_step), _EPS)
        uv, ok = _project_with_depth(d, K_ref, K_t, R_rel, t_rel)
        warp = bilinear_sample(t_img, uv)
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
        mr_w = blur(ref_img * w) / wsum
        rt = blur(ref_img * warp * w) / wsum - mr_w * mt
        den = jnp.sqrt(jnp.maximum(rr * tt, _EPS))
        ncc = jnp.clip(rt / den, -1.0, 1.0)
        return jnp.where(blur(w) > 0.5, ncc, -1.0)

    return jax.lax.map(score_at, offsets)


def refine_plan(
    K_ref,
    K_t,  # (T, 3, 3)
    R_rel,  # (T, 3, 3)
    t_rel,  # (T, 3)
    depth_range: tuple[float, float],
    hw: tuple[int, int],
    rel_step: float = 0.005,
    n_offsets: int = 15,
    method: str = "auto",
) -> tuple:
    """HOST-side per-pair dispatch plan for `refine_depth_map_auto`:
    a static tuple of ("rectified", s_lo, s_hi) / ("gather",) entries.

    Must be computed with CONCRETE poses (outside jit) — the plan is then a
    static closure argument, so the refine itself composes under one jit
    (the per-view pipeline is jitted whole in stages/bench; an eager
    composition on the axon relay measured 20x slower)."""
    import numpy as np

    from .rectified import rectification_ok

    T = int(np.asarray(K_t).shape[0])
    rel_span = n_offsets * rel_step
    if method == "gather":
        ok = [False] * T
    else:
        R_np = np.asarray(R_rel)
        t_np = np.asarray(t_rel)
        ok = [rectification_ok(R_np[t], t_np[t]) for t in range(T)]
        if method == "rectified" and not all(ok):
            raise ValueError("method='rectified' but a pair fails the gate")
    plan = []
    for t in range(T):
        if ok[t]:
            s_lo, s_hi = _disparity_bounds(
                K_ref, np.asarray(K_t)[t], np.asarray(R_rel)[t],
                np.asarray(t_rel)[t], depth_range, rel_span, hw,
            )
            plan.append(("rectified", s_lo, s_hi))
        else:
            plan.append(("gather",))
    return tuple(plan)


def _select_offset_quadfit(sims, offsets, inv, rel_step, depth_base):
    """Whole-sweep weighted quadratic fit instead of 3-point parabola.

    At sub-plane granularity neighbouring hypotheses differ by ~0.01 px of
    disparity — per-sample ZNCC differences sit at interpolation-noise
    level, so an argmax over the fine sweep wanders the flat peak
    (measured: fine argmax+parabola is 25% WORSE than the coarse stage on
    rendered GT, with either scorer). Fitting one quadratic to ALL fine
    scores averages that noise and recovers the vertex the dense sweep's
    envelope defines. Used for the fine stage only; the coarse stage keeps
    the argmax (its peak is well-resolved at plane steps).

    The fit is WEIGHTED by per-offset validity (masked lanes are clamped to
    -1.0 by the scorers): pixels whose fine sweep leaves the rectified
    target's valid interval would otherwise get a vertex biased toward the
    clamped -1 lanes. With all lanes valid the weighted normal equations
    reduce to the symmetric closed form."""
    n_tot = offsets.shape[0]
    k = offsets  # (n,)
    # per-pixel weighted LS quadratic fit s ~ a k^2 + b k + c: solve the
    # 3x3 normal equations with weights w = validity of each offset lane
    w = (sims > -0.999).astype(sims.dtype)  # (n, h, w)
    ks = [jnp.ones_like(k), k, k * k, k**3, k**4]
    S = [jnp.einsum("n,nhw->hw", kp, w) for kp in ks]  # S0..S4
    sw = sims * w
    b0 = jnp.sum(sw, axis=0)
    b1 = jnp.einsum("n,nhw->hw", k, sw)
    b2 = jnp.einsum("n,nhw->hw", k * k, sw)
    # cofactor solve of [[S4,S3,S2],[S3,S2,S1],[S2,S1,S0]] x = [b2,b1,b0]
    S0_, S1, S2_, S3, S4_ = S
    det = (
        S4_ * (S2_ * S0_ - S1 * S1)
        - S3 * (S3 * S0_ - S1 * S2_)
        + S2_ * (S3 * S1 - S2_ * S2_)
    )
    det_s = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    a = (
        b2 * (S2_ * S0_ - S1 * S1)
        - S3 * (b1 * S0_ - b0 * S1)
        + S2_ * (b1 * S1 - b0 * S2_)
    ) / det_s
    b = (
        S4_ * (b1 * S0_ - b0 * S1)
        - b2 * (S3 * S0_ - S1 * S2_)
        + S2_ * (S3 * b0 - b1 * S2_)
    ) / det_s
    enough = (jnp.sum(w, axis=0) >= 3) & (jnp.abs(det) > 1e-12)
    vertex = jnp.where(
        enough & (a < -1e-8), -b / (2 * jnp.minimum(a, -1e-8)), 0.0
    )
    off_star = jnp.clip(vertex, k[0], k[-1])
    inv_new = inv * (1.0 + off_star * rel_step)
    depth_new = 1.0 / jnp.maximum(inv_new, _EPS)
    depth_new = jnp.where(depth_base > 0, depth_new, depth_base)
    # report the score at the nearest sampled offset
    idx = jnp.clip(
        jnp.round(off_star - k[0]).astype(jnp.int32), 0, n_tot - 1
    )
    s_at = jnp.take_along_axis(sims, idx[None], axis=0)[0]
    return depth_new, s_at


def _refine_sweep(
    depth_base, ref_img, t_imgs, K_ref, K_t, R_rel, t_rel,
    rel_step, n_offsets, sigma_window, plan, select: str = "argmax",
):
    """One (2n+1)-hypothesis sweep around `depth_base`: per-pair rectified
    scan or gather fallback per the host plan, fused scores, best offset."""
    T = t_imgs.shape[0]
    sims = []
    for t in range(T):
        if plan[t][0] == "rectified":
            _, s_lo, s_hi = plan[t]
            sims.append(
                _pair_refine_scores_rectified(
                    depth_base, ref_img, t_imgs[t], K_ref, K_t[t],
                    R_rel[t], t_rel[t], rel_step, n_offsets, s_lo, s_hi,
                    sigma_window,
                )
            )
        else:
            sims.append(
                _pair_refine_scores_gather(
                    depth_base, ref_img, t_imgs[t], K_ref, K_t[t],
                    R_rel[t], t_rel[t], rel_step, n_offsets, sigma_window,
                )
            )
    sims = jnp.mean(jnp.stack(sims), axis=0)  # (2n+1, H, W)
    offsets = (
        jnp.arange(n_offsets * 2 + 1) - n_offsets
    ).astype(ref_img.dtype)
    inv = 1.0 / jnp.maximum(depth_base, _EPS)
    if select == "quadfit":
        return _select_offset_quadfit(sims, offsets, inv, rel_step, depth_base)
    return _select_best_offset(sims, offsets, inv, rel_step, depth_base)


def refine_depth_map_auto(
    depth_sgm: jnp.ndarray,  # (H, W) SGM depth (<= 0 invalid)
    ref_img: jnp.ndarray,  # (H, W)
    t_imgs: jnp.ndarray,  # (T, H, W)
    K_ref: jnp.ndarray,
    K_t: jnp.ndarray,  # (T, 3, 3)
    R_rel: jnp.ndarray,  # (T, 3, 3)
    t_rel: jnp.ndarray,  # (T, 3)
    depth_range: tuple[float, float] | None = None,  # (d_min, d_max) host
    rel_step: float = 0.005,
    n_offsets: int = 15,
    n_subsamples: int = 10,
    sigma_window: float = 1.5,
    method: str = "auto",
    plan: tuple | None = None,
):
    """Drop-in fast variant of `refine_depth_map`: per-pair dispatch to the
    gather-free rectified scan (default) or the bilinear-gather fallback
    for degenerate pairs, fused in the original ref frame.

    `n_subsamples` implements the reference's sub-plane granularity
    (RefineParams.hpp:23-24 halfNbDepths=15 x nbSubsamples=10: ~301
    hypotheses at 1/10-plane steps,
    cuda/planeSweeping/deviceSimilarityVolume.cu:477-494) as a TWO-STAGE
    sweep: a coarse plane-step pass over +-n_offsets brackets the optimum,
    then a fine pass at rel_step/n_subsamples granularity over +-1 plane
    around the stage-1 best evaluates the same grid the reference's dense
    volume contains near its argmax — 31+21 hypothesis evaluations instead
    of 301 with identical output granularity (equivalence on rendered GT
    pinned by tests/test_refine_subsample.py). n_subsamples=1 reproduces
    the single coarse sweep.

    Callers inside jit MUST pass `plan` (from `refine_plan`, computed with
    concrete poses); with plan=None the plan is derived here, which needs
    concrete poses and `depth_range`."""
    if plan is None:
        if depth_range is None:
            raise ValueError("need depth_range (or a precomputed plan)")
        plan = refine_plan(
            K_ref, K_t, R_rel, t_rel, depth_range,
            ref_img.shape, rel_step, n_offsets, method,
        )

    depth, sim = _refine_sweep(
        depth_sgm, ref_img, t_imgs, K_ref, K_t, R_rel, t_rel,
        rel_step, n_offsets, sigma_window, plan,
    )
    if n_subsamples > 1:
        # fine stage: +-1 coarse plane at 1/n_subsamples granularity around
        # the bracketed optimum (stage-1 disparities bound stage-2's, so
        # the same host plan covers both sweeps); whole-sweep quadratic
        # selection — see _select_offset_quadfit. The stage-1 output is
        # lightly smoothed in inverse depth first: its per-pixel
        # argmax/parabola jitter otherwise roughens every fine-stage warp's
        # ZNCC window (measured +12% median GT error vs a smooth base);
        # the +-1-plane window comfortably covers the smoothing residual.
        # The blur is MASK-NORMALIZED: invalid pixels (inv=0) must not be
        # averaged in, or every valid pixel within the blur radius of a
        # depth hole gets a base inflated past the +-1-plane fine window
        # that the quadfit cannot recover from (measured 0.045 -> 0.62
        # median error in the 2-px ring around a punched hole). Where the
        # local valid weight is low the unsmoothed stage-1 depth is kept.
        inv1 = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, _EPS), 0.0)
        m = (depth > 0).astype(inv1.dtype)
        wloc = gaussian_blur(m, 1.0)
        inv_s = jnp.where(
            wloc > 0.99, gaussian_blur(inv1, 1.0) / jnp.maximum(wloc, 1e-6),
            inv1,
        )
        base = jnp.where(depth > 0, 1.0 / jnp.maximum(inv_s, _EPS), depth)
        depth, sim = _refine_sweep(
            base, ref_img, t_imgs, K_ref, K_t, R_rel, t_rel,
            rel_step / n_subsamples, n_subsamples, sigma_window, plan,
            select="quadfit",
        )
    return depth, sim
