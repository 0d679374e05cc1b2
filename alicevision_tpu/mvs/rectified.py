"""Gather-free rectified plane sweep — the fast similarity-volume path.

The baseline volume builder (`plane_sweep.similarity_volume`) spends ~99%
of its time in D x T bilinear gathers (measured 3.7 s at 512x384, D=128,
T=4 on v5e; the SGM aggregation after it costs 47 ms). This module removes
the per-depth gathers entirely using epipolar rectification
(DESIGN.md §6b):

For a (ref, tcam) pair, rotate both views with the Fusiello rectifying
rotation R_rect whose x-axis is the baseline. In the rectified frames the
two cameras differ by a pure x-translation B, so matching at rectified
depth Z is a horizontal shift u_t = u_r - f B / Z. For OUR sweep planes
(fronto-parallel in the ORIGINAL ref frame, Z_orig = d), the rectified
depth at pixel (u, v) is d / w(u, v) with w LINEAR in (u, v):

    w(u, v) = r13 (u-cx)/fx + r23 (v-cy)/fy + r33      (rij = R_rect[i-1,j-1])

so the per-plane warp is u -> a_d * u + b_{d,v} — AFFINE per row, with the
scale a_d = 1 - s_d * r13/fx constant per plane and the shift linear in the
row index (s_d = fx B / d). That decomposes into two gather-free stages:

  1. per-row constant shift  — FFT phase multiplication (shift theorem),
     rows transformed once per tcam, phase applied per plane;
  2. plane-constant rescale  — one banded (W, W) interpolation matrix per
     plane shared by ALL rows: a single (H, W) @ (W, W) matmul on the MXU.

Remaining gathers: 2 image rectifications per tcam (T instead of D*T) and
one volume un-rectification per tcam whose indices are shared across all D
planes — laid out as a row-gather of the (H*W, D) matrix so every fetched
"row" is a contiguous D-vector (lane-aligned, coalesced), not a random
scalar.

ZNCC windows live in the rectified frame (rotated by R_rect vs the
reference CUDA kernels' axis-aligned patches, deviceSimilarityVolumeKernels
.cuh:109-235) — an equally valid photometric window; depth parity is
asserted against the gather path in tests.

Degenerate case: near-forward motion (baseline along the view axis) makes
the rectifying rotation extreme; `rectification_ok` gates those pairs back
to the gather path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .plane_sweep import SgmParams, warp_homography

_EPS = 1e-9


def fusiello_rectification(K_ref, K_t, R_rel, t_rel):
    """Rectifying rotation + pixel homographies for one (ref, tcam) pair.

    Returns (R_rect, H_ref, H_t, B): R_rect rows are the rectified axes in
    ref-frame coordinates; H_ref maps ORIGINAL ref pixels -> rectified
    pixels, H_t maps tcam pixels -> rectified(-tcam) pixels; B = baseline.
    """
    c2 = -R_rel.T @ t_rel  # tcam center in ref frame
    B = jnp.linalg.norm(c2)
    v1 = c2 / jnp.maximum(B, _EPS)
    z = jnp.array([0.0, 0.0, 1.0], K_ref.dtype)
    v2 = jnp.cross(z, v1)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2), _EPS)
    v3 = jnp.cross(v1, v2)
    R_rect = jnp.stack([v1, v2, v3])  # (3, 3), rows = new axes
    K_rect = K_ref
    H_ref = K_rect @ R_rect @ jnp.linalg.inv(K_ref)
    H_t = K_rect @ R_rect @ R_rel.T @ jnp.linalg.inv(K_t)
    return R_rect, H_ref, H_t, B


def rectification_ok(R_rel: np.ndarray, t_rel: np.ndarray, max_axial: float = 0.6):
    """Host-side gate: False for near-forward motion where rectification
    degenerates (baseline nearly parallel to the ref view axis)."""
    c2 = -np.asarray(R_rel).T @ np.asarray(t_rel)
    n = np.linalg.norm(c2)
    if n < 1e-9:
        return False
    return abs(c2[2]) / n < max_axial


def _inv_rdft_matrices(K: int, Wp: int):
    """Real inverse-rDFT matrix pair stacked as (2K, Wp): x = [Gr|Gi] @ CS.

    Implements exactly what irfft computes for an (..., K) spectrum of an
    even-length real signal: x[u] = sum_k coef_k (Gr_k cos(2 pi k u / Wp)
    - Gi_k sin(...)), coef = 2/Wp except 1/Wp at DC and Nyquist."""
    k = np.arange(K)
    u = np.arange(Wp)
    ang = 2.0 * np.pi * np.outer(k, u) / Wp
    coef = np.full(K, 2.0 / Wp)
    coef[0] = 1.0 / Wp
    coef[-1] = 1.0 / Wp
    C = (coef[:, None] * np.cos(ang)).astype(np.float32)
    S = (-coef[:, None] * np.sin(ang)).astype(np.float32)
    return np.concatenate([C, S], axis=0)


def _shift_scale_rows(img_f, a, b_rows, W_out):
    """Evaluate f(a * u + b_v) for every row v, gather-free.

    img_f: (H, K) precomputed rfft of zero-padded rows (pad width Wp).
    a: scalar per plane; b_rows: (H,) per-row shifts; W_out: output width.
    Returns (H, W_out).

    The inverse transform runs as a real DFT MATMUL on the MXU rather
    than jnp.fft.irfft — XLA's TPU FFT is the measured wall of the whole
    sweep (14.0 vs 2.0 ms per 256-plane tcam at 272x480 on v5e); the
    (2K, Wp) DFT matrix is a shared constant across all planes/tcams.
    tensorfloat32 keeps the evaluation in the pipeline's existing
    default-matmul precision class (max |diff| vs irfft ~8e-3, the same
    class as the banded rescale both paths already use)."""
    H, K = img_f.shape
    Wp = 2 * (K - 1)
    k = jnp.arange(K, dtype=jnp.float32)
    # shift theorem: (S_b f)(x) = f(x + b)  <=>  F[k] *= exp(+2i pi k b / Wp)
    phase = jnp.exp(2j * jnp.pi * k[None, :] * (b_rows[:, None] / Wp))
    G = img_f * phase
    CS = jnp.asarray(_inv_rdft_matrices(K, Wp))
    shifted = jnp.dot(
        jnp.concatenate([G.real, G.imag], axis=-1), CS,
        precision="tensorfloat32",
    )  # (H, Wp)
    # plane-constant rescale: out[u] = shifted[a * u], linear interpolation
    # as one banded (W_out, Wp) matrix -> a single matmul over all rows.
    u_out = jnp.arange(W_out, dtype=jnp.float32)
    src = a * u_out  # (W_out,)
    u_in = jnp.arange(Wp, dtype=jnp.float32)
    M = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - u_in[None, :]))
    return shifted @ M.T  # (H, W_out)


def _unrectify_volume(vol, H_ref, out_hw, fill):
    """Rotate a (D, Hr, Wr) rectified volume back to the original ref grid.

    The warp is depth-independent, so the gather indices are shared by all
    D planes: gather rows of the (Hr*Wr, D) matrix — each fetch is one
    contiguous D-vector.
    """
    D, Hr, Wr = vol.shape
    Ho, Wo = out_hw
    ys = jnp.arange(Ho, dtype=jnp.float32)
    xs = jnp.arange(Wo, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    p = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)  # (Ho, Wo, 3)
    q = jnp.einsum("ij,hwj->hwi", H_ref, p)
    z = q[..., 2]
    u = q[..., 0] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    v = q[..., 1] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)

    volT = vol.reshape(D, Hr * Wr).T  # (Hr*Wr, D) — D contiguous per row

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui, w):
        ok = (ui >= 0) & (ui < Wr) & (vi >= 0) & (vi < Hr)
        lin = jnp.clip(vi, 0, Hr - 1) * Wr + jnp.clip(ui, 0, Wr - 1)
        vals = jnp.take(volT, lin.reshape(-1), axis=0)  # (Ho*Wo, D) row gather
        vals = vals.reshape(*lin.shape, D)
        return jnp.where(ok[..., None], vals * w, fill * w), jnp.where(
            ok[..., None], w, 0.0
        )

    a0, w0 = tap(v0i, u0i, (1 - fu) * (1 - fv))
    a1, w1 = tap(v0i, u0i + 1, fu * (1 - fv))
    a2, w2 = tap(v0i + 1, u0i, (1 - fu) * fv)
    a3, w3 = tap(v0i + 1, u0i + 1, fu * fv)
    wsum = w0 + w1 + w2 + w3
    out = (a0 + a1 + a2 + a3) / jnp.maximum(wsum, _EPS)
    out = jnp.where(wsum > 0.99, out, fill)
    return jnp.moveaxis(out, -1, 0)  # (D, Ho, Wo)


def pair_similarity_rectified(
    ref_img: jnp.ndarray,  # (H, W)
    t_img: jnp.ndarray,  # (Ht, Wt)
    K_ref: jnp.ndarray,
    K_t: jnp.ndarray,
    R_rel: jnp.ndarray,
    t_rel: jnp.ndarray,
    depths: jnp.ndarray,  # (D,)
    params: SgmParams = SgmParams(),
) -> jnp.ndarray:
    """ZNCC similarity volume (D, H, W) for ONE tcam, gather-free per depth.
    Returns similarity in [-1, 1] with -1 where invalid."""
    H, W = ref_img.shape
    R_rect, H_ref, H_t, B = fusiello_rectification(K_ref, K_t, R_rel, t_rel)

    # one-time rectification warps (the only per-pair image gathers)
    ref_rect, ref_ok = warp_homography(ref_img, jnp.linalg.inv(H_ref), (H, W))
    t_rect, t_ok = warp_homography(t_img, jnp.linalg.inv(H_t), (H, W))

    fx = K_ref[0, 0]
    fy = K_ref[1, 1]
    cx = K_ref[0, 2]
    cy = K_ref[1, 2]
    alpha = R_rect[0, 2] / fx
    beta = R_rect[1, 2] / fy
    gamma = R_rect[2, 2] - alpha * cx - beta * cy
    s = fx * B / depths  # (D,)
    a = 1.0 - s * alpha  # (D,) plane-constant scales
    rows = jnp.arange(H, dtype=jnp.float32)
    b = -s[:, None] * (beta * rows[None, :] + gamma)  # (D, H) row shifts

    # rows are transformed once; the per-plane work is phase * irfft + matmul
    Wp = 2 * W
    t_f = jnp.fft.rfft(jnp.pad(t_rect, ((0, 0), (0, Wp - W))), axis=-1)
    # the warped-validity region needs NO second FFT channel: t_rect's
    # valid region is the homography image of a rectangle — a convex quad,
    # i.e. one u-interval [lo_v, hi_v] per row; validity of the shifted
    # sample at u_src is an analytic comparison (halves the dominant
    # per-plane FFT+matmul work, measured)
    u_axis = jnp.arange(W, dtype=jnp.float32)[None, :]
    lo_v = jnp.min(jnp.where(t_ok, u_axis, jnp.inf), axis=1)  # (H,)
    hi_v = jnp.max(jnp.where(t_ok, u_axis, -jnp.inf), axis=1)

    # per-pair hoisted reference moments (full support — the clamped-
    # texture convention of the CUDA patch reads, Patch.cuh
    # compNCCby3DptsYK); per plane only the warp-side moments remain,
    # fused into ONE stacked blur (5 channels in one call — the ZNCC was
    # the measured majority of the whole sweep at 256 planes). The bulk
    # (5·chunk, H, W) stacks blur via banded MATMULS (gaussian_blur_mm):
    # the single-channel conv lowering leaves the MXU idle — measured
    # 82 -> 21 ms for the full 16-chunk-stack load at 272x480, D=256, T=4
    # on v5e, within the TPU conv's own ~4e-3 precision class.
    from ..image.filtering import gaussian_blur_mm as gaussian_blur

    blur = lambda x: gaussian_blur(x, params.sigma_window)  # noqa: E731
    mr = blur(ref_rect)
    rr = jnp.maximum(blur(ref_rect * ref_rect) - mr * mr, 0.0)

    def per_chunk(idx):  # (C,) plane indices -> (C, H, W) similarity
        def one(i):
            warped = _shift_scale_rows(t_f, a[i], b[i], W)
            u_src = a[i] * u_axis + b[i][:, None]
            valid = (
                (u_src >= lo_v[:, None])
                & (u_src <= hi_v[:, None] - 1.0)
                & (u_src >= 0.0)
                & (u_src <= W - 1.0)
                & ref_ok
            )
            return jnp.where(valid, warped, 0.0), valid

        warps, valids = jax.vmap(one)(idx)
        w = valids.astype(warps.dtype)
        stack = jnp.stack(
            [w, warps, warps * warps, ref_rect[None] * warps,
             ref_rect[None] * w]
        )  # (5, C, H, W) — warps are already zeroed outside validity
        bl = blur(stack)
        wsum = bl[0].clip(1e-4)
        mt = bl[1] / wsum
        tt = bl[2] / wsum - mt * mt
        mr_w = bl[4] / wsum  # validity-masked ref mean for the cross term
        rt = bl[3] / wsum - mr_w * mt
        den = jnp.sqrt(jnp.maximum(rr[None] * tt, 1e-6))
        ncc = jnp.clip(rt / den, -1.0, 1.0)
        return jnp.where(bl[0] > 0.5, ncc, -1.0)

    D = depths.shape[0]
    ch = max(1, min(getattr(params, "rect_depth_chunk", 64), D))
    pad = (-D) % ch
    idx = jnp.arange(D + pad).clip(0, D - 1).reshape(-1, ch)
    sims_rect = jax.lax.map(per_chunk, idx).reshape(-1, H, W)[:D]

    # rotate the volume back to the original ref pixel grid (shared-index
    # row-gather: the one remaining gather, coalesced over D)
    return _unrectify_volume(sims_rect, H_ref, (H, W), fill=-1.0)


def _apply_tc_range(sim, depths, tc_depth_ranges, t):
    """Mask a per-pair similarity volume outside tcam t's depth sub-range
    (SgmDepthList depthsTcLimits, SgmDepthList.cpp:160-178)."""
    if tc_depth_ranges is None:
        return sim
    lim = jnp.asarray(tc_depth_ranges, depths.dtype)
    in_lim = (depths >= lim[t, 0]) & (depths <= lim[t, 1])  # (D,)
    return jnp.where(in_lim[:, None, None], sim, -1.0)


def similarity_volume_rectified(
    ref_img: jnp.ndarray,
    t_imgs: jnp.ndarray,  # (T, Ht, Wt)
    K_ref: jnp.ndarray,
    K_t: jnp.ndarray,  # (T, 3, 3)
    R_rel: jnp.ndarray,  # (T, 3, 3)
    t_rel: jnp.ndarray,  # (T, 3)
    depths: jnp.ndarray,
    params: SgmParams = SgmParams(),
    tc_depth_ranges: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for plane_sweep.similarity_volume: cost volume
    (D, H, W) in [0, 255], mean ZNCC over tcams."""
    T = t_imgs.shape[0]
    sims = []
    oks = []
    for t in range(T):
        sim = pair_similarity_rectified(
            ref_img, t_imgs[t], K_ref, K_t[t], R_rel[t], t_rel[t], depths, params
        )
        sim = _apply_tc_range(sim, depths, tc_depth_ranges, t)
        sims.append(sim)
        oks.append(jnp.any(sim > -1.0, axis=(-2, -1)))  # (D,) slice usable
    sims = jnp.stack(sims)  # (T, D, H, W)
    oks = jnp.stack(oks)  # (T, D)
    cnt = jnp.sum(oks, axis=0)  # (D,)
    sim = jnp.sum(sims * oks[:, :, None, None], axis=0) / jnp.maximum(
        cnt[:, None, None], 1
    )
    return (1.0 - sim) * 0.5 * 255.0


def similarity_volume_auto(
    ref_img: jnp.ndarray,
    t_imgs: jnp.ndarray,  # (T, Ht, Wt)
    K_ref: jnp.ndarray,
    K_t: jnp.ndarray,  # (T, 3, 3)
    R_rel: jnp.ndarray,  # (T, 3, 3)
    t_rel: jnp.ndarray,  # (T, 3)
    depths: jnp.ndarray,
    params: SgmParams = SgmParams(),
    tc_depth_ranges: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Cost volume (D, H, W) with per-pair path selection.

    `params.method` "rectified"/"gather" force a path; "auto" routes each
    (ref, tcam) pair through the gather-free rectified sweep when its
    geometry is non-degenerate (`rectification_ok`, host-side — requires
    concrete poses) and through the plane-homography gather sweep
    otherwise, then fuses the per-pair ZNCC volumes exactly like the
    reference fuses per-tcam similarities
    (ref: src/aliceVision/depthMap/cuda/planeSweeping/
    deviceSimilarityVolumeKernels.cuh:109-235 accumulates per-tcam NCC).
    """
    from .plane_sweep import similarity_volume

    method = getattr(params, "method", "auto")
    if method == "gather":
        return similarity_volume(
            ref_img, t_imgs, K_ref, K_t, R_rel, t_rel, depths, params,
            tc_depth_ranges=tc_depth_ranges,
        )
    if method == "rectified":
        return similarity_volume_rectified(
            ref_img, t_imgs, K_ref, K_t, R_rel, t_rel, depths, params,
            tc_depth_ranges=tc_depth_ranges,
        )

    T = t_imgs.shape[0]
    try:
        R_np = np.asarray(R_rel)
        t_np = np.asarray(t_rel)
        ok = [rectification_ok(R_np[t], t_np[t]) for t in range(T)]
    except Exception:  # traced values (vmap/jit) — gate unavailable
        ok = [False] * T
    if all(ok):
        return similarity_volume_rectified(
            ref_img, t_imgs, K_ref, K_t, R_rel, t_rel, depths, params,
            tc_depth_ranges=tc_depth_ranges,
        )
    if not any(ok):
        return similarity_volume(
            ref_img, t_imgs, K_ref, K_t, R_rel, t_rel, depths, params,
            tc_depth_ranges=tc_depth_ranges,
        )

    # mixed: fuse per-pair similarity volumes from both paths
    sims = []
    oks = []
    for t in range(T):
        if ok[t]:
            sim = pair_similarity_rectified(
                ref_img, t_imgs[t], K_ref, K_t[t], R_rel[t], t_rel[t], depths, params
            )
        else:
            cost = similarity_volume(
                ref_img,
                t_imgs[t : t + 1],
                K_ref,
                K_t[t : t + 1],
                R_rel[t : t + 1],
                t_rel[t : t + 1],
                depths,
                params,
            )
            sim = 1.0 - cost / 127.5
            # similarity_volume zeros unusable slices (cost 127.5); a real
            # ZNCC slice is never exactly 0 everywhere
            sim = _apply_tc_range(sim, depths, tc_depth_ranges, t)
            sims.append(sim)
            oks.append(
                jnp.any(
                    (jnp.abs(sim) > 1e-6) & (sim > -0.999), axis=(-2, -1)
                )
            )
            continue
        sim = _apply_tc_range(sim, depths, tc_depth_ranges, t)
        sims.append(sim)
        oks.append(jnp.any(sim > -1.0, axis=(-2, -1)))
    sims = jnp.stack(sims)
    okm = jnp.stack(oks)
    cnt = jnp.sum(okm, axis=0)
    sim = jnp.sum(sims * okm[:, :, None, None], axis=0) / jnp.maximum(
        cnt[:, None, None], 1
    )
    return (1.0 - sim) * 0.5 * 255.0
