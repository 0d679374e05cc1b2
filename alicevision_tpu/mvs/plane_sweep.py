"""Plane-sweep similarity volumes + SGM depth estimation.

TPU-native re-design of the reference's CUDA depth-map core
(ref: src/aliceVision/depthMap/Sgm.cpp:117-158 sgmRc pipeline,
cuda/planeSweeping/deviceSimilarityVolumeKernels.cuh:109-235
volume_computeSimilarity_kernel, :658-726 SGM aggregation,
:393-515 best-depth retrieval; SgmParams.hpp:17-55 defaults).

The CUDA kernel computes one NCC patch per (x, y, depth, tcam) thread.
The TPU formulation instead sweeps fronto-parallel planes of the reference
camera: for every (depth, tcam) the T-cam image is warped into the
reference view through the plane homography, and windowed ZNCC between
reference and warp is computed with separable Gaussian blurs — turning the
whole volume into batched image-wide convolutions and element-wise algebra
(VPU/MXU-friendly, no gather per pixel beyond one bilinear warp).

SGM cost aggregation is the classic 4-direction dynamic program
(the reference sweeps its "YX" axes in both directions): a lax.scan along
the sweep axis, vectorized over the orthogonal axis and the depth axis,
with the image-gradient-adaptive P2 of the reference.

All defaults mirror SgmParams: P1=10, P2 weight=100, window ~ wsh*2+1,
inverse-depth plane spacing from the SfM depth range.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..image.filtering import gaussian_blur

_EPS = 1e-6


class SgmParams(NamedTuple):
    n_depths: int = 128
    sigma_window: float = 2.0  # Gaussian window of the ZNCC (≈ wsh=4 box)
    p1: float = 10.0
    p2_weight: float = 100.0
    p2_alpha: float = 10.0  # gradient adaptivity of P2 (deviceSimilarityVolumeKernels.cuh:597-656)
    cost_clip: float = 1.0  # similarity in [-1, 1] -> cost in [0, cost_clip*255]
    depth_chunk: int = 8  # depth planes evaluated in parallel (memory knob)
    # similarity-volume builder: "auto" gates per (ref, tcam) pair on
    # rectifiability (host-side) and uses the gather-free rectified sweep
    # where valid; "gather" / "rectified" force one path.
    method: str = "auto"
    # the rectified path is FFT/matmul bound, not gather bound — it wants
    # much larger depth chunks (measured on v5e: chunk 8 -> 4.5 s,
    # chunk 64 -> 0.26 s at 512x384xD128xT4).
    rect_depth_chunk: int = 64
    # edge-aware cost aggregation: guided-filter the fused similarity
    # volume with the reference image as guide (the separable TPU analog
    # of the CUDA gammaC adaptive-support patch weighting, Patch.cuh:467;
    # cost-volume filtering per Hosni et al.). 0 disables.
    guided_radius: int = 0
    guided_eps: float = 1e-3
    # 4 = the reference's default "YX" axes both ways (SgmParams.hpp:34);
    # 8 adds the four diagonal paths (classic Hirschmuller SGM).
    n_dirs: int = 4


def inverse_depth_planes(d_min: float, d_max: float, n: int) -> jnp.ndarray:
    """Plane depths sampled uniformly in inverse depth (SgmDepthList.cpp)."""
    inv = jnp.linspace(1.0 / d_max, 1.0 / d_min, n)
    return 1.0 / inv[::-1]  # ascending depth


def plane_homography(K_ref, K_t, R_rel, t_rel, depth):
    """Homography mapping reference pixels -> T-cam pixels for the
    fronto-parallel plane at `depth` (n = [0,0,1] in the ref frame).

    H = K_t (R + t n^T / d) K_ref^-1 with (R, t) = pose of tcam in ref frame.
    """
    n = jnp.array([0.0, 0.0, 1.0])
    H = R_rel + jnp.outer(t_rel, n) / depth
    return K_t @ H @ jnp.linalg.inv(K_ref)


def warp_homography(img: jnp.ndarray, H: jnp.ndarray, out_hw):
    """Inverse-warp: sample img at H @ (x, y, 1) for each output pixel."""
    Hh, Ww = out_hw
    ys = jnp.arange(Hh, dtype=jnp.float32)
    xs = jnp.arange(Ww, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    p = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    q = jnp.einsum("ij,hwj->hwi", H, p)
    z = q[..., 2]
    u = q[..., 0] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    v = q[..., 1] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)

    H_im, W_im = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    flat = img.reshape(-1)  # flat 1-D take: ~25x faster than 2-D gather on TPU

    def tap(vi, ui, w):
        ok = (ui >= 0) & (ui < W_im) & (vi >= 0) & (vi < H_im)
        lin = jnp.clip(vi, 0, H_im - 1) * W_im + jnp.clip(ui, 0, W_im - 1)
        val = jnp.take(flat, lin.reshape(-1)).reshape(lin.shape)
        return jnp.where(ok, val * w, 0.0), jnp.where(ok, w, 0.0)

    a0, w0 = tap(v0i, u0i, (1 - fu) * (1 - fv))
    a1, w1 = tap(v0i, u0i + 1, fu * (1 - fv))
    a2, w2 = tap(v0i + 1, u0i, (1 - fu) * fv)
    a3, w3 = tap(v0i + 1, u0i + 1, fu * fv)
    wsum = w0 + w1 + w2 + w3
    out = (a0 + a1 + a2 + a3) / jnp.maximum(wsum, _EPS)
    valid = (wsum > 0.99) & (z > _EPS)
    return jnp.where(valid, out, 0.0), valid


def zncc(ref: jnp.ndarray, warp: jnp.ndarray, valid: jnp.ndarray, sigma: float):
    """Windowed zero-mean NCC between two images via Gaussian moments
    (the separable-filter equivalent of the CUDA per-patch loop,
    Patch.cuh:467-531)."""
    w = valid.astype(ref.dtype)
    blur = lambda x: gaussian_blur(x, sigma)
    wsum = blur(w).clip(1e-4)
    mr = blur(ref * w) / wsum
    mt = blur(warp * w) / wsum
    rr = blur(ref * ref * w) / wsum - mr * mr
    tt = blur(warp * warp * w) / wsum - mt * mt
    rt = blur(ref * warp * w) / wsum - mr * mt
    den = jnp.sqrt(jnp.maximum(rr * tt, _EPS))
    ncc = rt / den
    cov = blur(w)  # coverage fraction
    return jnp.where(cov > 0.5, jnp.clip(ncc, -1.0, 1.0), -1.0)


def similarity_volume(
    ref_img: jnp.ndarray,  # (H, W) grayscale/luma
    t_imgs: jnp.ndarray,  # (T, H, W)
    K_ref: jnp.ndarray,  # (3, 3)
    K_t: jnp.ndarray,  # (T, 3, 3)
    R_rel: jnp.ndarray,  # (T, 3, 3) tcam pose in ref frame
    t_rel: jnp.ndarray,  # (T, 3)
    depths: jnp.ndarray,  # (D,)
    params: SgmParams = SgmParams(),
    tc_depth_ranges: jnp.ndarray | None = None,  # (T, 2) per-tcam [lo, hi]
) -> jnp.ndarray:
    """Similarity volume (D, H, W): mean ZNCC across T-cams per depth plane.

    Fully tensorized: all (depth, tcam) warps are computed as ONE flat
    1D take per bilinear tap over the concatenated T-cam images, and the
    ZNCC filters run on the whole (chunk*T, H, W) stack. vmapping the 2D
    gather instead lowers catastrophically on TPU (~10 ms per slice vs
    ~0.06 ms for the equivalent flat take). Chunking over depths bounds
    peak memory (params.depth_chunk planes in flight).

    Cost convention matches the reference (0 good .. 255 bad) so the SGM
    stage is interchangeable.
    """
    Hh, Ww = ref_img.shape
    T, Ht, Wt = t_imgs.shape  # T-cam dims may differ from the ref (tiling)
    D = depths.shape[0]
    flat_imgs = t_imgs.reshape(-1)

    Kinv = jnp.linalg.inv(K_ref)

    ys = jnp.arange(Hh, dtype=ref_img.dtype)
    xs = jnp.arange(Ww, dtype=ref_img.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    rays = jnp.einsum("ij,hwj->hwi", Kinv, pix)  # K_ref^-1 p, depth-free

    # Per-tcam homography pieces: H(d) = K_t R K^-1 + (K_t t) (n^T K^-1) / d
    A = jnp.einsum("tij,tjk,kl->til", K_t, R_rel, Kinv)  # (T, 3, 3)
    b = jnp.einsum("tij,tj->ti", K_t, t_rel)  # (T, 3)

    def chunk_volume(depth_chunk):  # (C,) -> (C, H, W)
        C = depth_chunk.shape[0]
        # q = A rays + b (n^T K^-1 p) / d ; note n^T K^-1 p = rays_z
        base = jnp.einsum("til,hwl->thwi", A, pix)  # (T, H, W, 3)
        scale = rays[..., 2][None, None, :, :, None]  # z-component of K^-1 p
        q = (
            base[None]
            + b[None, :, None, None, :] * scale / depth_chunk[:, None, None, None, None]
        )  # (C, T, H, W, 3)
        z = q[..., 2]
        zs = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
        u = q[..., 0] / zs
        v = q[..., 1] / zs

        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        t_off = (jnp.arange(T, dtype=jnp.int32) * (Ht * Wt))[None, :, None, None]

        def tap(vi, ui, w):
            ok = (ui >= 0) & (ui < Wt) & (vi >= 0) & (vi < Ht)
            lin = t_off + jnp.clip(vi, 0, Ht - 1) * Wt + jnp.clip(ui, 0, Wt - 1)
            val = jnp.take(flat_imgs, lin.reshape(-1)).reshape(lin.shape)
            return jnp.where(ok, val * w, 0.0), jnp.where(ok, w, 0.0)

        a0, w0 = tap(v0i, u0i, (1 - fu) * (1 - fv))
        a1, w1 = tap(v0i, u0i + 1, fu * (1 - fv))
        a2, w2 = tap(v0i + 1, u0i, (1 - fu) * fv)
        a3, w3 = tap(v0i + 1, u0i + 1, fu * fv)
        wsum = w0 + w1 + w2 + w3
        warp = (a0 + a1 + a2 + a3) / jnp.maximum(wsum, _EPS)
        valid = (wsum > 0.99) & (z > _EPS)
        if tc_depth_ranges is not None:
            # per-T-cam depth sub-range (SgmDepthList depthsTcLimits):
            # planes outside a tcam's meaningful range contribute nothing
            lim = jnp.asarray(tc_depth_ranges, depth_chunk.dtype)
            in_lim = (depth_chunk[:, None] >= lim[None, :, 0]) & (
                depth_chunk[:, None] <= lim[None, :, 1]
            )  # (C, T)
            valid = valid & in_lim[..., None, None]
        warp = jnp.where(valid, warp, 0.0)

        # ZNCC of the whole (C*T, H, W) stack against the broadcast ref.
        refb = jnp.broadcast_to(ref_img, (C, T, Hh, Ww))
        sims = zncc(refb, warp, valid, params.sigma_window)  # (C, T, H, W)
        oks = jnp.any(valid, axis=(-2, -1))  # (C, T)
        cnt = jnp.sum(oks, axis=-1)  # (C,)
        sim = jnp.sum(sims * oks[..., None, None], axis=1) / jnp.maximum(
            cnt[:, None, None], 1
        )
        return sim

    ch = max(1, min(params.depth_chunk, D))
    pad = (-D) % ch
    depths_p = jnp.concatenate([depths, jnp.full((pad,), depths[-1])]) if pad else depths
    chunks = depths_p.reshape(-1, ch)
    sims = jax.lax.map(chunk_volume, chunks).reshape(-1, Hh, Ww)[:D]
    # similarity [-1, 1] -> cost [0, 255] (reference stores unsigned cost)
    cost = (1.0 - sims) * 0.5 * 255.0
    return cost


# ---------------------------------------------------------------------------
# SGM aggregation
# ---------------------------------------------------------------------------


def _directional_pass(cost: jnp.ndarray, p2_img: jnp.ndarray, p1: float):
    """One forward SGM sweep along axis 1 of cost (S, N, D) with per-position
    adaptive P2 (S, N). Returns aggregated costs of same shape.

    Recurrence (vectorized over N and D, scanned over S):
      L_s = C_s + min(L_{s-1}, L_{s-1}(d+-1) + P1, min_d L_{s-1} + P2) - min_d L_{s-1}
    """
    S = cost.shape[0]

    def step(carry, inp):
        L_prev = carry  # (N, D)
        C, P2 = inp  # (N, D), (N,)
        m = jnp.min(L_prev, axis=-1, keepdims=True)  # (N, 1)
        up = jnp.concatenate([L_prev[:, :1], L_prev[:, :-1]], axis=1)
        dn = jnp.concatenate([L_prev[:, 1:], L_prev[:, -1:]], axis=1)
        best = jnp.minimum(
            jnp.minimum(L_prev, jnp.minimum(up, dn) + p1), m + P2[:, None]
        )
        L = C + best - m
        return L, L

    L0 = cost[0]
    _, Ls = jax.lax.scan(step, L0, (cost[1:], p2_img[1:]), unroll=4)
    return jnp.concatenate([L0[None], Ls], axis=0)


def _diagonal_pass(cost: jnp.ndarray, p2_img: jnp.ndarray, p1: float,
                   shift: int):
    """Diagonal SGM sweep over rows of cost (H, N, D): position x of row y
    chains to position x-shift of row y-1 (shift = +1 -> down-right path).
    Same recurrence as _directional_pass with the carry row displaced."""

    def move(L):  # displace the previous row along x (edge replicate)
        if shift == 1:
            return jnp.concatenate([L[:1], L[:-1]], axis=0)
        return jnp.concatenate([L[1:], L[-1:]], axis=0)

    def step(carry, inp):
        C, P2 = inp
        L_prev = move(carry)
        m = jnp.min(L_prev, axis=-1, keepdims=True)
        up = jnp.concatenate([L_prev[:, :1], L_prev[:, :-1]], axis=1)
        dn = jnp.concatenate([L_prev[:, 1:], L_prev[:, -1:]], axis=1)
        best = jnp.minimum(
            jnp.minimum(L_prev, jnp.minimum(up, dn) + p1), m + P2[:, None]
        )
        L = C + best - m
        return L, L

    L0 = cost[0]
    _, Ls = jax.lax.scan(step, L0, (cost[1:], p2_img[1:]), unroll=4)
    return jnp.concatenate([L0[None], Ls], axis=0)


def _use_pallas() -> bool:
    # Measured on TPU v5e (480x360x128): XLA lax.scan 42 ms vs Pallas 48 ms
    # for the full 4-direction aggregate — the serial chain dominates and
    # XLA's scan is already near the floor, so the Pallas kernel stays an
    # opt-in alternative (use_pallas=True) rather than the default.
    return False


@partial(jax.jit, static_argnames=("params", "use_pallas"))
def sgm_aggregate(
    cost: jnp.ndarray,  # (D, H, W)
    ref_img: jnp.ndarray,  # (H, W) for gradient-adaptive P2
    params: SgmParams = SgmParams(),
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """4-direction SGM (left/right/up/down), the reference's "YX" both ways.

    On TPU the directional recurrence runs as a Pallas kernel with the scan
    carry resident in VMEM (ops/sgm_pallas.py); elsewhere it falls back to
    the lax.scan formulation.
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas:
        from ..ops.sgm_pallas import sgm_directional_pass

        dir_pass = lambda c, p2, p1: sgm_directional_pass(c, p2, p1)
    else:
        dir_pass = _directional_pass
    vol = jnp.moveaxis(cost, 0, -1)  # (H, W, D)

    # Adaptive P2: large in flat areas, small across strong gradients
    # (deviceSimilarityVolumeKernels.cuh:597-656 uses grad-based weighting).
    gx = jnp.abs(jnp.roll(ref_img, -1, 1) - ref_img)
    gy = jnp.abs(jnp.roll(ref_img, -1, 0) - ref_img)

    def p2_of(grad):
        return params.p1 + (params.p2_weight - params.p1) * jnp.exp(
            -params.p2_alpha * grad
        )

    p1 = params.p1

    # The serial scan dominates wall time, so opposite directions are
    # batched into ONE pass each (forward + flipped stacked on the row axis)
    # — half the sequential chains for the same FLOPs.
    H, W = ref_img.shape

    # horizontal sweeps: scan over W; rows (H) are the batch axis
    c_lr = jnp.moveaxis(vol, 1, 0)  # (W, H, D)
    p2x = jnp.moveaxis(p2_of(gx), 1, 0)  # (W, H)
    both_h = dir_pass(
        jnp.concatenate([c_lr, c_lr[::-1]], axis=1),
        jnp.concatenate([p2x, p2x[::-1]], axis=1),
        p1,
    )
    total = jnp.moveaxis(both_h[:, :H] + both_h[::-1, H:], 0, 1)

    # vertical sweeps: scan over H
    p2y = p2_of(gy)
    both_v = dir_pass(
        jnp.concatenate([vol, vol[::-1]], axis=1),
        jnp.concatenate([p2y, p2y[::-1]], axis=1),
        p1,
    )
    total = total + both_v[:, :W] + both_v[::-1, W:]

    if params.n_dirs >= 8:
        # four diagonal paths, two per scan (forward + both-axes-flipped
        # share one doubled-batch scan, like the axis passes above)
        gd1 = jnp.abs(jnp.roll(jnp.roll(ref_img, -1, 0), -1, 1) - ref_img)
        gd2 = jnp.abs(jnp.roll(jnp.roll(ref_img, -1, 0), 1, 1) - ref_img)
        p2d1 = p2_of(gd1)
        p2d2 = p2_of(gd2)

        def flip_both(a):
            return a[::-1, ::-1]

        # down-right (+1) + up-left (its both-axes flip)
        d1 = _diagonal_pass(
            jnp.concatenate([vol, flip_both(vol)], axis=1),
            jnp.concatenate([p2d1, flip_both(p2d1)], axis=1),
            p1, shift=1,
        )
        total = total + d1[:, :W] + flip_both(d1[:, W:])
        # down-left (-1) + up-right
        d2 = _diagonal_pass(
            jnp.concatenate([vol, flip_both(vol)], axis=1),
            jnp.concatenate([p2d2, flip_both(p2d2)], axis=1),
            p1, shift=-1,
        )
        total = total + d2[:, :W] + flip_both(d2[:, W:])

    return jnp.moveaxis(total, -1, 0)  # (D, H, W)


def retrieve_best_depth(
    agg: jnp.ndarray,  # (D, H, W) aggregated costs
    depths: jnp.ndarray,  # (D,)
):
    """Argmin + parabolic subpixel interpolation in inverse depth
    (ref: volume_retrieveBestDepth_kernel :393-515). Returns (depth map,
    similarity map) with -1 depth where no minimum exists."""
    D = agg.shape[0]
    best = jnp.argmin(agg, axis=0)  # (H, W)
    c0 = jnp.take_along_axis(agg, best[None], axis=0)[0]

    bm = jnp.clip(best - 1, 0, D - 1)
    bp = jnp.clip(best + 1, 0, D - 1)
    cm = jnp.take_along_axis(agg, bm[None], axis=0)[0]
    cp = jnp.take_along_axis(agg, bp[None], axis=0)[0]
    denom = cm - 2.0 * c0 + cp
    delta = jnp.where(jnp.abs(denom) > _EPS, 0.5 * (cm - cp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best > 0) & (best < D - 1)
    delta = jnp.where(interior, delta, 0.0)

    # interpolate in inverse depth (planes are uniform in 1/d)
    inv = 1.0 / depths
    inv_best = jnp.take(inv, best)
    inv_m = jnp.take(inv, bm)
    inv_p = jnp.take(inv, bp)
    inv_interp = inv_best + delta * jnp.where(
        delta >= 0, inv_p - inv_best, inv_best - inv_m
    )
    depth_map = 1.0 / jnp.maximum(inv_interp, _EPS)
    sim_map = 1.0 - c0 / (0.5 * 255.0)  # back to [-1, 1]
    return depth_map, sim_map


def sgm_depth_map(
    ref_img,
    t_imgs,
    K_ref,
    K_t,
    R_rel,
    t_rel,
    d_min: float,
    d_max: float,
    params: SgmParams = SgmParams(),
    depths: jnp.ndarray | None = None,
    tc_depth_ranges: jnp.ndarray | None = None,
):
    """Full SGM pipeline for one reference view (Sgm::sgmRc equivalent).

    The similarity volume routes through the gather-free rectified sweep
    per tcam pair when the geometry allows (params.method, default
    "auto") — 14x faster than the plane-homography gather sweep on v5e.
    `depths`/`tc_depth_ranges` override the uniform inverse-depth grid
    with an SfM-seeded per-view list + per-T-cam depth sub-ranges
    (SgmDepthList semantics, mvs/depth_list.py).
    """
    from .rectified import similarity_volume_auto

    if depths is None:
        depths = inverse_depth_planes(d_min, d_max, params.n_depths)
    else:
        depths = jnp.asarray(depths, jnp.float32)
    cost = similarity_volume_auto(
        ref_img, t_imgs, K_ref, K_t, R_rel, t_rel, depths, params,
        tc_depth_ranges=tc_depth_ranges,
    )
    if params.guided_radius > 0:
        from ..ops.guided_filter import filter_cost_volume

        cost = filter_cost_volume(
            ref_img, cost, radius=params.guided_radius, eps=params.guided_eps
        )
    agg = sgm_aggregate(cost, ref_img, params)
    return retrieve_best_depth(agg, depths)
