"""SIFT / DSP-SIFT feature extraction as batched XLA compute.

TPU-native re-design of the reference's VLFeat-backed describers
(ref: src/aliceVision/feature/sift/SIFT.hpp:35-60 params,
ImageDescriber_DSPSIFT_vlfeat.cpp:71-148 detection + :304-311 domain-size
pooling; vendored DoG code src/nonFree/sift/vl/sift.c). The virtual
ImageDescriber hierarchy becomes pure functions over fixed-capacity arrays:

  * Gaussian scale-space + DoG per octave (separable convs, static shapes);
  * extrema = 26-neighbour comparisons via shifted-array min/max (VPU);
  * subpixel refinement by one 3x3 Hessian solve per candidate (batched);
  * fixed keypoint budget: top-K by |DoG| response across all octaves with a
    validity mask — replaces data-dependent keypoint lists;
  * orientation from a 36-bin gradient histogram over a gathered patch;
  * descriptor: 4x4x8 trilinear binning over a rotated resampled grid,
    normalized / clipped (0.2) / renormalized, optional rootSIFT
    (SIFT.hpp:80-100) and uint8 quantization (x512);
  * DSP-SIFT: descriptors averaged over `dsp_n_scales` domain sizes in
    [dsp_min, dsp_max] x detection scale before normalization.

Default operating point mirrors the reference: 3 scales/octave, peak
threshold 0.005 (scaled by 0.04/3 convention), edge threshold 10,
max 10000 keypoints.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..image.filtering import (
    bilinear_sample,
    downsample2,
    gaussian_blur,
    upsample2,
)


class SiftConfig(NamedTuple):
    max_keypoints: int = 10000
    n_octaves: int = 4
    n_scales: int = 3  # scales per octave (S); S+3 gaussian, S+2 DoG levels
    first_octave: int = 0  # -1 = upsample input 2x first
    peak_threshold: float = 0.005  # on DoG, relative contrast
    edge_threshold: float = 10.0
    sigma0: float = 1.6  # base blur of octave 0
    init_sigma: float = 0.5  # assumed blur of the input image
    root_sift: bool = True
    # DSP pooling (ImageDescriber_DSPSIFT_vlfeat.hpp:29-31)
    dsp: bool = False
    dsp_n_scales: int = 10
    dsp_min: float = 1.0 / 6.0
    dsp_max: float = 3.0
    # descriptor geometry
    n_spatial_bins: int = 4
    n_ori_bins: int = 8
    magnif: float = 3.0  # bin size in units of keypoint scale
    patch_grid: int = 16  # resampled grid (G x G) covering the window


class SiftFeatures(NamedTuple):
    xy: jnp.ndarray  # (N, 2) pixel coords in the input image
    scale: jnp.ndarray  # (N,) blur scale (sigma, input-image units)
    orientation: jnp.ndarray  # (N,) radians
    response: jnp.ndarray  # (N,) |DoG| response
    desc: jnp.ndarray  # (N, 128) float32 (normalized) — quantize separately
    valid: jnp.ndarray  # (N,) bool


# ---------------------------------------------------------------------------
# Scale space
# ---------------------------------------------------------------------------


def build_scale_space(img: jnp.ndarray, cfg: SiftConfig):
    """Gaussian pyramid: list over octaves of (S+3, H_o, W_o) stacks, plus the
    per-octave sampling step relative to the input image."""
    S = cfg.n_scales
    k = 2.0 ** (1.0 / S)
    base = img
    step0 = 1.0
    if cfg.first_octave == -1:
        base = upsample2(img)
        step0 = 0.5

    # Bring the base image to sigma0 blur.
    cur_sigma = cfg.init_sigma / step0
    if cfg.sigma0 > cur_sigma:
        base = gaussian_blur(base, math.sqrt(cfg.sigma0**2 - cur_sigma**2))

    octaves = []
    steps = []
    for o in range(cfg.n_octaves):
        levels = [base]
        sigma_prev = cfg.sigma0
        for s in range(1, S + 3):
            sigma_target = cfg.sigma0 * (k**s)
            dsigma = math.sqrt(sigma_target**2 - sigma_prev**2)
            levels.append(gaussian_blur(levels[-1], dsigma))
            sigma_prev = sigma_target
        octaves.append(jnp.stack(levels))  # (S+3, H, W)
        steps.append(step0 * (2.0**o))
        # Next octave starts from the level with blur 2*sigma0 (index S).
        base = downsample2(levels[S])
    return octaves, steps


# ---------------------------------------------------------------------------
# Extrema detection per octave
# ---------------------------------------------------------------------------


def _detect_octave(gauss: jnp.ndarray, step: float, cfg: SiftConfig, k_budget: int):
    """Detect + refine extrema in one octave.

    gauss: (S+3, H, W). Returns fixed-size candidate set:
      xy (K, 2) input-image coords, scale (K,), response (K,), level (K,)
      valid (K,), patch coords in octave units for later sampling.
    """
    S = cfg.n_scales
    dog = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    D, H, W = dog.shape

    # 26-neighbour max/min via shifted arrays on the 3 interior scales.
    def shift2(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    center = dog[1:-1]  # (S, H, W)
    neigh_max = jnp.full_like(center, -jnp.inf)
    neigh_min = jnp.full_like(center, jnp.inf)
    for ds in (-1, 0, 1):
        lvl = dog[1 + ds : 1 + ds + S]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                sh = shift2(lvl, dy, dx)
                neigh_max = jnp.maximum(neigh_max, sh)
                neigh_min = jnp.minimum(neigh_min, sh)

    thr = cfg.peak_threshold
    is_max = (center > neigh_max) & (center > thr)
    is_min = (center < neigh_min) & (center < -thr)
    cand = is_max | is_min

    # Edge rejection: ratio of principal curvatures of the 2x2 spatial Hessian.
    dxx = shift2(center, 0, 1) + shift2(center, 0, -1) - 2 * center
    dyy = shift2(center, 1, 0) + shift2(center, -1, 0) - 2 * center
    dxy = 0.25 * (
        shift2(center, 1, 1)
        + shift2(center, -1, -1)
        - shift2(center, 1, -1)
        - shift2(center, -1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    cand = cand & edge_ok

    # Exclude a border margin.
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    b = 5
    cand = cand & (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)

    resp = jnp.abs(center)
    score = jnp.where(cand, resp, 0.0)
    # two-stage top-k: a full-array lax.top_k over S*H*W costs ~45x the
    # DoG itself on TPU (sort-based). Reduce 4x4 spatial blocks to their
    # max first and top_k the 16x smaller array — at most one keypoint
    # per 4x4 cell per scale, which is exactly the reference's grid
    # filtering of maxTotalKeypoints (SIFT.hpp:38-50 grid sort).
    B = 4
    Hp, Wp = (H // B) * B, (W // B) * B
    blk = score[:, :Hp, :Wp].reshape(S, Hp // B, B, Wp // B, B)
    blk_max = blk.max(axis=(2, 4))  # (S, Hb, Wb)
    Hb, Wb = Hp // B, Wp // B
    k_eff = min(k_budget, S * Hb * Wb)
    vals, bidx = jax.lax.top_k(blk_max.reshape(-1), k_eff)
    if k_eff < k_budget:  # tiny octaves: pad back to the fixed budget
        vals = jnp.pad(vals, (0, k_budget - k_eff))
        bidx = jnp.pad(bidx, (0, k_budget - k_eff))
    valid = vals > 0.0
    s_idx = bidx // (Hb * Wb)
    rem = bidx % (Hb * Wb)
    by = rem // Wb
    bx = rem % Wb
    # recover the argmax position inside each winning 4x4 block
    iy = jnp.arange(B)[:, None]
    ix = jnp.arange(B)[None, :]
    lin = (
        s_idx[:, None, None] * (H * W)
        + (by[:, None, None] * B + iy[None]) * W
        + (bx[:, None, None] * B + ix[None])
    )  # (K, B, B)
    cell = jnp.take(score.reshape(-1), lin.reshape(-1)).reshape(-1, B * B)
    off = jnp.argmax(cell, axis=1)
    y_idx = by * B + off // B
    x_idx = bx * B + off % B

    # Subpixel refinement: 3D quadratic fit about each candidate. ALL 27
    # neighbourhood taps of ALL candidates ride ONE flat take — small
    # separate gathers pay a fixed per-op cost (~2 ms each on v5e, 27x4
    # octaves of them measured ~190 ms; the single batched take is ~1 ms).
    dog_flat = dog.reshape(-1)
    offsets27 = [
        (ds, dy, dx) for ds in (-1, 0, 1) for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    off_lin = jnp.asarray(
        [ds * (H * W) + dy * W + dx for ds, dy, dx in offsets27],
        jnp.int32,
    )
    base = ((s_idx + 1) * H + y_idx) * W + x_idx  # (K,)
    lin27 = base[:, None] + off_lin[None, :]  # (K, 27)
    vals = jnp.take(dog_flat, lin27.reshape(-1)).reshape(lin27.shape)
    v27 = {o: vals[:, i] for i, o in enumerate(offsets27)}

    def val(ds, dy, dx):
        return v27[(ds, dy, dx)]

    g = jnp.stack(
        [
            0.5 * (val(0, 0, 1) - val(0, 0, -1)),
            0.5 * (val(0, 1, 0) - val(0, -1, 0)),
            0.5 * (val(1, 0, 0) - val(-1, 0, 0)),
        ],
        axis=-1,
    )  # (K, 3)
    hxx = val(0, 0, 1) + val(0, 0, -1) - 2 * val(0, 0, 0)
    hyy = val(0, 1, 0) + val(0, -1, 0) - 2 * val(0, 0, 0)
    hss = val(1, 0, 0) + val(-1, 0, 0) - 2 * val(0, 0, 0)
    hxy = 0.25 * (val(0, 1, 1) + val(0, -1, -1) - val(0, 1, -1) - val(0, -1, 1))
    hxs = 0.25 * (val(1, 0, 1) + val(-1, 0, -1) - val(1, 0, -1) - val(-1, 0, 1))
    hys = 0.25 * (val(1, 1, 0) + val(-1, -1, 0) - val(1, -1, 0) - val(-1, 1, 0))
    # closed-form symmetric 3x3 solve (adjugate/Cramer): the batched LU of
    # jnp.linalg.solve lowers to scalar loops on TPU (~50 ms per octave
    # for 1024 tiny systems; this is elementwise VPU math)
    a_, b_, c_ = hxx + 1e-8, hxy, hxs
    d_, e_, f_ = hyy + 1e-8, hys, hss + 1e-8
    A11 = d_ * f_ - e_ * e_
    A12 = c_ * e_ - b_ * f_
    A13 = b_ * e_ - c_ * d_
    A22 = a_ * f_ - c_ * c_
    A23 = b_ * c_ - a_ * e_
    A33 = a_ * d_ - b_ * b_
    det = a_ * A11 + b_ * A12 + c_ * A13
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    gx_, gy_, gs_ = g[:, 0], g[:, 1], g[:, 2]
    offs = -jnp.stack(
        [
            (A11 * gx_ + A12 * gy_ + A13 * gs_) / det,
            (A12 * gx_ + A22 * gy_ + A23 * gs_) / det,
            (A13 * gx_ + A23 * gy_ + A33 * gs_) / det,
        ],
        axis=-1,
    )
    offs = jnp.clip(offs, -0.6, 0.6)
    d_hat = val(0, 0, 0) + 0.5 * jnp.sum(g * offs, axis=-1)
    valid = valid & (jnp.abs(d_hat) > thr)

    x_o = x_idx.astype(jnp.float32) + offs[:, 0]
    y_o = y_idx.astype(jnp.float32) + offs[:, 1]
    s_o = s_idx.astype(jnp.float32) + 1.0 + offs[:, 2]  # gaussian level coords

    k = 2.0 ** (1.0 / S)
    sigma_oct = cfg.sigma0 * (k**s_o)  # octave units
    xy = jnp.stack([x_o, y_o], axis=-1) * step  # input-image coords
    sigma = sigma_oct * step
    level = jnp.clip(jnp.round(s_o).astype(jnp.int32), 0, S + 2)
    return xy, sigma, jnp.abs(d_hat), level, valid, (x_o, y_o, sigma_oct)


# ---------------------------------------------------------------------------
# Orientation + descriptor from gathered patches
# ---------------------------------------------------------------------------


def _gather_rotated_patch(img, cx, cy, spacing, angle, G, lvl=None):
    """Resample a (G+2)x(G+2) grid centered at (cx, cy), rotated by angle,
    with the given spacing (octave pixels per grid step).

    `img` is either one (H, W) level, or the whole (L, H, W) gaussian stack
    with `lvl` the (traced) level index. The stack form folds the level
    into the gather indices: `stack[lvl_i]` under vmap would materialize a
    full image PER KEYPOINT (a 30 GB intermediate at 10k keypoints x 10 DSP
    scales on a 1024x768 octave — measured as a TPU HBM OOM), while a
    3-coordinate tap gathers only the 4 bilinear corners per sample."""
    g = jnp.arange(G + 2, dtype=jnp.float32) - (G + 1) / 2.0
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sx = spacing * (ca * gx - sa * gy) + cx
    sy = spacing * (sa * gx + ca * gy) + cy
    if lvl is None:
        return bilinear_sample(img, jnp.stack([sx, sy], axis=-1))
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(-1)  # flat 1-D take: ~25x faster than N-D gather

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        lin = (lvl * H + jnp.clip(yi, 0, H - 1)) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take(flat, lin.reshape(-1)).reshape(lin.shape)
        return jnp.where(inside, v, 0.0)

    return (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    )


def _orientation(img, cx, cy, sigma_oct, lvl=None):
    """Dominant gradient orientation (VLFeat-style 36-bin histogram)."""
    G = 16
    win = 3.0 * 1.5 * sigma_oct  # window radius
    spacing = 2.0 * win / G
    patch = _gather_rotated_patch(img, cx, cy, spacing, 0.0, G, lvl=lvl)
    gx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
    gy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi)

    g = jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0
    yy, xx = jnp.meshgrid(g, g, indexing="ij")
    r2 = (xx * xx + yy * yy) * spacing**2
    w = jnp.exp(-r2 / (2.0 * (1.5 * sigma_oct) ** 2)) * mag

    nb = 36
    bin_f = (ang + jnp.pi) / (2 * jnp.pi) * nb
    b0 = jnp.floor(bin_f).astype(jnp.int32) % nb
    # one-hot contraction instead of scatter-add: rides the VPU/MXU and
    # batches cleanly under vmap (scatters serialize on TPU)
    onehot = (b0.reshape(-1, 1) == jnp.arange(nb)[None, :]).astype(w.dtype)
    hist = w.reshape(-1) @ onehot
    # Circular smoothing (6 passes of [1,1,1]/3 like VLFeat).
    for _ in range(6):
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    bmax = jnp.argmax(hist)
    # Parabolic interpolation of the peak.
    hl = hist[(bmax - 1) % nb]
    hc = hist[bmax]
    hr = hist[(bmax + 1) % nb]
    denom = hl - 2 * hc + hr
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    theta = (bmax.astype(jnp.float32) + off + 0.5) / nb * 2 * jnp.pi - jnp.pi
    return theta


def _gather_rotated_patches_multi(img, cx, cy, spacings, angle, G, lvls,
                                  nearest=True):
    """(S, G+2, G+2) rotated patches for S (spacing, level) pairs in ONE
    flat gather — the DSP pooling path samples all domain sizes at once
    (10 separate per-scale gathers measured ~5x slower than one batched
    take on v5e).

    nearest=True samples one tap per grid point instead of the 4-tap
    bilinear stencil: the +-0.5 px placement jitter is uncorrelated across
    the pooled domain sizes and washes out in the DSP mean, while the
    gather element count (the measured bottleneck of the descriptor stage)
    drops 4x. Matching quality pinned by tests/test_sift.py."""
    L_, H, W = img.shape
    g = jnp.arange(G + 2, dtype=jnp.float32) - (G + 1) / 2.0
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sx = spacings[:, None, None] * (ca * gx - sa * gy)[None] + cx
    sy = spacings[:, None, None] * (sa * gx + ca * gy)[None] + cy
    lvl3 = lvls[:, None, None]
    if nearest:
        xs = jnp.round(sx).astype(jnp.int32)
        ys = jnp.round(sy).astype(jnp.int32)
        inside = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        lin = (lvl3 * H + jnp.clip(ys, 0, H - 1)) * W + jnp.clip(
            xs, 0, W - 1
        )
        v = jnp.take(img.reshape(-1), lin.reshape(-1)).reshape(lin.shape)
        return jnp.where(inside, v, 0.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # 4 taps stacked into ONE take
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])  # (4, S, G+2, G+2)
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])
    inside = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    lin = (lvl3[None] * H + jnp.clip(ys, 0, H - 1)) * W + jnp.clip(
        xs, 0, W - 1
    )
    v = jnp.take(img.reshape(-1), lin.reshape(-1)).reshape(lin.shape)
    v = jnp.where(inside, v, 0.0)
    w = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    )
    return jnp.sum(v * w, axis=0)  # (S, G+2, G+2)


def _descriptor_from_patch(patch, cfg: SiftConfig):
    """Unnormalized 128-dim descriptor from a sampled (G+2, G+2) patch
    (trilinear binning, Gaussian weight)."""
    NBP = cfg.n_spatial_bins
    NBO = cfg.n_ori_bins
    G = cfg.patch_grid
    gx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
    gy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
    mag = jnp.sqrt(gx * gx + gy * gy)
    # The patch is sampled along axes rotated by `angle`, so finite
    # differences are already expressed in the keypoint frame.
    ang = jnp.arctan2(gy, gx)

    g = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G  # (0, 1)
    yy, xx = jnp.meshgrid(g, g, indexing="ij")
    # Gaussian window over the whole descriptor support.
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
    wg = jnp.exp(-r2 / (2.0 * 0.25**2)) * mag

    # Trilinear binning as ONE (NBP^2, G^2) @ (G^2, NBO) matmul: the spatial
    # bin weights depend only on the (static) grid geometry, so they are a
    # precomputed constant matrix; only the orientation one-hot is data-
    # dependent. Replaces 8 scatter-adds per keypoint (scatters serialize
    # on TPU; the matmul rides the MXU and batches under vmap).
    bo = (ang % (2 * jnp.pi)) / (2 * jnp.pi) * NBO
    o0 = jnp.floor(bo)
    fo = bo - o0
    i0 = o0.astype(jnp.int32) % NBO
    i1 = (i0 + 1) % NBO
    obins = jnp.arange(NBO)[None, :]
    V = wg.reshape(-1, 1) * (
        (i0.reshape(-1, 1) == obins) * (1 - fo).reshape(-1, 1)
        + (i1.reshape(-1, 1) == obins) * fo.reshape(-1, 1)
    )  # (G^2, NBO)
    S = jnp.asarray(_spatial_bin_matrix(NBP, G))  # (NBP^2, G^2) static
    return (S @ V).reshape(-1)  # (128,)


def _descriptor_raw(img, cx, cy, sigma_oct, angle, cfg: SiftConfig, lvl=None):
    """Unnormalized 128-dim descriptor at one domain size."""
    G = cfg.patch_grid
    win = cfg.magnif * sigma_oct * cfg.n_spatial_bins / 2.0
    spacing = 2.0 * win / G
    patch = _gather_rotated_patch(img, cx, cy, spacing, angle, G, lvl=lvl)
    return _descriptor_from_patch(patch, cfg)


_SPATIAL_CACHE: dict = {}


def _spatial_bin_matrix(NBP: int, G: int):
    """Static (NBP^2, G^2) bilinear spatial-bin weight matrix: entry
    [(p*NBP+q), cell] is the weight of grid cell `cell` in spatial bin
    (p, q) under the descriptor's trilinear interpolation."""
    import numpy as np

    key = (NBP, G)
    if key in _SPATIAL_CACHE:
        return _SPATIAL_CACHE[key]
    g = (np.arange(G, dtype=np.float64) + 0.5) / G
    yy, xx = np.meshgrid(g, g, indexing="ij")
    bx = (xx * NBP - 0.5).reshape(-1)
    by = (yy * NBP - 0.5).reshape(-1)
    S = np.zeros((NBP, NBP, G * G), np.float32)
    y0 = np.floor(by)
    x0 = np.floor(bx)
    fy = by - y0
    fx = bx - x0
    cells = np.arange(G * G)
    for iy, wy in ((y0.astype(int), 1 - fy), (y0.astype(int) + 1, fy)):
        oky = (iy >= 0) & (iy < NBP)
        for ix, wx in ((x0.astype(int), 1 - fx), (x0.astype(int) + 1, fx)):
            okx = (ix >= 0) & (ix < NBP)
            ok = oky & okx
            np.add.at(
                S,
                (iy.clip(0, NBP - 1), ix.clip(0, NBP - 1), cells),
                np.where(ok, wy * wx, 0.0),
            )
    _SPATIAL_CACHE[key] = S.reshape(NBP * NBP, G * G)
    return _SPATIAL_CACHE[key]


def _normalize_desc(d, cfg: SiftConfig):
    d = d / jnp.linalg.norm(d).clip(1e-12)
    d = jnp.minimum(d, 0.2)
    d = d / jnp.linalg.norm(d).clip(1e-12)
    if cfg.root_sift:
        d = jnp.sqrt(d / jnp.sum(d).clip(1e-12))
    return d


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------


def extract(img: jnp.ndarray, cfg: SiftConfig = SiftConfig()) -> SiftFeatures:
    """Extract SIFT features from a grayscale image (H, W) in [0, 1].

    Returns fixed-capacity arrays of cfg.max_keypoints with a validity mask.
    """
    octaves, steps = build_scale_space(img, cfg)
    per_oct_budget = max(256, cfg.max_keypoints // max(1, len(octaves)))

    all_xy, all_sigma, all_resp, all_valid = [], [], [], []
    all_theta, all_desc = [], []

    for gauss, step in zip(octaves, steps):
        xy, sigma, resp, level, valid, (x_o, y_o, sig_o) = _detect_octave(
            gauss, step, cfg, per_oct_budget
        )

        # Per-keypoint orientation + descriptor on its gaussian level.
        # The level is passed as a gather coordinate into the (L, H, W)
        # stack — indexing `gauss[level_i]` here would broadcast a full
        # image per keypoint under vmap (see _gather_rotated_patch).
        def per_kp(level_i, x_i, y_i, sig_i):
            theta = _orientation(gauss, x_i, y_i, sig_i, lvl=level_i)
            if cfg.dsp:
                scales = jnp.linspace(cfg.dsp_min, cfg.dsp_max, cfg.dsp_n_scales)
                # Sample each pooled domain from the gaussian level whose
                # smoothing matches sigma*s (clamped to the octave): pooling
                # a 3x window from the detection-scale blur aliases high
                # frequencies and makes the pooled descriptor LESS stable
                # (measured); vl_covdet re-smooths patches the same way
                # (ImageDescriber_DSPSIFT_vlfeat.cpp:304-311). All domain
                # sizes are sampled in ONE fused gather.
                n_lvls = gauss.shape[0]
                dl = jnp.round(jnp.log2(scales) * cfg.n_scales).astype(
                    jnp.int32
                )
                lis = jnp.clip(level_i + dl, 0, n_lvls - 1)
                spacings = (
                    cfg.magnif * sig_i * scales * cfg.n_spatial_bins
                ) / cfg.patch_grid
                patches = _gather_rotated_patches_multi(
                    gauss, x_i, y_i, spacings, theta, cfg.patch_grid, lis
                )
                descs = jax.vmap(
                    lambda p: _descriptor_from_patch(p, cfg)
                )(patches)
                # L2-normalize per scale BEFORE pooling: the raw finite-
                # difference magnitudes grow with the sampling spacing, so
                # an unnormalized mean is dominated by the largest domain
                # (measured: per-scale normalization restores the pooled
                # descriptor's scale stability).
                descs = descs / jnp.linalg.norm(
                    descs, axis=-1, keepdims=True
                ).clip(1e-12)
                d = jnp.mean(descs, axis=0)
            else:
                d = _descriptor_raw(
                    gauss, x_i, y_i, sig_i, theta, cfg, lvl=level_i
                )
            return theta, _normalize_desc(d, cfg)

        theta, desc = jax.vmap(per_kp)(level, x_o, y_o, sig_o)

        all_xy.append(xy)
        all_sigma.append(sigma)
        all_resp.append(resp)
        all_valid.append(valid)
        all_theta.append(theta)
        all_desc.append(desc)

    xy = jnp.concatenate(all_xy)
    sigma = jnp.concatenate(all_sigma)
    resp = jnp.concatenate(all_resp)
    valid = jnp.concatenate(all_valid)
    theta = jnp.concatenate(all_theta)
    desc = jnp.concatenate(all_desc)

    # Global top-K by response among valid candidates.
    N = cfg.max_keypoints
    score = jnp.where(valid, resp, -1.0)
    _, top = jax.lax.top_k(score, min(N, score.shape[0]))
    pad = N - top.shape[0]

    def take(a):
        t = a[top]
        if pad > 0:
            t = jnp.concatenate([t, jnp.zeros((pad,) + t.shape[1:], t.dtype)])
        return t

    return SiftFeatures(
        xy=take(xy),
        scale=take(sigma),
        orientation=take(theta),
        response=take(resp),
        desc=take(desc),
        valid=take(valid.astype(jnp.float32)) > 0.5,
    )


extract_jit = jax.jit(extract, static_argnums=(1,))


def quantize_desc(desc: jnp.ndarray) -> jnp.ndarray:
    """Float descriptor -> uint8 (x512, clipped), the reference's convention."""
    return jnp.clip(desc * 512.0, 0, 255).astype(jnp.uint8)
