"""AKAZE features: nonlinear diffusion scale space + Hessian extrema +
SURF-style descriptors.

TPU-native re-design of the reference's native AKAZE implementation
(ref: src/aliceVision/feature/akaze/AKAZE.cpp nonlinear scale space,
descriptorMSURF.hpp MSURF descriptor; options in feature/akaze/AKAZE.hpp).
Design differences from the CPU implementation, chosen for the hardware:

  * the FED (fast explicit diffusion) inner solver is replaced by plain
    explicit diffusion steps at the stability limit — on TPU these are
    fused elementwise stencils and the extra iterations are cheap, while
    FED's varying step sizes would add control flow for no win;
  * detection/descriptors follow the same fixed-capacity batched pattern
    as SIFT (top-K + validity masks, gathered rotated patches);
  * the descriptor is the 64-d MSURF/SURF layout (4x4 subregions of
    Gauss-weighted (sum dx, sum dy, sum |dx|, sum |dy|)), L2-normalized.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..image.filtering import gaussian_blur
from .sift import SiftFeatures, _gather_rotated_patch, _orientation


class AkazeConfig(NamedTuple):
    max_keypoints: int = 4096
    n_octaves: int = 4
    n_sublevels: int = 4
    threshold: float = 1e-3  # Hessian response threshold
    sigma0: float = 1.6
    diffusivity_percentile: float = 70.0  # contrast factor k
    descriptor: str = "msurf"  # "msurf" (64-d float) | "mldb" (486-bit binary)


def _grad(img):
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    return gx, gy


def _pm_g2(img, k):
    """Perona-Malik g2 conductivity: 1 / (1 + |grad|^2 / k^2)."""
    gx, gy = _grad(img)
    return 1.0 / (1.0 + (gx * gx + gy * gy) / (k * k))


def _diffusion_steps(L, k, t_total, tau=0.23):
    """Explicit nonlinear diffusion from time 0 to t_total."""
    n = max(1, int(math.ceil(t_total / tau)))
    step = t_total / n

    def body(L, _):
        c = _pm_g2(L, k)
        # divergence of c * grad L (standard 4-neighbour discretization)
        cN = 0.5 * (c + jnp.roll(c, 1, 0))
        cS = 0.5 * (c + jnp.roll(c, -1, 0))
        cW = 0.5 * (c + jnp.roll(c, 1, 1))
        cE = 0.5 * (c + jnp.roll(c, -1, 1))
        dL = (
            cN * (jnp.roll(L, 1, 0) - L)
            + cS * (jnp.roll(L, -1, 0) - L)
            + cW * (jnp.roll(L, 1, 1) - L)
            + cE * (jnp.roll(L, -1, 1) - L)
        )
        return L + step * dL, None

    L, _ = jax.lax.scan(body, L, None, length=n)
    return L


def build_nonlinear_scale_space(img: jnp.ndarray, cfg: AkazeConfig):
    """Evolution levels of the nonlinear scale space.

    Returns (levels [(S, H_o, W_o) per octave], sigmas per octave, steps).
    """
    # Contrast factor from the gradient histogram of the smoothed image.
    # Like the reference's kcontrast computation, only *significant*
    # gradients enter the percentile — otherwise mostly-flat images give a
    # near-zero k that freezes the diffusion everywhere.
    smooth = gaussian_blur(img, 1.0)
    gx, gy = _grad(smooth)
    mag = jnp.sqrt(gx * gx + gy * gy)
    sig = jnp.where(mag > 0.02 * jnp.max(mag), mag, jnp.nan)
    k = jnp.nanpercentile(sig, cfg.diffusivity_percentile)
    k = jnp.where(jnp.isfinite(k), k, 1e-2).clip(1e-4)

    L = gaussian_blur(img, cfg.sigma0)
    t_cur = 0.5 * cfg.sigma0**2
    octaves, sigmas, steps = [], [], []
    step = 1.0
    for o in range(cfg.n_octaves):
        levels = []
        sigs = []
        for s in range(cfg.n_sublevels):
            sigma = cfg.sigma0 * (2.0 ** (o + s / cfg.n_sublevels))
            t = 0.5 * (sigma / step) ** 2  # time in current resolution units
            if t > t_cur:
                L = _diffusion_steps(L, k, t - t_cur)
                t_cur = t
            levels.append(L)
            sigs.append(sigma / step)  # octave units
        octaves.append(jnp.stack(levels))
        sigmas.append(jnp.asarray(sigs))
        steps.append(step)
        # next octave: downsample, halve time scale
        L = L[::2, ::2]
        t_cur = t_cur / 4.0
        step *= 2.0
    return octaves, sigmas, steps


def _hessian_response(L, sigma):
    """Scale-normalized determinant of Hessian."""
    Lxx = jnp.roll(L, -1, 1) + jnp.roll(L, 1, 1) - 2 * L
    Lyy = jnp.roll(L, -1, 0) + jnp.roll(L, 1, 0) - 2 * L
    Lxy = 0.25 * (
        jnp.roll(jnp.roll(L, 1, 0), 1, 1)
        + jnp.roll(jnp.roll(L, -1, 0), -1, 1)
        - jnp.roll(jnp.roll(L, 1, 0), -1, 1)
        - jnp.roll(jnp.roll(L, -1, 0), 1, 1)
    )
    return (sigma**2) ** 2 * (Lxx * Lyy - Lxy * Lxy)


def _msurf_descriptor(L, cx, cy, sigma, angle, n_sub=4, samples=5):
    """64-d MSURF-style descriptor from a rotated resampled grid."""
    G = n_sub * samples  # 20 samples across the 20-sigma window
    spacing = 20.0 * sigma / G
    patch = _gather_rotated_patch(L, cx, cy, spacing, angle, G)
    dx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
    dy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])

    g = jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0
    yy, xx = jnp.meshgrid(g, g, indexing="ij")
    w = jnp.exp(-(xx * xx + yy * yy) / (2.0 * (0.33 * G) ** 2))
    dx = dx * w
    dy = dy * w

    def pool(a):
        return a.reshape(n_sub, samples, n_sub, samples).sum(axis=(1, 3))

    feats = jnp.stack(
        [pool(dx), pool(dy), pool(jnp.abs(dx)), pool(jnp.abs(dy))], axis=-1
    )  # (4, 4, 4)
    d = feats.reshape(-1)
    return d / jnp.linalg.norm(d).clip(1e-12)


MLDB_BITS = 486  # 3 channels x (C(4,2) + C(9,2) + C(16,2)) pair comparisons


def _mldb_descriptor(L, cx, cy, sigma, angle, G=24):
    """486-bit M-LDB (Modified Local Difference Binary) descriptor
    (ref: feature/akaze/descriptorMLDB.hpp — AKAZE's binary descriptor:
    per-cell means of (intensity, dx, dy) on 2x2 / 3x3 / 4x4 grids of the
    rotated patch, one bit per ordered cell pair per channel).

    Returned as float {0, 1} of shape (486,) — for binary vectors the
    squared-L2 matmul identity *is* the Hamming distance, so the standard
    MXU matchers apply unchanged."""
    spacing = 20.0 * sigma / G
    patch = _gather_rotated_patch(L, cx, cy, spacing, angle, G)  # (G+2, G+2)
    inner = patch[1:-1, 1:-1]  # (G, G)
    dx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
    dy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
    chans = jnp.stack([inner, dx, dy])  # (3, G, G)

    bits = []
    for g in (2, 3, 4):
        s = G // g
        cells = chans.reshape(3, g, s, g, s).mean(axis=(2, 4))  # (3, g, g)
        flat = cells.reshape(3, g * g)
        iu, ju = jnp.triu_indices(g * g, k=1)
        cmp = flat[:, iu] > flat[:, ju]  # (3, n_pairs)
        bits.append(cmp.reshape(-1))
    return jnp.concatenate(bits).astype(jnp.float32)


def extract(img: jnp.ndarray, cfg: AkazeConfig = AkazeConfig()) -> SiftFeatures:
    """AKAZE detection + MSURF/MLDB description, fixed-capacity output.

    Returns the same structure as SIFT (desc is (N, 64) float for MSURF or
    (N, 486) binary-as-float for MLDB)."""
    octaves, sigmas, steps = build_nonlinear_scale_space(img, cfg)
    budget = max(256, cfg.max_keypoints // max(1, len(octaves)))

    all_out = []
    for gauss, sigs, step in zip(octaves, sigmas, steps):
        S, H, W = gauss.shape
        resp = jnp.stack(
            [_hessian_response(gauss[s], sigs[s]) for s in range(S)]
        )  # (S, H, W)

        def shift2(a, dy, dx):
            return jnp.roll(jnp.roll(a, dy, -2), dx, -1)

        # AKAZE's actual extremum rule: strict max over the 8 spatial
        # neighbours at the same level, plus the same-position responses at
        # the adjacent evolution levels (AKAZE.cpp findScaleSpaceExtrema).
        center = resp[1:-1] if S > 2 else resp
        lo = 1 if S > 2 else 0
        neigh = jnp.full_like(center, -jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = jnp.maximum(neigh, shift2(center, dy, dx))
        if S > 2:
            neigh = jnp.maximum(neigh, resp[lo - 1 : lo - 1 + center.shape[0]])
            neigh = jnp.maximum(neigh, resp[lo + 1 : lo + 1 + center.shape[0]])
        cand = (center > neigh) & (center > cfg.threshold)
        yy = jnp.arange(H)[None, :, None]
        xx = jnp.arange(W)[None, None, :]
        b = 10
        cand = cand & (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)

        score = jnp.where(cand, center, 0.0).reshape(-1)
        vals, flat = jax.lax.top_k(score, budget)
        valid = vals > 0
        s_idx = flat // (H * W) + lo
        rem = flat % (H * W)
        y_idx = (rem // W).astype(jnp.float32)
        x_idx = (rem % W).astype(jnp.float32)
        sig_of = sigs[jnp.clip(s_idx, 0, S - 1)]

        def per_kp(si, xi, yi, sg):
            Lb = gauss[si]
            theta = _orientation(Lb, xi, yi, sg)
            if cfg.descriptor == "mldb":
                d = _mldb_descriptor(Lb, xi, yi, sg, theta)
            else:
                d = _msurf_descriptor(Lb, xi, yi, sg, theta)
            return theta, d

        theta, desc = jax.vmap(per_kp)(s_idx, x_idx, y_idx, sig_of)
        all_out.append(
            (
                jnp.stack([x_idx, y_idx], -1) * step,
                sig_of * step,
                theta,
                vals,
                desc,
                valid,
            )
        )

    xy = jnp.concatenate([o[0] for o in all_out])
    scale = jnp.concatenate([o[1] for o in all_out])
    theta = jnp.concatenate([o[2] for o in all_out])
    resp = jnp.concatenate([o[3] for o in all_out])
    desc = jnp.concatenate([o[4] for o in all_out])
    valid = jnp.concatenate([o[5] for o in all_out])

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
        scale=take(scale),
        orientation=take(theta),
        response=take(resp),
        desc=take(desc),
        valid=take(valid.astype(jnp.float32)) > 0.5,
    )
