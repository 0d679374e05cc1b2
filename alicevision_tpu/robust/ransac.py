"""Batched fixed-budget RANSAC with a-contrario (ACRANSAC) model selection.

TPU-native re-design of the reference's robust estimation layer
(ref: src/aliceVision/robustEstimation/ACRansac.hpp:78-146, Ransac.hpp,
ISolver.hpp/IRansacKernel.hpp). The reference iterates until an adaptive
convergence criterion fires; data-dependent early exit does not map to XLA,
so instead we draw a *fixed batch* of H minimal samples, solve all
hypotheses at once with the batched closed-form solvers, score the full
H x N residual matrix, and select the hypothesis with the best (lowest)
NFA. The a-contrario criterion also yields the adaptive inlier threshold,
exactly like the reference (no user-set pixel threshold needed).

NFA(model, k) = log10(n_models * (n - s)) + logC(n, k) + logC(k, s)
               + (k - s) * (logalpha0 + mult * log10(e_k^2))
with e_k the k-th smallest residual, s the minimal sample size
(a-contrario methodology of Moisan-Stival, as used by the reference).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

_EPS = 1e-12


def log10_choose(n: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """log10(n choose k), batched, valid for real-valued n >= k >= 0."""
    ln10 = math.log(10.0)
    return (
        gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
    ) / ln10


def sample_minimal(
    key: jax.Array,
    n: int,
    sample_size: int,
    n_hyps: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Draw n_hyps index sets of size sample_size without replacement.

    Invalid entries get ~zero probability. Returns (n_hyps, sample_size).
    """
    if valid is None:
        logits = jnp.zeros((n,), jnp.float32)
    else:
        logits = jnp.where(valid, 0.0, -1e9)
    # Gumbel top-k gives without-replacement sampling, fully batched.
    g = jax.random.gumbel(key, (n_hyps, n)) + logits
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


class ACRansacSelection(NamedTuple):
    best_hyp: jnp.ndarray  # () int32 — index of winning hypothesis
    best_nfa: jnp.ndarray  # () float — its NFA (log10 units)
    threshold_sq: jnp.ndarray  # () adaptive squared-residual threshold
    inliers: jnp.ndarray  # (N,) bool — inliers of the winning hypothesis
    n_inliers: jnp.ndarray  # () int32


def acransac_select(
    res_sq: jnp.ndarray,
    sample_size: int,
    logalpha0: float,
    mult_error: float = 0.5,
    valid: jnp.ndarray | None = None,
    n_models_per_hyp: int = 1,
    max_threshold_sq: float = float("inf"),
) -> ACRansacSelection:
    """A-contrario selection over a batch of scored hypotheses.

    res_sq: (H, N) squared residuals of every datum under every hypothesis.
    valid: (N,) mask of usable correspondences (padding -> False).
    """
    H, N = res_sq.shape
    if valid is None:
        valid = jnp.ones((N,), bool)
    n_valid = jnp.sum(valid)

    big = jnp.float32(1e18)
    res = jnp.where(valid[None, :], res_sq, big)
    res = jnp.where(jnp.isfinite(res), res, big)
    res_sorted = jnp.sort(res, axis=-1)  # (H, N) ascending

    ks = jnp.arange(1, N + 1, dtype=jnp.float32)  # candidate inlier counts
    nf = n_valid.astype(jnp.float32)
    loge0 = jnp.log10(jnp.float32(n_models_per_hyp) * jnp.maximum(nf - sample_size, 1.0))
    logc_n = log10_choose(nf, ks)
    logc_k = log10_choose(ks, float(sample_size))
    logalpha = logalpha0 + mult_error * jnp.log10(res_sorted + _EPS)
    nfa = (
        loge0
        + logc_n[None, :]
        + logc_k[None, :]
        + (ks[None, :] - sample_size) * logalpha
    )  # (H, N)

    # Only k in (sample_size, n_valid] with residual under the cap counts.
    ok = (
        (ks[None, :] > sample_size)
        & (ks[None, :] <= nf)
        & (res_sorted <= max_threshold_sq)
    )
    nfa = jnp.where(ok, nfa, jnp.inf)

    best_k_per_hyp = jnp.argmin(nfa, axis=-1)  # (H,)
    best_nfa_per_hyp = jnp.min(nfa, axis=-1)
    best_hyp = jnp.argmin(best_nfa_per_hyp)
    best_nfa = best_nfa_per_hyp[best_hyp]
    k_star = best_k_per_hyp[best_hyp]
    thr = res_sorted[best_hyp, k_star]

    inliers = (res_sq[best_hyp] <= thr) & valid
    return ACRansacSelection(
        best_hyp=best_hyp,
        best_nfa=best_nfa,
        threshold_sq=thr,
        inliers=inliers,
        n_inliers=jnp.sum(inliers),
    )


def simple_select(
    res_sq: jnp.ndarray,
    threshold_sq: float,
    valid: jnp.ndarray | None = None,
) -> ACRansacSelection:
    """Plain max-consensus selection at a fixed threshold
    (ref: robustEstimation/Ransac.hpp / maxConsensus.hpp)."""
    H, N = res_sq.shape
    if valid is None:
        valid = jnp.ones((N,), bool)
    ok = (res_sq <= threshold_sq) & valid[None, :]
    counts = jnp.sum(ok, axis=-1)
    best_hyp = jnp.argmax(counts)
    inliers = ok[best_hyp]
    return ACRansacSelection(
        best_hyp=best_hyp,
        best_nfa=-counts[best_hyp].astype(jnp.float32),
        threshold_sq=jnp.float32(threshold_sq),
        inliers=inliers,
        n_inliers=counts[best_hyp],
    )


def lmeds_select(
    res_sq: jnp.ndarray,
    sample_size: int,
    valid: jnp.ndarray | None = None,
) -> ACRansacSelection:
    """Least-median-of-squares selection (ref: robustEstimation/LMeds.hpp).

    Picks the hypothesis minimizing the median squared residual over valid
    data, then derives the classic LMedS inlier threshold from the robust
    scale estimate sigma = 1.4826 (1 + 5/(n - s)) sqrt(med).
    """
    H, N = res_sq.shape
    if valid is None:
        valid = jnp.ones((N,), bool)
    n_valid = jnp.sum(valid).astype(jnp.float32)
    big = jnp.float32(1e18)
    res = jnp.where(valid[None, :] & jnp.isfinite(res_sq), res_sq, big)
    res_sorted = jnp.sort(res, axis=-1)
    # Median over the *valid* prefix: index floor(n_valid / 2).
    med_idx = jnp.clip((n_valid / 2.0).astype(jnp.int32), 0, N - 1)
    med = res_sorted[:, med_idx]  # (H,)
    best_hyp = jnp.argmin(med)
    med_best = med[best_hyp]
    sigma = 1.4826 * (1.0 + 5.0 / jnp.maximum(n_valid - sample_size, 1.0)) * jnp.sqrt(
        jnp.maximum(med_best, 0.0)
    )
    thr = (2.5 * sigma) ** 2
    inliers = (res_sq[best_hyp] <= thr) & valid
    return ACRansacSelection(
        best_hyp=best_hyp,
        best_nfa=med_best,
        threshold_sq=thr,
        inliers=inliers,
        n_inliers=jnp.sum(inliers),
    )


# Model-dependent alpha0 constants (probability that a random point falls
# within distance r of the model), matching the reference kernels:
#   point-to-line (F/E epipolar):  alpha0 = 2 r diam / area, mult = 0.5
#   point-to-point (H, resection): alpha0 = pi r^2 / area,  mult = 1.0


def logalpha0_line(w: float, h: float) -> float:
    area = w * h
    diam = math.sqrt(w * w + h * h)
    return math.log10(2.0 * diam / area)


def logalpha0_point(w: float, h: float) -> float:
    return math.log10(math.pi / (w * h))
