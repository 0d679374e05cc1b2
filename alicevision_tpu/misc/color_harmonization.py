"""Global color harmonization across views.

TPU-native counterpart of the reference's colorHarmonization module
(ref: src/aliceVision/colorHarmonization/GainOffsetConstraintBuilder.cpp —
per-view gain/offset consistency solved as an LP per [Moulon13]). The LP is
replaced by a robust (IRLS) least squares on the same pairwise constraints:
gain_i * m_i + offset_i = gain_j * m_j + offset_j for matched color stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def harmonize_gains(
    n_views: int,
    edges: np.ndarray,  # (E, 2) view pairs
    mean_i: jnp.ndarray,  # (E,) mean matched intensity in view i
    mean_j: jnp.ndarray,  # (E,) same region seen in view j
    irls_iters: int = 3,
    ref_view: int = 0,
):
    """Solve per-view (gain, offset) making matched regions agree.

    Returns (gains (V,), offsets (V,)) with the reference view fixed at
    identity (the LP's gauge constraint).
    """
    E = len(edges)
    ii = jnp.asarray(edges[:, 0])
    jj = jnp.asarray(edges[:, 1])

    def solve(w):
        # unknowns x = [g_0..g_V-1, o_0..o_V-1]
        n_unk = 2 * n_views
        A = jnp.zeros((E + 2, n_unk))
        rows = jnp.arange(E)
        A = A.at[rows, ii].add(w * mean_i)
        A = A.at[rows, n_views + ii].add(w)
        A = A.at[rows, jj].add(-w * mean_j)
        A = A.at[rows, n_views + jj].add(-w)
        b = jnp.zeros((E + 2,))
        big = 10.0 * jnp.sqrt(1.0 * E)
        A = A.at[E, ref_view].set(big)
        b = b.at[E].set(big)  # g_ref = 1
        A = A.at[E + 1, n_views + ref_view].set(big)  # o_ref = 0
        x = jnp.linalg.solve(A.T @ A + 1e-9 * jnp.eye(n_unk), A.T @ b)
        return x[:n_views], x[n_views:]

    w = jnp.ones((E,))
    g, o = solve(w)
    for _ in range(irls_iters):
        r = (g[ii] * mean_i + o[ii]) - (g[jj] * mean_j + o[jj])
        w = 1.0 / (jnp.abs(r) + 1e-2)
        g, o = solve(w)
    return g, o


def patch_means(img: np.ndarray, xy: np.ndarray, radius: int = 4) -> np.ndarray:
    """Mean intensity of the (2r+1)^2 patch around each keypoint, via an
    integral image (vectorized; no per-keypoint loops)."""
    img = np.asarray(img, np.float64)
    H, W = img.shape
    ii = np.zeros((H + 1, W + 1))
    ii[1:, 1:] = np.cumsum(np.cumsum(img, 0), 1)
    x = np.clip(np.round(np.asarray(xy)[:, 0]).astype(np.int64), 0, W - 1)
    y = np.clip(np.round(np.asarray(xy)[:, 1]).astype(np.int64), 0, H - 1)
    x0 = np.clip(x - radius, 0, W)
    x1 = np.clip(x + radius + 1, 0, W)
    y0 = np.clip(y - radius, 0, H)
    y1 = np.clip(y + radius + 1, 0, H)
    s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    area = np.maximum((y1 - y0) * (x1 - x0), 1)
    return s / area


def matched_quantile_constraints(
    img_i: np.ndarray,
    img_j: np.ndarray,
    xy_i: np.ndarray,  # (M, 2) matched keypoint positions in view i
    xy_j: np.ndarray,  # (M, 2) the same scene points in view j
    radius: int = 4,
    quantiles=(0.1, 0.25, 0.5, 0.75, 0.9),
):
    """Histogram-style constraints from the MATCHED region of a view pair
    (ref: colorHarmonization/GainOffsetConstraintBuilder.cpp — the
    reference builds constraints from the histograms of the common region;
    here the common region is the set of matched-feature patches, whose
    per-point means correspond 1:1 across the pair, so corresponding
    quantiles must map onto each other under the gain/offset).

    Returns (q_i, q_j) arrays of len(quantiles)."""
    if len(xy_i) == 0:
        return np.zeros(0), np.zeros(0)
    s_i = patch_means(img_i, xy_i, radius)
    s_j = patch_means(img_j, xy_j, radius)
    qs = np.asarray(quantiles)
    return np.quantile(s_i, qs), np.quantile(s_j, qs)
