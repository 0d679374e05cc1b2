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
