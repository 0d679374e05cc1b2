"""Descriptor matching: MXU brute-force and cascade hashing, ratio test.

TPU-native re-design of the reference's matchers
(ref: src/aliceVision/matching/ArrayMatcher_bruteForce.hpp,
CascadeHasher.hpp:64-104, filters.hpp distance-ratio, guidedMatching.hpp).

On the MXU, the exact L2 top-2 search *is* a matmul — so brute force is the
fast path here, unlike the CPU reference where cascade hashing exists to
avoid O(N*M*128) work. Cascade hashing is still provided with the same
structure as the reference (128-bit primary hash, hamming pre-filter,
exact L2 re-rank of the top candidates): its hamming stage is a ±1 matmul,
so both stages ride the MXU.

All functions take fixed-capacity descriptor arrays with validity masks and
return fixed-size match tables (index into the second set, -1 = no match).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


class Matches(NamedTuple):
    idx2: jnp.ndarray  # (N,) int32 — match of descriptor i in set 2, -1 = none
    dist: jnp.ndarray  # (N,) float32 — L2^2 distance of the accepted match


def _pairwise_sqdist(d1, d2):
    """||a-b||^2 via the matmul identity (MXU path, f32 accumulation)."""
    n1 = jnp.sum(d1 * d1, axis=-1, keepdims=True)
    n2 = jnp.sum(d2 * d2, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("cross_check",))
def match_bruteforce(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
    cross_check: bool = True,
) -> Matches:
    """Exact top-2 NN with Lowe ratio filtering.

    d1: (N, D), d2: (M, D) float descriptors; returns per-row matches.
    """
    dist = _pairwise_sqdist(d1, d2)
    dist = jnp.where(valid2[None, :], dist, _BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
    best = idx_top2[:, 0]
    d_best = -neg_top2[:, 0]
    d_second = -neg_top2[:, 1]
    # Lowe ratio on squared distances: d1 < (ratio^2) * d2.
    ok = valid1 & (d_best < (ratio * ratio) * d_second) & (d_best < _BIG)

    if cross_check:
        dist_t = jnp.where(valid1[:, None], dist, _BIG)
        back = jnp.argmin(dist_t, axis=0)  # (M,) best row for each column
        ok = ok & (back[best] == jnp.arange(d1.shape[0]))

    return Matches(
        idx2=jnp.where(ok, best, -1).astype(jnp.int32),
        dist=jnp.where(ok, d_best, _BIG),
    )


def match_bruteforce_hamming(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
    cross_check: bool = True,
) -> Matches:
    """BRUTE_FORCE_HAMMING for binary descriptors stored as {0,1} floats
    (MLDB/AKAZE binary path — ref: matching/matcherType.hpp
    BRUTE_FORCE_HAMMING, ArrayMatcher_bruteForce with Hamming metric).

    For 0/1 vectors the squared-L2 distance equals the Hamming distance,
    so the MXU matmul identity of match_bruteforce computes exact Hamming
    top-2 directly — no bit packing or population counts needed on TPU.
    The returned dist is the Hamming distance (a float count of differing
    bits)."""
    return match_bruteforce(d1, d2, valid1, valid2, ratio, cross_check)


def match_ann_l2(d1, d2, valid1, valid2, ratio: float = 0.8) -> Matches:
    """ANN_L2 — approximate NN via a host-side kd-tree
    (ref: matching/ArrayMatcher_kdtreeFlann.hpp). Provided for method
    parity with the reference CLI; on TPU the exact matmul matchers
    (BRUTE_FORCE_L2 / CASCADE_HASHING_L2) are faster, so this path targets
    CPU-only hosts driving very large descriptor sets."""
    import numpy as np
    from scipy.spatial import cKDTree

    d1 = np.asarray(d1, np.float32)
    d2 = np.asarray(d2, np.float32)
    v1 = np.asarray(valid1, bool)
    v2 = np.asarray(valid2, bool)
    idx2 = np.nonzero(v2)[0]
    out_idx = np.full(len(d1), -1, np.int32)
    out_dist = np.full(len(d1), _BIG, np.float32)
    if len(idx2) >= 2 and v1.any():
        tree = cKDTree(d2[idx2])
        dd, ii = tree.query(d1[v1], k=2)
        best = idx2[ii[:, 0]]
        ok = dd[:, 0] ** 2 < (ratio * ratio) * dd[:, 1] ** 2
        rows = np.nonzero(v1)[0]
        out_idx[rows[ok]] = best[ok]
        out_dist[rows[ok]] = (dd[ok, 0] ** 2).astype(np.float32)
    return Matches(idx2=jnp.asarray(out_idx), dist=jnp.asarray(out_dist))


def make_hash_projection(key: jax.Array, dim: int = 128, bits: int = 128) -> jnp.ndarray:
    """Random Gaussian projection for the primary hash
    (ref: CascadeHasher.hpp:80 — 128-bit primary hash)."""
    return jax.random.normal(key, (dim, bits), jnp.float32)


@partial(jax.jit, static_argnames=("n_candidates",))
def match_cascade_hash(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    proj: jnp.ndarray,
    mean: jnp.ndarray,
    ratio: float = 0.8,
    n_candidates: int = 64,
) -> Matches:
    """Two-stage cascade-hash matching.

    Stage 1: 128-bit sign hash of (desc - mean) @ proj; hamming distances
    computed as a ±1 matmul. Stage 2: exact L2 top-2 re-rank over the
    n_candidates best hamming candidates per query.
    """
    s1 = jnp.sign((d1 - mean) @ proj)  # (N, B) in {-1, 0, 1}
    s2 = jnp.sign((d2 - mean) @ proj)
    # hamming = (B - dot)/2 — monotone in -dot, so rank by dot directly.
    dots = jax.lax.dot_general(
        s1, s2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dots = jnp.where(valid2[None, :], dots, -1e9)
    _, cand = jax.lax.top_k(dots, n_candidates)  # (N, C)

    d2c = d2[cand]  # (N, C, D)
    diff = d1[:, None, :] - d2c
    dist = jnp.sum(diff * diff, axis=-1)  # (N, C)
    dist = jnp.where(valid2[cand], dist, _BIG)
    neg_top2, it2 = jax.lax.top_k(-dist, 2)
    best = jnp.take_along_axis(cand, it2[:, :1], axis=1)[:, 0]
    d_best = -neg_top2[:, 0]
    d_second = -neg_top2[:, 1]
    ok = valid1 & (d_best < (ratio * ratio) * d_second) & (d_best < _BIG)
    return Matches(
        idx2=jnp.where(ok, best, -1).astype(jnp.int32),
        dist=jnp.where(ok, d_best, _BIG),
    )


@partial(jax.jit, static_argnames=())
def guided_match_epipolar(
    F: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    max_epipolar_px: float = 4.0,
    ratio: float = 0.8,
) -> Matches:
    """Descriptor matching restricted to an epipolar band
    (ref: matching/guidedMatching.hpp — GeometricFilter functor for F).

    Candidates outside the band get infinite distance; otherwise exact L2.
    """
    from ..multiview.epipolar import epipolar_distance_sq

    # Epipolar distance of every pair (i, j): line of x1_i against x2_j.
    n = xy1.shape[0]
    m = xy2.shape[0]
    ones1 = jnp.ones((n, 1), xy1.dtype)
    p1 = jnp.concatenate([xy1, ones1], axis=-1)
    l2 = p1 @ F.T  # (N, 3) epipolar lines in image 2
    num = (l2[:, None, 0] * xy2[None, :, 0] + l2[:, None, 1] * xy2[None, :, 1] + l2[:, None, 2:3][..., 0]) ** 2
    den = (l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None].clip(1e-12)
    band = num / den <= max_epipolar_px**2  # (N, M)

    dist = _pairwise_sqdist(d1, d2)
    dist = jnp.where(band & valid2[None, :], dist, _BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
    best = idx_top2[:, 0]
    d_best = -neg_top2[:, 0]
    d_second = -neg_top2[:, 1]
    ok = valid1 & (d_best < (ratio * ratio) * d_second) & (d_best < _BIG)
    return Matches(
        idx2=jnp.where(ok, best, -1).astype(jnp.int32),
        dist=jnp.where(ok, d_best, _BIG),
    )


@partial(jax.jit, static_argnames=())
def guided_match_homography(
    H: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    max_transfer_px: float = 4.0,
    ratio: float = 0.8,
) -> Matches:
    """Descriptor matching restricted to a homography transfer disc
    (ref: matching/guidedMatching.hpp — the H-model functor)."""
    ones1 = jnp.ones((xy1.shape[0], 1), xy1.dtype)
    p1 = jnp.concatenate([xy1, ones1], axis=-1)
    Hp = p1 @ H.T
    z = jnp.where(jnp.abs(Hp[:, 2:]) < 1e-12, 1e-12, Hp[:, 2:])
    proj = Hp[:, :2] / z  # (N, 2) predicted positions in image 2
    d2sq = jnp.sum((proj[:, None, :] - xy2[None, :, :]) ** 2, axis=-1)
    band = d2sq <= max_transfer_px**2

    dist = _pairwise_sqdist(d1, d2)
    dist = jnp.where(band & valid2[None, :], dist, _BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
    best = idx_top2[:, 0]
    d_best = -neg_top2[:, 0]
    d_second = -neg_top2[:, 1]
    ok = valid1 & (d_best < (ratio * ratio) * d_second) & (d_best < _BIG)
    return Matches(
        idx2=jnp.where(ok, best, -1).astype(jnp.int32),
        dist=jnp.where(ok, d_best, _BIG),
    )


def matches_to_pairs(matches: Matches):
    """Host helper: (N,) match table -> (K, 2) index pairs (numpy)."""
    import numpy as np

    idx2 = np.asarray(matches.idx2)
    rows = np.nonzero(idx2 >= 0)[0]
    return np.stack([rows, idx2[rows]], axis=-1)
