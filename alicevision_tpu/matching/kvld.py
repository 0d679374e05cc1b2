"""K-VLD match validation: Virtual Line Descriptors.

TPU-native counterpart of the reference's KVLD filter
(ref: src/aliceVision/matching/kvld/kvld.h — dimension=10 SIFT-like disks
along the virtual line between two matches, 24-bin main directions,
gvld-consistency score thresholded at juge=0.35, matches kept when enough
neighbor matches are photometrically consistent with them).

Design: instead of the reference's per-pair loops with early exits, every
candidate match pair becomes one row of a batched segment-descriptor
computation — `dimension` disks per segment, each disk an 8x8 resampled
patch reduced to a gradient-orientation histogram (vmap over segments, one
gather per disk grid). The pair budget is bounded by taking each match's
nearest neighbor matches, which keeps the batch shape static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..features.sift import _gather_rotated_patch

DIMENSION = 10  # disks per virtual line (kvld.h:39)
N_ORI = 8  # orientation bins per disk
BIN_NUM = 24  # main-direction bins (kvld.h:41)
JUGE = 0.35  # consistency threshold (kvld.h:32)
MIN_DIST = 10.0  # minimal segment length in px (kvld.h:35)


def _vld_segment(img, a, b):
    """VLD of segment a->b in img: per-disk orientation histograms
    (DIMENSION, N_ORI), main angles (DIMENSION,), weights (DIMENSION,)."""
    d = b - a
    length = jnp.linalg.norm(d).clip(1e-6)
    ang = jnp.arctan2(d[1], d[0])
    radius = length / (DIMENSION * 1.0)  # disks tiling the segment
    G = 8

    def disk(i):
        t = (i + 0.5) / DIMENSION
        c = a + t * d
        patch = _gather_rotated_patch(img, c[0], c[1], 2.0 * radius / G, ang, G)
        gx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
        gy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
        mag = jnp.sqrt(gx * gx + gy * gy)
        th = jnp.arctan2(gy, gx)  # relative to segment (patch is rotated)
        binf = (th + jnp.pi) / (2 * jnp.pi) * N_ORI
        b0 = jnp.floor(binf).astype(jnp.int32) % N_ORI
        hist = jnp.zeros((N_ORI,)).at[b0.reshape(-1)].add(mag.reshape(-1))
        w = jnp.sum(mag)
        # main direction on a finer circular grid (BIN_NUM)
        bm = jnp.floor((th + jnp.pi) / (2 * jnp.pi) * BIN_NUM).astype(jnp.int32) % BIN_NUM
        hm = jnp.zeros((BIN_NUM,)).at[bm.reshape(-1)].add(mag.reshape(-1))
        main = jnp.argmax(hm)
        return hist / jnp.sum(hist).clip(1e-9), main, w

    hists, mains, ws = jax.vmap(disk)(jnp.arange(DIMENSION))
    return hists, mains, ws / jnp.sum(ws).clip(1e-9)


def _pair_score(img1, img2, a1, b1, a2, b2):
    """gvld-style consistency of the virtual line in both images: weighted
    histogram distance + circular main-angle difference
    (kvld.h:110-123)."""
    h1, m1, w1 = _vld_segment(img1, a1, b1)
    h2, m2, w2 = _vld_segment(img2, a2, b2)
    w = 0.5 * (w1 + w2)
    d_desc = jnp.sum(w * jnp.sum(jnp.abs(h1 - h2), axis=-1)) * 0.5
    dm = jnp.abs(m1 - m2)
    dm = jnp.minimum(dm, BIN_NUM - dm).astype(jnp.float32)
    d_ang = jnp.sum(w * dm) * (0.64 / BIN_NUM) * 4.0
    return d_desc * 0.5 + d_ang * 0.5


def kvld_filter(
    img1,
    img2,
    xy1: np.ndarray,  # (M, 2) matched keypoint positions in image 1
    xy2: np.ndarray,  # (M, 2) in image 2
    n_neighbors: int = 10,
    min_support: int = 2,
    juge: float = JUGE,
    min_dist: float = MIN_DIST,
    max_length_ratio: float = 2.0,
) -> np.ndarray:
    """Keep matches supported by >= min_support consistent virtual lines.

    Returns (M,) bool. Pair candidates are each match's n_neighbors nearest
    matches (static batch); a pair is geometrically admissible when both
    segments are longer than min_dist and their length ratio is bounded,
    and photometrically consistent when the gvld score is below juge.
    """
    xy1 = np.asarray(xy1, np.float32)
    xy2 = np.asarray(xy2, np.float32)
    M = len(xy1)
    if M < min_support + 1:
        return np.ones(M, bool)
    k = min(n_neighbors, M - 1)

    d = np.linalg.norm(xy1[:, None] - xy1[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nbr = np.argpartition(d, k - 1, axis=1)[:, :k]  # (M, k)
    ii = np.repeat(np.arange(M), k)
    jj = nbr.reshape(-1)

    len1 = np.linalg.norm(xy1[ii] - xy1[jj], axis=-1)
    len2 = np.linalg.norm(xy2[ii] - xy2[jj], axis=-1)
    ratio = np.maximum(len1, len2) / np.maximum(np.minimum(len1, len2), 1e-6)
    admissible = (len1 > min_dist) & (len2 > min_dist) & (ratio < max_length_ratio)

    sel = np.nonzero(admissible)[0]
    if len(sel) == 0:
        return np.ones(M, bool)
    cap = 1 << int(np.ceil(np.log2(max(len(sel), 64))))
    pad = cap - len(sel)
    si = np.concatenate([ii[sel], np.zeros(pad, np.int64)])
    sj = np.concatenate([jj[sel], np.zeros(pad, np.int64)])

    scores = np.asarray(
        jax.vmap(
            lambda a1, b1, a2, b2: _pair_score(
                jnp.asarray(img1), jnp.asarray(img2), a1, b1, a2, b2
            )
        )(
            jnp.asarray(xy1[si]),
            jnp.asarray(xy1[sj]),
            jnp.asarray(xy2[si]),
            jnp.asarray(xy2[sj]),
        )
    )[: len(sel)]

    consistent = scores < juge
    support = np.zeros(M, np.int64)
    np.add.at(support, ii[sel][consistent], 1)
    np.add.at(support, jj[sel][consistent], 1)
    return support >= min_support
