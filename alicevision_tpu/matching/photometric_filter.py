"""Photometric match verification (the KVLD-style filter).

Counterpart of the reference's KVLD photometric-geometric match filter
(ref: src/aliceVision/matching/kvld/ — virtual line descriptors validating
matches photometrically). This implementation verifies each tentative
match by ZNCC between scale/orientation-normalized patches around the two
keypoints — the same photometric-consistency goal as KVLD's virtual lines,
expressed as one batched gather + reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..features.sift import _gather_rotated_patch


def patch_zncc_scores(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    xy1: jnp.ndarray,  # (M, 2) matched keypoints in image 1
    xy2: jnp.ndarray,  # (M, 2)
    scale1: jnp.ndarray,  # (M,)
    scale2: jnp.ndarray,
    ori1: jnp.ndarray,  # (M,) radians
    ori2: jnp.ndarray,
    patch: int = 12,
    mag: float = 3.0,
) -> jnp.ndarray:
    """ZNCC between normalized patches of each match -> (M,) in [-1, 1]."""

    def one(c1, c2, s1, s2, o1, o2):
        p1 = _gather_rotated_patch(img1, c1[0], c1[1], mag * s1 / patch * 2, o1, patch)
        p2 = _gather_rotated_patch(img2, c2[0], c2[1], mag * s2 / patch * 2, o2, patch)
        a = p1 - jnp.mean(p1)
        b = p2 - jnp.mean(p2)
        den = jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b)).clip(1e-9)
        return jnp.sum(a * b) / den

    return jax.vmap(one)(xy1, xy2, scale1, scale2, ori1, ori2)


def photometric_filter(
    img1,
    img2,
    feats1: dict,
    feats2: dict,
    pairs,  # (M, 2) tentative match index pairs
    min_zncc: float = 0.3,
):
    """Keep matches whose normalized patches correlate (KVLD-style gate).

    Returns the filtered (M', 2) pairs and the scores."""
    import numpy as np

    if len(pairs) == 0:
        return pairs, np.zeros(0)
    i1 = pairs[:, 0]
    i2 = pairs[:, 1]
    scores = patch_zncc_scores(
        jnp.asarray(img1),
        jnp.asarray(img2),
        jnp.asarray(feats1["xy"][i1], jnp.float32),
        jnp.asarray(feats2["xy"][i2], jnp.float32),
        jnp.asarray(feats1["scale"][i1], jnp.float32),
        jnp.asarray(feats2["scale"][i2], jnp.float32),
        jnp.asarray(feats1["orientation"][i1], jnp.float32),
        jnp.asarray(feats2["orientation"][i2], jnp.float32),
    )
    scores = np.asarray(scores)
    return pairs[scores >= min_zncc], scores
