"""Graph-cut seam optimization vs distance-transform labels.

Ref: panorama/graphcut.hpp GraphcutSeams + seams.cpp — the cut routes the
seam around parallax/moving-object disagreement; distance labels cut
straight through it.
"""

import numpy as np
import jax.numpy as jnp

from alicevision_tpu.panorama.compositing import seam_labels
from alicevision_tpu.panorama.graphcut_seams import (
    graphcut_seam_labels,
    seam_cost,
)


def _parallax_pair(H=96, W=160, shift=6, seed=0):
    """Two views of a textured scene; a bright square 'object' appears at
    different positions (parallax). Overlap covers the middle band."""
    rng = np.random.default_rng(seed)
    base = rng.random((H, W + shift)) * 0.2
    img0 = base[:, :W].copy()
    img1 = base[:, shift:].copy()
    # the object: displaced differently in the two views
    y0, x0, s = H // 2 - 12, W // 2 - 20, 24
    img0[y0 : y0 + s, x0 : x0 + s] += 0.8
    img1[y0 : y0 + s, x0 + 10 : x0 + 10 + s] += 0.8
    masks = np.zeros((2, H, W), bool)
    masks[0, :, : W * 2 // 3] = True
    masks[1, :, W // 3 :] = True
    return np.stack([img0, img1]), masks


def test_graphcut_improves_seam_cost():
    warped, masks = _parallax_pair()
    wta = np.asarray(seam_labels(jnp.asarray(masks)))
    cut = graphcut_seam_labels(warped, masks, init_labels=wta)
    c_wta = seam_cost(warped, wta)
    c_cut = seam_cost(warped, cut)
    assert c_cut < c_wta * 0.7, (c_cut, c_wta)
    # full coverage preserved
    assert np.all((cut >= 0) == masks.any(axis=0))
    # labels only where the view actually covers the pixel
    for v in range(2):
        assert np.all(masks[v].reshape(-1)[(cut == v).reshape(-1)])


def test_graphcut_avoids_moving_object():
    """The optimized seam must not cross the displaced object: along the
    seam, the two images should nearly agree."""
    warped, masks = _parallax_pair()
    cut = graphcut_seam_labels(warped, masks)
    lab = cut
    H, W = lab.shape
    diffs = []
    for du, dv in ((0, 1), (1, 0)):
        lp = lab[: H - du, : W - dv]
        lq = lab[du:, dv:]
        sel = (lp >= 0) & (lq >= 0) & (lp != lq)
        d = np.abs(warped[0] - warped[1])[: H - du, : W - dv]
        diffs.append(d[sel])
    seam_diff = np.concatenate(diffs)
    assert len(seam_diff) > 0
    # the object adds 0.8 contrast; a seam through it would carry that
    assert np.quantile(seam_diff, 0.95) < 0.4, np.quantile(seam_diff, 0.95)


def test_graphcut_three_views_coverage():
    rng = np.random.default_rng(1)
    H, W = 64, 120
    warped = rng.random((3, H, W)) * 0.1
    masks = np.zeros((3, H, W), bool)
    masks[0, :, :60] = True
    masks[1, :, 30:90] = True
    masks[2, :, 60:] = True
    cut = graphcut_seam_labels(warped, masks, sweeps=2)
    assert np.all((cut >= 0) == masks.any(axis=0))
    for v in range(3):
        assert np.all(masks[v].reshape(-1)[(cut == v).reshape(-1)])
