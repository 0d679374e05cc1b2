"""SGM quality calibration on the rendered ground-truth box scene:
quantifies 4-dir vs 8-dir aggregation, guided-filter aggregation, and the
SfM-seeded per-view depth list against exact depths (VERDICT r2 items 4 &
10 — evidence-based defaults instead of uncalibrated options).

ref: src/aliceVision/depthMap/SgmParams.hpp:30-34 (axes/penalties),
SgmDepthList.cpp (seeded depth ranges)."""

import numpy as np
import jax.numpy as jnp
import pytest

from alicevision_tpu.mvs import plane_sweep as ps
from alicevision_tpu.mvs.depth_list import sgm_depth_list, view_depth_range
from alicevision_tpu.utils.rendered import render_views


@pytest.fixture(scope="module")
def rendered():
    imgs, depths, K, R, c = render_views(n_views=5, wh=(256, 192), arc=0.45)
    return imgs, depths, K, R, c


def _run_sgm(rendered, params, d_lo=3.0, d_hi=9.0, depth_list=None,
             tc_ranges=None):
    imgs, depths_gt, K, R, c = rendered
    rc = 2
    order = [0, 1, 3, 4]
    R_rel = np.stack([R[t] @ R[rc].T for t in order])
    t_rel = np.stack([R[t] @ (c[rc] - c[t]) for t in order])
    depth, sim = ps.sgm_depth_map(
        jnp.asarray(imgs[rc]),
        jnp.asarray(imgs[order]),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(np.broadcast_to(K, (4, 3, 3)), jnp.float32),
        jnp.asarray(R_rel, jnp.float32),
        jnp.asarray(t_rel, jnp.float32),
        d_lo, d_hi, params,
        depths=depth_list, tc_depth_ranges=tc_ranges,
    )
    return np.asarray(depth), depths_gt[rc]


def _metrics(depth, gt):
    """(median abs error, inlier fraction at 0.25) — robust metrics; RMSE
    is dominated by the occlusion-boundary tail on any depth map."""
    sel = (gt > 0) & (depth > 0)
    sel[:16] = sel[-16:] = False
    sel[:, :16] = sel[:, -16:] = False
    assert sel.mean() > 0.2
    err = np.abs(depth[sel] - gt[sel])
    return float(np.median(err)), float((err < 0.25).mean())


def test_sgm_4dir_accuracy(rendered):
    d, gt = _run_sgm(rendered, ps.SgmParams(n_depths=64))
    med, inl = _metrics(d, gt)
    # depth range ~[3.4, 7.9], plane spacing ~0.08 at mid-depth: median
    # error well under one plane step, >=80% of pixels within 3 steps
    assert med < 0.05, (med, inl)
    assert inl > 0.8, (med, inl)


def test_sgm_8dir_non_inferior(rendered):
    d4, gt = _run_sgm(rendered, ps.SgmParams(n_depths=64, n_dirs=4))
    d8, _ = _run_sgm(rendered, ps.SgmParams(n_depths=64, n_dirs=8))
    m4, i4 = _metrics(d4, gt)
    m8, i8 = _metrics(d8, gt)
    # 8-dir must not degrade the default scene (the extra diagonal paths
    # buy on slanted surfaces, cost nothing here) — pin non-inferiority
    assert m8 < m4 * 1.25 + 0.005 and i8 > i4 - 0.03, (m4, m8, i4, i8)


def test_sgm_guided_filter_non_inferior(rendered):
    d0, gt = _run_sgm(rendered, ps.SgmParams(n_depths=64))
    dg, _ = _run_sgm(rendered, ps.SgmParams(n_depths=64, guided_radius=4))
    m0, i0 = _metrics(d0, gt)
    mg, ig = _metrics(dg, gt)
    assert mg < m0 * 1.25 + 0.005 and ig > i0 - 0.03, (m0, mg, i0, ig)


def test_seeded_depth_list_beats_global_range(rendered):
    """SfM-seeded per-view list at a SMALLER D must match or beat the
    global wide range at larger D (the whole point of SgmDepthList)."""
    imgs, depths_gt, K, R, c = rendered
    rc = 2
    order = [0, 1, 3, 4]
    # fake sparse SfM landmarks: subsample GT depth pixels of rc
    ys, xs = np.mgrid[8:184:12, 8:248:12]
    sel = depths_gt[rc][ys, xs] > 0
    pix = np.stack([xs[sel], ys[sel]], -1).astype(np.float64)
    z = depths_gt[rc][ys, xs][sel].astype(np.float64)
    rays = np.column_stack([
        (pix[:, 0] + 0.5 - K[0, 2]) / K[0, 0],
        (pix[:, 1] + 0.5 - K[1, 2]) / K[1, 1],
        np.ones(len(pix)),
    ])
    pts = c[rc] + (rays * z[:, None]) @ R[rc]  # world points
    L = len(pts)
    obs_landmark = np.arange(L, dtype=np.int32)
    obs_view = np.full(L, rc, np.int32)
    obs_uv = pix

    rng = view_depth_range(
        pts, obs_landmark, obs_view, obs_uv, rc, R[rc], c[rc]
    )
    assert rng is not None
    d_lo, d_hi, n_obs = rng
    # seeded range must be MUCH tighter than the global (0.5, 30) guess
    assert d_lo > 2.0 and d_hi < 12.0 and n_obs > 50

    hw = {v: (256, 192) for v in range(5)}
    dl = sgm_depth_list(
        pts, obs_landmark, obs_view, obs_uv, rc,
        {v: R[v] for v in range(5)}, {v: c[v] for v in range(5)},
        {v: K for v in range(5)}, hw, order, n_depths=40,
    )
    assert len(dl.depths) == 40
    assert np.all(dl.tc_limits[:, 1] > dl.tc_limits[:, 0])
    tc_ranges = np.stack(
        [dl.depths[dl.tc_limits[:, 0]],
         dl.depths[np.clip(dl.tc_limits[:, 1] - 1, 0, 39)]], axis=1
    ).astype(np.float32)

    d_seeded, gt = _run_sgm(
        rendered, ps.SgmParams(n_depths=40),
        depth_list=dl.depths, tc_ranges=tc_ranges,
    )
    d_global, _ = _run_sgm(
        rendered, ps.SgmParams(n_depths=64), d_lo=0.5, d_hi=30.0
    )
    m_seeded, i_seeded = _metrics(d_seeded, gt)
    m_global, i_global = _metrics(d_global, gt)
    # 40 seeded planes beat 64 planes spread over the blind global range
    assert m_seeded <= m_global, (m_seeded, m_global)
    assert i_seeded >= i_global - 0.01, (i_seeded, i_global)
