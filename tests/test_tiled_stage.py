"""Stage-level tiled depth estimation: per-tile ROI depth lists + Hann merge.

ref: src/aliceVision/mvsUtils/TileParams.hpp:1 (tiling is the reference's
core large-image mechanism), mvsUtils/mapIO.hpp:28-127 (weighted merge),
depthMap/SgmDepthList.cpp:272-340 (per-ROI seed ranges). The tiled run must
be seam-free against the untiled run — within one depth-plane step.
"""

import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.rendered import render_views


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiled")
    V, W, H = 3, 512, 384
    imgs, gt_depth, K, R, c = render_views(
        n_views=V, wh=(W, H), focal_px=360.0, arc=0.35
    )
    img_dir = os.path.join(d, "imgs")
    os.makedirs(img_dir)
    sc = sfmdata.SfMData.empty()
    sc.add_intrinsic(1000, W, H, float(K[0, 0]))
    for v in range(V):
        vid = v + 1
        np.save(os.path.join(img_dir, f"{vid}.npy"), imgs[v])
        vi = sc.add_view(vid, 0, W, H)
        sc.set_pose(vi, R[v], c[v])
    # SfM landmarks from GT depth of view 0 on a sparse grid, observed by
    # every view they project into — the seeds the ROI depth lists use
    ys, xs = np.mgrid[8:H:24, 8:W:24]
    dpt = gt_depth[0, ys, xs]
    ok = dpt > 0
    ys, xs, dpt = ys[ok], xs[ok], dpt[ok]
    rays = np.stack(
        [(xs + 0.5 - K[0, 2]) / K[0, 0], (ys + 0.5 - K[1, 2]) / K[1, 1],
         np.ones_like(dpt)], -1,
    )
    pts = (rays * dpt[:, None]) @ R[0] + c[0]
    lm, vw, uv = [], [], []
    for v in range(V):
        xc = (pts - c[v]) @ R[v].T
        z = xc[:, 2]
        u = K[0, 0] * xc[:, 0] / z + K[0, 2]
        w_ = K[1, 1] * xc[:, 1] / z + K[1, 2]
        vis = (z > 0.1) & (u >= 0) & (u < W) & (w_ >= 0) & (w_ < H)
        idx = np.nonzero(vis)[0]
        lm.append(idx)
        vw.append(np.full(len(idx), v))
        uv.append(np.stack([u[idx], w_[idx]], -1))
    sc.set_structure(
        pts, np.concatenate(lm), np.concatenate(vw), np.concatenate(uv)
    )
    scene = os.path.join(d, "scene.sfm")
    sfmdata.save(sc, scene)
    return str(d), scene, img_dir, gt_depth


def _run(scene, img_dir, out, **kw):
    stages.depth_map_estimation(
        scene, img_dir, out, n_depths=64, n_tcams=2, downscale=1,
        range_size=1, **kw,
    )
    return np.load(os.path.join(out, "1_depth.npy"))


def test_tiled_stage_matches_untiled(scene_dir):
    d, scene, img_dir, gt_depth = scene_dir
    d_full = _run(scene, img_dir, os.path.join(d, "full"))
    d_tiled = _run(
        scene, img_dir, os.path.join(d, "tiled"),
        tile_size=288, tile_overlap=64,
    )
    assert d_tiled.shape == d_full.shape
    valid = (d_full > 0) & (d_tiled > 0)
    assert valid.mean() > 0.8
    # one plane step at depth d for a 64-plane inverse grid over the scene
    # range: |delta inv| = span/63 -> |delta d| ~ d^2 * step_inv
    inv_span = np.abs(1.0 / max(d_full[valid].min(), 1e-3)
                      - 1.0 / d_full[valid].max())
    step = (d_full**2) * (inv_span / 63.0)
    # GT is the honest parity anchor: per-tile depth GRIDS legitimately
    # differ (that is the point of ROI seeding), so tiled-vs-untiled
    # differences include benign re-quantization; both runs must sit
    # within a plane step of GROUND TRUTH (sub-step via subpixel refine)
    gt = gt_depth[0]
    gv = valid & (gt > 0)
    med_tiled = np.median((np.abs(d_tiled - gt) / step)[gv])
    med_full = np.median((np.abs(d_full - gt) / step)[gv])
    assert med_full < 1.0
    assert med_tiled < 1.0, f"tiled map off GT by {med_tiled:.2f} steps"
    # seam-freeness: disagreement must NOT concentrate at tile borders
    big = (np.abs(d_tiled - d_full) / step > 1.5) & valid
    seam_band = np.zeros_like(big)
    for s in (288 - 64, 288):  # tile step boundaries (tile 288, overlap 64)
        seam_band[max(s - 4, 0) : s + 4, :] = True
        seam_band[:, max(s - 4, 0) : s + 4] = True
    frac_band = big[seam_band & valid].mean()
    frac_global = big[valid].mean()
    assert frac_band < 2.0 * frac_global + 0.05, (
        f"seam concentration: {frac_band:.3f} vs global {frac_global:.3f}"
    )


def test_roi_depth_list_narrows_range(scene_dir):
    """A tile's ROI depth list spans only its own landmarks' depths —
    strictly inside the full-view range on this depth-varying scene
    (SgmDepthList.cpp ROI semantics)."""
    d, scene, img_dir, gt_depth = scene_dir
    sc = sfmdata.load(scene)
    from alicevision_tpu.mvs.depth_list import view_depth_range

    p = int(sc.view_pose[0])
    R0, c0 = sc.pose_R[p], sc.pose_c[p]
    full = view_depth_range(
        sc.points, sc.obs_landmark, sc.obs_view, sc.obs_uv, 0, R0, c0
    )
    half = view_depth_range(
        sc.points, sc.obs_landmark, sc.obs_view, sc.obs_uv, 0, R0, c0,
        roi=(0, 0, 256, 192),
    )
    assert full is not None and half is not None
    assert half[1] - half[0] < (full[1] - full[0]) + 1e-9
    assert half[2] < full[2]  # fewer seeds in the quarter ROI
