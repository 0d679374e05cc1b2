"""Golden regression gates for the MVS + meshing stack.

Depth-map and mesh STATISTICS on the rendered box world are blessed into
tests/golden/ the same way SfM poses are (the reference's versioned
compatibilityData strategy, sfmDataIO/compatibilityData/): a refactor that
degrades depth accuracy/completeness or collapses the mesh now fails a
test instead of sailing through.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from alicevision_tpu.utils.rendered import default_boxes, render_views

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mvs_stats.npz")


def run_depth_golden():
    """SGM + two-stage refine on one rendered view; stats vs exact GT."""
    from alicevision_tpu.mvs.plane_sweep import SgmParams, sgm_depth_map
    from alicevision_tpu.mvs.refine import refine_depth_map_auto

    T = 4
    imgs, gt_depth, K, R, c = render_views(
        n_views=T + 1, wh=(320, 240), focal_px=280.0, arc=0.4
    )
    rc = 0
    order = list(range(1, T + 1))
    R_rel = np.stack([R[t] @ R[rc].T for t in order]).astype(np.float32)
    t_rel = np.stack([R[t] @ (c[rc] - c[t]) for t in order]).astype(np.float32)
    Kj = jnp.asarray(K, jnp.float32)
    Ktj = jnp.broadcast_to(Kj, (T, 3, 3))
    d_rng = (3.0, 10.0)
    depth, _ = sgm_depth_map(
        jnp.asarray(imgs[rc]), jnp.asarray(imgs[1:]), Kj, Ktj,
        jnp.asarray(R_rel), jnp.asarray(t_rel),
        d_rng[0], d_rng[1], SgmParams(n_depths=96),
    )
    depth, _ = refine_depth_map_auto(
        depth, jnp.asarray(imgs[rc]), jnp.asarray(imgs[1:]), Kj, Ktj,
        jnp.asarray(R_rel), jnp.asarray(t_rel), depth_range=d_rng,
    )
    depth = np.asarray(depth)
    gt = gt_depth[rc]
    interior = np.zeros(gt.shape, bool)
    interior[12:-12, 12:-12] = True
    valid = (depth > 0) & (gt > 0) & interior
    rel = np.abs(depth - gt)[valid] / gt[valid]
    return {
        "depth_median_rel_err": float(np.median(rel)),
        "depth_completeness_2pct": float((rel < 0.02).mean()),
        "depth_valid_frac": float(valid.mean()),
    }


def run_mesh_golden():
    """Graph-cut surface from GT depth maps; stats vs the analytic boxes."""
    from alicevision_tpu.mesh import (
        graph_cut_surface,
        laplacian_smooth,
        largest_component,
    )
    from alicevision_tpu.mvs.fusion import fuse_point_cloud

    V = 5
    imgs, gt_depth, K, R, c = render_views(
        n_views=V, wh=(160, 120), focal_px=140.0, arc=2.0
    )
    Ks = np.tile(K[None], (V, 1, 1))
    pts, _, views = fuse_point_cloud(
        gt_depth, None, Ks, R, c, voxel_size=0.06
    )
    verts, faces = graph_cut_surface(pts, np.arange(len(pts)), c[views])
    verts, faces = largest_component(verts, faces)
    verts = laplacian_smooth(verts, faces, iterations=2)
    # distance of each vertex to the nearest box surface (|sdf| of the
    # axis-aligned box union)
    boxes = default_boxes()
    lo, hi = boxes[:, 0], boxes[:, 1]
    q = np.maximum(
        lo[None] - verts[:, None, :], verts[:, None, :] - hi[None]
    )  # (N, B, 3)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(q.max(axis=-1), 0.0)
    dist = np.abs(outside + inside).min(axis=1)
    return {
        "mesh_n_vertices": float(len(verts)),
        "mesh_n_faces": float(len(faces)),
        "mesh_median_surf_dist": float(np.median(dist)),
        "mesh_p90_surf_dist": float(np.percentile(dist, 90)),
    }


@pytest.fixture(scope="module")
def stats():
    s = dict(run_depth_golden())
    s.update(run_mesh_golden())
    return s


def test_depth_quality_floor(stats):
    # absolute floors independent of the golden (scene scale ~5 units;
    # the frame includes sky/background so valid coverage sits near 37% —
    # the golden comparison pins the precise values)
    assert stats["depth_median_rel_err"] < 0.01
    assert stats["depth_completeness_2pct"] > 0.65
    assert stats["depth_valid_frac"] > 0.30


def test_mesh_quality_floor(stats):
    assert stats["mesh_n_faces"] > 500
    assert stats["mesh_median_surf_dist"] < 0.1  # ~2% of scene scale


def test_matches_golden(stats):
    """Regression gate vs the blessed stats (scripts/make_golden.py)."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated (scripts/make_golden.py)")
    g = np.load(GOLDEN)
    # depth stats must not regress by more than 25% relative
    assert stats["depth_median_rel_err"] <= 1.25 * float(
        g["depth_median_rel_err"]
    ) + 1e-4
    assert stats["depth_completeness_2pct"] >= 0.95 * float(
        g["depth_completeness_2pct"]
    )
    assert stats["mesh_median_surf_dist"] <= 1.3 * float(
        g["mesh_median_surf_dist"]
    ) + 1e-3
    # face count within a factor-2 band (topology stability)
    assert 0.5 * float(g["mesh_n_faces"]) <= stats["mesh_n_faces"]
    assert stats["mesh_n_faces"] <= 2.0 * float(g["mesh_n_faces"])
