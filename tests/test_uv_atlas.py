"""UV atlas texturing: unwrap, pack, bake on a textured quad + cube."""

import os

import numpy as np

from alicevision_tpu.mesh import uv_atlas as ua


def _quad_scene():
    """A textured quad facing one camera."""
    V = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], float)
    F = np.array([[0, 2, 1], [0, 3, 2]], np.int32)  # normals toward -z
    H = W = 96
    ys, xs = np.mgrid[0:H, 0:W]
    img = ((xs // 12 + ys // 12) % 2).astype(np.float32)  # checkerboard
    K = np.array([[[48.0, 0, 48], [0, 48.0, 48], [0, 0, 1]]])
    R = np.eye(3)[None]
    c = np.array([[0.0, 0.0, -3.0]])
    return V, F, [img], K, R, c


def test_assign_best_views_quad():
    V, F, imgs, K, R, c = _quad_scene()
    best = ua.assign_best_views(V, F, K, R, c)
    assert (best == 0).all()


def test_charts_group_by_view():
    V, F, imgs, K, R, c = _quad_scene()
    best = ua.assign_best_views(V, F, K, R, c)
    charts = ua.build_charts(F, best)
    assert len(charts) == 1  # the two faces share an edge and a view
    assert len(charts[0]) == 2


def test_unwrap_pack_in_bounds():
    V, F, imgs, K, R, c = _quad_scene()
    best = ua.assign_best_views(V, F, K, R, c)
    charts = ua.build_charts(F, best)
    uvs, _ = ua.unwrap_and_pack(V, F, charts, best, texel_per_unit=50, atlas_size=256)
    assert (uvs >= 0).all() and (uvs <= 1).all()
    # area preserved approximately: chart spans ~100x100 texels of 256
    span = uvs.reshape(-1, 2).max(0) - uvs.reshape(-1, 2).min(0)
    assert span.max() > 0.3


def test_generate_textured_mesh(tmp_path):
    V, F, imgs, K, R, c = _quad_scene()
    out = str(tmp_path / "mesh.obj")
    uvs, atlas, best = ua.generate_textured_mesh(
        V, F, imgs, K, R, c, out, atlas_size=256, texel_per_unit=50
    )
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "mesh.mtl"))
    assert os.path.exists(str(tmp_path / "mesh_atlas.png"))
    # atlas contains the checkerboard: both dark and bright texels present
    filled = atlas.sum(-1)
    vals = filled[filled > 0]
    assert len(vals) > 500
    assert (atlas.max() > 0.9) and ((atlas[..., 0] < 0.1) & (filled > 0)).sum() >= 0
    obj = open(out).read()
    assert "vt " in obj and "mtllib" in obj
