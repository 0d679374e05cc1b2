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


def _two_view_quad():
    """A quad seen by two cameras whose images have a brightness offset —
    the fixture where hard best-view assignment leaves a seam."""
    V = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], float)
    F = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    H = W = 96
    ys, xs = np.mgrid[0:H, 0:W]
    base = 0.5 + 0.25 * np.sin(xs / 6.0).astype(np.float32)
    imgs = [base.astype(np.float32), (base + 0.3).clip(0, 1).astype(np.float32)]
    K = np.tile(np.array([[48.0, 0, 48], [0, 48.0, 48], [0, 0, 1]]), (2, 1, 1))
    R = np.tile(np.eye(3), (2, 1, 1))
    # camera 0 favors the left face, camera 1 the right face
    c = np.array([[-0.8, 0.0, -3.0], [0.8, 0.0, -3.0]])
    return V, F, imgs, K, R, c


def test_multiband_fusion_blends_exposure_offset():
    """Multi-band fusion pulls the two exposures together: the mean level
    difference between the two faces' texels is far below the hard-assignment
    seam (0.3 offset)."""
    V, F, imgs, K, R, c = _two_view_quad()
    scores = ua.face_view_scores(V, F, K, R, c)
    best = np.argmax(scores, axis=0)
    charts = ua.build_charts(F, best)
    uvs, _ = ua.unwrap_and_pack(V, F, charts, best, texel_per_unit=60, atlas_size=256)

    hard, filled_h = ua.rasterize_atlas(V, F, uvs, best, imgs, K, R, c, 256)
    soft, filled_s = ua.rasterize_atlas_multiband(
        V, F, uvs, scores, imgs, K, R, c, 256, top_k=2, levels=4
    )
    assert filled_s.sum() > 1000

    pos, fid = ua.rasterize_geometry(V, F, uvs, 256)
    m0 = (fid == 0)
    m1 = (fid == 1)
    # faces split between views under hard assignment -> visible level jump
    if best[0] != best[1]:
        jump_hard = abs(hard[m0, 0].mean() - hard[m1, 0].mean())
        jump_soft = abs(soft[m0, 0].mean() - soft[m1, 0].mean())
        assert jump_soft < jump_hard * 0.6, (jump_hard, jump_soft)


def test_bake_normal_height_maps_sphere():
    """Bake a dense sphere onto a coarse octahedron: baked normals point
    radially, heights are positive where the sphere bulges over the flat
    coarse faces."""
    # dense sphere
    rng = np.random.RandomState(0)
    from scipy.spatial import ConvexHull

    P = rng.randn(800, 3)
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    hull = ConvexHull(P)
    dense_F = hull.simplices.astype(np.int32)
    # scipy does not orient simplices; flip each so its normal points outward
    tri = P[dense_F]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.sum(n * tri.mean(1), axis=1) < 0
    dense_F[flip] = dense_F[flip][:, [0, 2, 1]]
    dense_V = P

    # coarse octahedron (inscribed)
    oct_V = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], float)
    oct_F = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    charts = [np.array([i]) for i in range(len(oct_F))]
    uvs, _ = ua.unwrap_and_pack(
        oct_V, oct_F, charts, np.zeros(len(oct_F), np.int64),
        texel_per_unit=40, atlas_size=256,
    )
    nmap, hmap, filled = ua.bake_normal_height_maps(
        oct_V, oct_F, uvs, dense_V, dense_F, atlas_size=256
    )
    assert filled.sum() > 2000
    # normals are unit and mostly radial: compare against texel positions
    pos, fid = ua.rasterize_geometry(oct_V, oct_F, uvs, 256)
    p = pos[filled]
    r = p / np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-9)
    n = nmap[filled]
    cos = np.sum(n * r, axis=1)
    assert np.mean(cos > 0.9) > 0.9
    # octahedron is inside the unit sphere -> heights along outward normals
    # are positive except at the (touching) vertices
    h = hmap[filled]
    assert np.mean(h > -1e-6) > 0.95
    assert h.max() > 0.1  # face centers sit ~0.42 under the sphere


def test_generate_textured_mesh_multiband_and_bake(tmp_path):
    V, F, imgs, K, R, c = _two_view_quad()
    dense_V = np.array(V, copy=True)
    dense_F = np.array(F, copy=True)
    out = str(tmp_path / "mesh.obj")
    uvs, atlas, best = ua.generate_textured_mesh(
        V, F, imgs, K, R, c, out, atlas_size=256, texel_per_unit=50,
        multiband=True, bake_from_dense=(dense_V, dense_F),
    )
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "mesh_normals.png"))
    assert os.path.exists(str(tmp_path / "mesh_heights.png"))
