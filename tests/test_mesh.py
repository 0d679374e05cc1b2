import numpy as np
import pytest

from alicevision_tpu import mesh


def _sphere_cloud_with_vis(n=800, n_cams=6, radius=1.0, cam_r=4.0, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = d * radius
    cams = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        for el in (-0.5, 0.5):
            cams.append([cam_r * np.cos(a), cam_r * np.sin(a), el * cam_r])
    cams = np.array(cams)
    vp, vc = [], []
    for ci, cc in enumerate(cams):
        vis = (pts @ cc) > 0  # front hemisphere toward the camera
        idx = np.nonzero(vis)[0]
        vp.append(idx)
        vc.append(np.tile(cc, (len(idx), 1)))
    return pts, np.concatenate(vp), np.concatenate(vc)


def test_graph_cut_surface_sphere():
    pts, vp, vc = _sphere_cloud_with_vis()
    verts, faces = mesh.graph_cut_surface(pts, vp, vc)
    assert len(faces) > 500
    r = np.linalg.norm(verts, axis=-1)
    assert (np.abs(r - 1.0) < 0.1).mean() > 0.9
    # surface is mostly closed: count boundary edges
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    key = edges.min(1) * 10**6 + edges.max(1)
    _, counts = np.unique(key, return_counts=True)
    assert (counts == 2).mean() > 0.85  # mostly manifold edges


def _roughness(verts, faces):
    """Mean deviation of each vertex from its neighbourhood centroid."""
    V = len(verts)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]],
                        faces[:, [1, 0]], faces[:, [2, 1]], faces[:, [0, 2]]])
    s = np.zeros((V, 3))
    d = np.zeros(V)
    np.add.at(s, e[:, 0], verts[e[:, 1]])
    np.add.at(d, e[:, 0], 1.0)
    mean = s / np.maximum(d, 1)[:, None]
    return np.linalg.norm(verts - mean, axis=-1)[d > 0].mean()


def test_taubin_smooth_reduces_roughness_without_shrink():
    pts, vp, vc = _sphere_cloud_with_vis(seed=1)
    verts, faces = mesh.graph_cut_surface(pts, vp, vc)
    noisy = verts + 0.03 * np.random.RandomState(2).randn(*verts.shape)
    smoothed = mesh.laplacian_smooth(noisy, faces, iterations=10)
    assert _roughness(smoothed, faces) < _roughness(noisy, faces) * 0.8
    # Taubin compensation keeps global scale (no strong shrinkage)
    r = np.linalg.norm(smoothed, axis=-1).mean()
    assert 0.9 < r < 1.1, r


def test_decimate_grid():
    pts, vp, vc = _sphere_cloud_with_vis()
    verts, faces = mesh.graph_cut_surface(pts, vp, vc)
    dv, df = mesh.decimate_grid(verts, faces, cell_size=0.3)
    assert len(dv) < len(verts) * 0.6
    assert len(df) > 20
    r = np.linalg.norm(dv[np.unique(df)], axis=-1)
    assert (np.abs(r - 1.0) < 0.2).mean() > 0.8


def test_largest_component():
    # two disjoint triangles + a bigger patch
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],  # patch of 2 faces
         [5, 5, 5], [6, 5, 5], [5, 6, 5]]  # lone triangle
    , float)
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
    v2, f2 = mesh.largest_component(verts, faces)
    assert len(f2) == 2
    assert len(v2) == 4


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.obj")
    mesh.save_obj(p, verts, faces)
    v2, f2 = mesh.load_obj(p)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_bake_vertex_colors():
    # single flat quad facing +z, one camera above; image is a gradient
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], float)
    # wind faces so normals point toward the camera at z = -3
    faces = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    H = W = 64
    img = np.tile(np.linspace(0, 1, W)[None, :], (H, 1)).astype(np.float32)
    K = np.array([[[32.0, 0, 32], [0, 32.0, 32], [0, 0, 1]]])
    # camera at z=-3 looking at +z: x_cam = R(x - c), fwd = +z
    R = np.eye(3)[None]
    c = np.array([[0.0, 0.0, -3.0]])
    cols = mesh.bake_vertex_colors(verts, faces, [img], K, R, c)
    # left vertices darker than right vertices
    assert cols[0, 0] < cols[1, 0]
    assert cols[3, 0] < cols[2, 0]


# ---------------------------------------------------------------------------
# Round-1 additions: denoise / resample / QEM decimate / masking
# ---------------------------------------------------------------------------


def _unit_sphere_mesh(n_sub=3):
    """Icosphere via subdivision of an octahedron projected to the sphere."""
    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float64,
    )
    f = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        np.int64,
    )
    for _ in range(n_sub):
        mids = {}
        nv = list(v)
        nf = []
        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in mids:
                m = v[a] + v[b]
                m = m / np.linalg.norm(m)
                mids[key] = len(nv)
                nv.append(m)
            return mids[key]
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.array(nv)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        f = np.array(nf, np.int64)
    return v, f


def test_denoise_sd_reduces_noise():
    from alicevision_tpu.mesh import denoise_sd

    v, f = _unit_sphere_mesh(3)
    rng = np.random.default_rng(0)
    noisy = v + rng.normal(size=v.shape) * 0.02
    den = denoise_sd(noisy, f, iterations=5)
    r_noisy = np.abs(np.linalg.norm(noisy, axis=1) - 1.0).mean()
    r_den = np.abs(np.linalg.norm(den, axis=1) - 1.0).mean()
    assert r_den < 0.5 * r_noisy, (r_noisy, r_den)


def test_decimate_qem_sphere():
    from alicevision_tpu.mesh import decimate_qem

    v, f = _unit_sphere_mesh(3)
    v2, f2 = decimate_qem(v, f, target_faces=len(f) // 4)
    assert len(f2) <= len(f) // 3
    # Surface stays on the unit sphere to a few percent.
    r = np.linalg.norm(v2, axis=1)
    assert np.abs(r - 1.0).max() < 0.08, np.abs(r - 1.0).max()
    # Still one closed-ish component with reasonable vertex count.
    assert len(v2) > 20


def test_resample_density():
    from alicevision_tpu.mesh import resample

    v, f = _unit_sphere_mesh(2)
    target = 0.12
    v2, f2 = resample(v, f, target_edge=target, smooth_iters=2)
    e = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
    lens = np.linalg.norm(v2[e[:, 0]] - v2[e[:, 1]], axis=1)
    assert 0.3 * target < np.median(lens) < 3.0 * target
    r = np.linalg.norm(v2, axis=1)
    assert np.abs(r - 1.0).max() < 0.1


def test_mask_faces_by_views():
    from alicevision_tpu.mesh import mask_faces_by_views

    v, f = _unit_sphere_mesh(2)

    # One orthographic "camera" looking down -z: mask keeps x > 0 half.
    mask = np.zeros((100, 100), bool)
    mask[:, 50:] = True

    def proj(X):
        uv = np.stack([X[:, 0] * 40 + 50, X[:, 1] * 40 + 50], axis=1)
        return uv, np.ones(len(X))

    v2, f2 = mask_faces_by_views(v, f, [proj], [mask], min_views=1)
    c = v2[f2].mean(1)
    assert (c[:, 0] > -0.05).all()
    assert len(f2) < len(f)
