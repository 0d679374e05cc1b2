"""Manifold repair (MeshClean analog) + masking morphology tests."""

import numpy as np

from alicevision_tpu.mesh.clean import (
    boundary_loops,
    clean_mesh,
    fill_small_holes,
    remove_duplicate_faces,
    remove_degenerate_faces,
    remove_nonmanifold_edges,
    split_nonmanifold_vertices,
)


def _edge_multiplicity(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def test_degenerate_and_duplicate_faces():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    f = np.array(
        [
            [0, 1, 2],
            [0, 1, 2],  # duplicate
            [2, 1, 0],  # duplicate (other winding)
            [1, 1, 2],  # degenerate
            [1, 3, 2],
        ],
        np.int64,
    )
    f2 = remove_degenerate_faces(v, f)
    assert len(f2) == 4
    f3 = remove_duplicate_faces(f2)
    assert len(f3) == 2


def test_nonmanifold_edge_fin_removed():
    # two quads sharing edge (1,2) + one extra "fin" triangle on that edge
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [2, 0, 0], [1, 0.5, 1]],
        np.float32,
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [1, 4, 2], [1, 5, 2]],  # last = fin
        np.int64,
    )
    f2 = remove_nonmanifold_edges(f, v)
    assert (_edge_multiplicity(f2) <= 2).all()
    assert len(f2) == 3
    # the FIN face itself must be the one dropped (geometric planarity
    # ranking), not a genuine surface face
    surviving = {tuple(sorted(face)) for face in f2.tolist()}
    assert tuple(sorted([1, 5, 2])) not in surviving
    for keeper in ([0, 1, 2], [0, 2, 3], [1, 4, 2]):
        assert tuple(sorted(keeper)) in surviving


def test_bowtie_vertex_split():
    # two triangles sharing ONLY vertex 0 (a bowtie)
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 3, 4]], np.int64)
    v2, f2 = split_nonmanifold_vertices(v, f)
    assert len(v2) == 6  # one vertex duplicated
    # faces no longer share any vertex
    assert len(set(f2[0]) & set(f2[1])) == 0
    # positions preserved
    assert np.allclose(v2[f2[0][0]], v2[f2[1][0]])


def test_boundary_loop_and_hole_fill():
    # octahedron with one face removed -> single 3-edge boundary loop
    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
            [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5],
        ],
        np.int64,
    )
    assert len(boundary_loops(f)) == 0  # closed surface
    f_open = f[1:]
    loops = boundary_loops(f_open)
    assert len(loops) == 1 and len(loops[0]) == 3
    f_filled = fill_small_holes(v, f_open, max_edges=8)
    assert len(f_filled) == 8
    assert (_edge_multiplicity(f_filled) == 2).all()  # watertight again


def test_clean_mesh_end_to_end():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [2, 0, 0], [1, 0.5, 1],
         [9, 9, 9]],  # unreferenced vertex
        np.float32,
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [1, 4, 2], [1, 5, 2], [0, 1, 2], [1, 1, 2]],
        np.int64,
    )
    v2, f2 = clean_mesh(v, f)
    assert (_edge_multiplicity(f2) <= 2).all()
    assert len(v2) <= 7  # unreferenced vertex dropped (bowtie may add one)


def test_otsu_and_morphology():
    import jax.numpy as jnp

    from alicevision_tpu.misc.masking import (
        auto_threshold_mask,
        closing,
        dilate,
        erode,
        otsu_threshold,
    )

    rng = np.random.RandomState(0)
    img = np.where(
        rng.rand(64, 64) < 0.5, 0.2 + 0.05 * rng.rand(64, 64),
        0.8 + 0.05 * rng.rand(64, 64),
    )
    # argmax lands at the start of the empty gap between the two modes
    t = float(otsu_threshold(jnp.asarray(img)))
    assert 0.2 < t < 0.8
    m = np.asarray(auto_threshold_mask(jnp.asarray(img)))
    assert (m == (img >= t)).mean() > 0.99

    box = np.zeros((32, 32), bool)
    box[10:20, 10:20] = True
    d = np.asarray(dilate(jnp.asarray(box), 2))
    assert d.sum() > box.sum() and d[8, 10]
    e = np.asarray(erode(jnp.asarray(box), 2))
    assert e.sum() < box.sum() and not e[10, 10] and e[15, 15]
    # closing fills a small hole
    holed = box.copy()
    holed[14, 14] = False
    cl = np.asarray(closing(jnp.asarray(holed), 1))
    assert cl[14, 14]


def test_image_masking_cli_auto(tmp_path):
    import json
    import subprocess
    import sys

    import imageio.v2 as imageio

    img = np.zeros((40, 40, 3), np.uint8)
    img[10:30, 10:30] = 220
    src = tmp_path / "img.png"
    imageio.imwrite(src, img)
    dst = tmp_path / "mask.png"
    out = subprocess.run(
        [sys.executable, "-m", "alicevision_tpu.pipeline.cli", "imageMasking",
         "--input", str(src), "--output", str(dst),
         "--algorithm", "autoGrayscaleThreshold", "--growRadius", "1",
         "--shrinkRadius", "1"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout.strip().splitlines()[-1])["masks"] == 1
    m = imageio.imread(dst)
    assert (m[15, 15] > 128).all() and (m[2, 2] < 128).all()
