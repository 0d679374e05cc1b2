"""Tet-walk point location vs qhull's find_simplex (exactness + seeds).

ref: the reference buckets point-in-tet lookups (fuseCut/Octree.hpp,
Tetrahedralization.cpp); our vectorized walk replaces qhull's superlinear
find_simplex for the vote queries.
"""

import numpy as np
from scipy.spatial import Delaunay

from alicevision_tpu.mesh.delaunay_graphcut import (
    _locate_walk,
    _segment_cells,
    _vertex_incident_simplex,
)


def _cloud(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3)
    return pts, Delaunay(pts, qhull_options="QJ")


def test_walk_matches_find_simplex_for_interior_points():
    pts, tri = _cloud()
    rng = np.random.RandomState(1)
    # random interior queries: convex combos of random simplices' vertices
    S = len(tri.simplices)
    sel = rng.randint(0, S, 500)
    w = rng.dirichlet(np.ones(4), 500)
    X = np.einsum("nk,nkd->nd", w, pts[tri.simplices[sel]])
    # seed every walk from an arbitrary FIXED simplex far away
    seeds = np.zeros(500, np.int64)
    res, exited = _locate_walk(tri, X, seeds, max_steps=512)
    ref = tri.find_simplex(X)
    ok = res >= 0
    assert ok.mean() > 0.98, f"walk converged only {ok.mean():.2%}"
    # where both found a cell, the query's barycentric coords must be
    # non-negative in the walk's cell (QJ joggle can make find_simplex and
    # the walk disagree on exact-boundary queries — containment is the
    # invariant, not the id)
    Tm = tri.transform
    Tr = Tm[res[ok]]
    c3 = np.einsum("nij,nj->ni", Tr[:, :3], X[ok] - Tr[:, 3])
    bary = np.concatenate([c3, (1.0 - c3.sum(1))[:, None]], 1)
    assert (bary.min(1) > -1e-6).mean() > 0.97
    # and the ids agree with find_simplex for the vast majority
    assert (res[ok] == ref[ok]).mean() > 0.9


def test_walk_reports_hull_exit():
    pts, tri = _cloud(1000)
    X_out = np.full((50, 3), 50.0) + np.random.RandomState(2).randn(50, 3)
    res, exited = _locate_walk(tri, X_out, np.zeros(50, np.int64))
    assert (res == -1).all()
    assert exited.all()


def test_segment_cells_seeded_matches_unseeded():
    pts, tri = _cloud(3000, seed=3)
    rng = np.random.RandomState(4)
    idx = rng.randint(0, len(pts), 200)
    b = pts[idx]
    a = b * 0.0 + np.array([8.0, 0.0, 0.0])  # cameras outside the hull
    vt = _vertex_incident_simplex(tri, len(pts))
    seeded = _segment_cells(tri, a, b * 0.999 + a * 0.001, 16, seed=vt[idx])
    ref = _segment_cells(tri, a, b * 0.999 + a * 0.001, 16)
    # same inside/outside classification for ~all samples, and identical
    # cell ids where both agree a sample is inside
    both_in = (seeded >= 0) & (ref >= 0)
    agree_cls = ((seeded >= 0) == (ref >= 0)).mean()
    assert agree_cls > 0.97, agree_cls
    assert (seeded[both_in] == ref[both_in]).mean() > 0.95
