import numpy as np
import pytest

from alicevision_tpu import native


def test_native_builds():
    # compiles with the system g++; fallback also acceptable but flag it
    assert native.have_native(), "native library failed to build"


def test_connected_components():
    # chain 0-1-2, pair 3-4, singleton 5
    a = np.array([0, 1, 3])
    b = np.array([1, 2, 4])
    root = native.connected_components(a, b, 6)
    assert root[0] == root[1] == root[2]
    assert root[3] == root[4]
    assert root[5] not in (root[0], root[3])
    assert len(set(root.tolist())) == 3


def test_connected_components_large_random():
    rng = np.random.RandomState(0)
    n = 10000
    # union pairs within known groups of 100
    groups = np.arange(n) // 100
    a, b = [], []
    for g in range(n // 100):
        members = np.nonzero(groups == g)[0]
        perm = rng.permutation(members)
        a.extend(perm[:-1])
        b.extend(perm[1:])
    root = native.connected_components(np.array(a), np.array(b), n)
    # same group -> same root; different group -> different root
    for g in (0, 17, 99):
        members = groups == g
        assert len(set(root[members].tolist())) == 1
    assert len(set(root.tolist())) == n // 100


def test_maxflow_simple():
    # two nodes: S -> 0 (cap 3), 0 -> 1 (cap 2), 1 -> T (cap 5): flow = 2
    flow, side = native.maxflow(
        2,
        np.array([0]),
        np.array([1]),
        np.array([2.0]),
        np.array([0.0]),
        np.array([3.0, -5.0]),
    )
    assert abs(flow - 2.0) < 1e-9
    assert side[0] and not side[1]


def test_maxflow_bottleneck_cut():
    # S -> 0 (10), 0 -> 1 (1), 1 -> T (10): cut separates at the weak edge
    flow, side = native.maxflow(
        2,
        np.array([0]),
        np.array([1]),
        np.array([1.0]),
        np.array([0.0]),
        np.array([10.0, -10.0]),
    )
    assert abs(flow - 1.0) < 1e-9
    assert side[0] and not side[1]


def test_maxflow_grid_agrees_with_scipy():
    """Random small graph: native flow equals scipy's maximum_flow."""
    rng = np.random.RandomState(1)
    n = 30
    m = 120
    eu = rng.randint(0, n, m)
    ev = rng.randint(0, n, m)
    keep = eu != ev
    eu, ev = eu[keep], ev[keep]
    cap = rng.randint(1, 10, len(eu)).astype(np.float64)
    term = np.zeros(n)
    term[:5] = 10.0
    term[-5:] = -10.0

    flow_native, side = native.maxflow(n, eu, ev, cap, np.zeros_like(cap), term)

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import maximum_flow

    S, T = n, n + 1
    rows = list(eu) + [S] * 5 + list(range(n - 5, n))
    cols = list(ev) + list(range(5)) + [T] * 5
    caps = list(cap.astype(np.int64)) + [10] * 5 + [10] * 5
    g = coo_matrix(
        (np.array(caps), (np.array(rows), np.array(cols))), shape=(n + 2, n + 2)
    ).tocsr()
    ref = maximum_flow(g, S, T).flow_value
    assert abs(flow_native - ref) < 1e-6, (flow_native, ref)


def test_maxflow_fuzz_vs_scipy():
    """Dinic max-flow vs scipy.maximum_flow on 30 random terminal-capacity
    graphs (flow-value equality; the previous Edmonds-Karp-with-restart
    implementation was correct but O(paths x E) — ~13 min on a 316k-cell
    meshing graph vs seconds now)."""
    import numpy as np
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    from alicevision_tpu import native

    rng = np.random.RandomState(0)
    for _ in range(30):
        n = rng.randint(4, 40)
        m = rng.randint(n, 4 * n)
        eu = rng.randint(0, n, m)
        ev = rng.randint(0, n, m)
        keep = eu != ev
        eu, ev = eu[keep], ev[keep]
        cap = rng.randint(1, 10, len(eu)).astype(np.float64)
        rev = rng.randint(0, 10, len(eu)).astype(np.float64)
        t = rng.randint(-8, 9, n).astype(np.float64)
        f_ours, _ = native.maxflow(
            n, eu.astype(np.int64), ev.astype(np.int64), cap, rev, t
        )
        S, T = n, n + 1
        rows, cols, data = [], [], []
        for i in range(len(eu)):
            rows += [eu[i], ev[i]]
            cols += [ev[i], eu[i]]
            data += [int(cap[i]), int(rev[i])]
        for i in range(n):
            if t[i] > 0:
                rows.append(S), cols.append(i), data.append(int(t[i]))
            elif t[i] < 0:
                rows.append(i), cols.append(T), data.append(int(-t[i]))
        g = csr_matrix((data, (rows, cols)), shape=(n + 2, n + 2))
        g.sum_duplicates()
        f_ref = maximum_flow(g, S, T).flow_value
        assert abs(f_ours - f_ref) < 1e-6
