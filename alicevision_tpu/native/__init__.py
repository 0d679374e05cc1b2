"""Native (C++) runtime kernels with ctypes bindings + Python fallbacks.

The TPU compute path is JAX/XLA; the irregular host-side algorithms that
the reference also implements natively (lemon union-find, boost BGL
max-flow) live here as a small C++ library compiled on first use with the
system toolchain and loaded through ctypes (no pybind11 in this image).
Every entry point has a pure-Python fallback so the framework degrades
gracefully without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "tracks_native.cpp")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "alicevision_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libavtpu_native.so")
    try:
        if (not os.path.exists(so_path)) or (
            os.path.getmtime(so_path) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.uf_connected_components.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bk_maxflow.restype = ctypes.c_double
        lib.bk_maxflow.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _build_and_load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def connected_components(a: np.ndarray, b: np.ndarray, n_nodes: int) -> np.ndarray:
    """Root label per node for the union of edges (a_i, b_i)."""
    lib = _build_and_load()
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    if lib is not None:
        out = np.empty(n_nodes, np.int64)
        lib.uf_connected_components(
            _ptr(a, ctypes.c_int64),
            _ptr(b, ctypes.c_int64),
            len(a),
            n_nodes,
            _ptr(out, ctypes.c_int64),
        )
        return out
    # fallback: scipy connected components on a sparse graph
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as cc

    g = coo_matrix((np.ones(len(a)), (a, b)), shape=(n_nodes, n_nodes))
    _, label = cc(g, directed=False)
    # labels are already component ids; map to a canonical representative
    return label.astype(np.int64)


def maxflow(
    n_nodes: int,
    edges_u: np.ndarray,
    edges_v: np.ndarray,
    cap: np.ndarray,
    rev_cap: np.ndarray,
    terminal: np.ndarray,
):
    """Max-flow / min-cut with terminal capacities.

    terminal[i] > 0: source->i capacity; < 0: i->sink capacity.
    Returns (flow, source_side (n_nodes,) bool).
    """
    lib = _build_and_load()
    eu = np.ascontiguousarray(edges_u, np.int64)
    ev = np.ascontiguousarray(edges_v, np.int64)
    c = np.ascontiguousarray(cap, np.float64)
    r = np.ascontiguousarray(rev_cap, np.float64)
    t = np.ascontiguousarray(terminal, np.float64)
    if lib is not None:
        out = np.empty(n_nodes, np.uint8)
        flow = lib.bk_maxflow(
            n_nodes,
            _ptr(eu, ctypes.c_int64),
            _ptr(ev, ctypes.c_int64),
            _ptr(c, ctypes.c_double),
            _ptr(r, ctypes.c_double),
            len(eu),
            _ptr(t, ctypes.c_double),
            _ptr(out, ctypes.c_uint8),
        )
        return flow, out.astype(bool)
    # fallback: scipy integer maximum_flow with explicit S/T nodes
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import breadth_first_order, maximum_flow

    S, T = n_nodes, n_nodes + 1
    scale = 1000.0
    rows = list(eu) + list(ev)
    cols = list(ev) + list(eu)
    caps = list((c * scale).astype(np.int64)) + list((r * scale).astype(np.int64))
    for i in range(n_nodes):
        if t[i] > 0:
            rows.append(S)
            cols.append(i)
            caps.append(int(t[i] * scale))
        elif t[i] < 0:
            rows.append(i)
            cols.append(T)
            caps.append(int(-t[i] * scale))
    g = coo_matrix(
        (np.array(caps, np.int64), (np.array(rows), np.array(cols))),
        shape=(n_nodes + 2, n_nodes + 2),
    ).tocsr()
    res = maximum_flow(g, S, T)
    residual = g - res.flow
    residual.data = np.maximum(residual.data, 0)
    order = breadth_first_order(residual > 0, S, return_predecessors=False)
    side = np.zeros(n_nodes + 2, bool)
    side[order] = True
    return res.flow_value / scale, side[:n_nodes]
