"""Per-phase wall profile of the dense depth-map view (bench 'depth').

Splits the one_view program into SGM / dense-refine / color-opt phases,
each jitted separately, to find where the 4.8 s/view goes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.mvs.plane_sweep import SgmParams, sgm_depth_map
from alicevision_tpu.mvs.refine import (
    color_guided_optimize,
    refine_depth_map_auto,
    refine_plan,
)
from alicevision_tpu.utils.rendered import render_views


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    Hs, Ws, D, T = 272, 480, 256, 4
    Hr, Wr = 544, 960
    f_r = 900.0
    imgs_r, _, K_np, R_np, c_np = render_views(
        n_views=T + 1, wh=(Wr, Hr), focal_px=f_r, arc=0.35
    )
    rc = 0
    order = list(range(1, T + 1))
    R_rel_np = np.stack([R_np[t] @ R_np[rc].T for t in order])
    t_rel_np = np.stack([R_np[t] @ (c_np[rc] - c_np[t]) for t in order])
    ref_r = jnp.asarray(imgs_r[rc])
    t_r = jnp.asarray(imgs_r[1:])
    ref_s = jnp.asarray(imgs_r[rc, ::2, ::2])
    t_s = jnp.asarray(imgs_r[1:, ::2, ::2])
    K_r = jnp.asarray(K_np, jnp.float32)
    Kt_r = jnp.broadcast_to(K_r, (T, 3, 3))
    K_s_np = K_np.copy()
    K_s_np[:2] /= 2.0
    K_s = jnp.asarray(K_s_np, jnp.float32)
    Kt_s = jnp.broadcast_to(K_s, (T, 3, 3))
    R_rel = jnp.asarray(R_rel_np, jnp.float32)
    t_rel = jnp.asarray(t_rel_np, jnp.float32)
    d_rng = (3.0, 10.0)
    params = SgmParams(n_depths=D)
    plan = refine_plan(K_r, Kt_r, R_rel, t_rel, d_rng, (Hr, Wr))

    sgm = jax.jit(lambda a, b: sgm_depth_map(
        a, b, K_s, Kt_s, R_rel, t_rel, d_rng[0], d_rng[1], params))
    t_sgm, (depth, sim) = timeit(sgm, ref_s, t_s)
    print("sgm_s", round(t_sgm, 3))

    up = jnp.repeat(jnp.repeat(depth, 2, 0), 2, 1)

    dense = jax.jit(lambda u, rr, tt: refine_depth_map_auto(
        u, rr, tt, K_r, Kt_r, R_rel, t_rel,
        n_offsets=150, rel_step=0.0005, n_subsamples=1, plan=plan))
    t_dense, (d2, s2) = timeit(dense, up, ref_r, t_r)
    print("refine_dense_s", round(t_dense, 3))

    fast = jax.jit(lambda u, rr, tt: refine_depth_map_auto(
        u, rr, tt, K_r, Kt_r, R_rel, t_rel,
        n_offsets=15, n_subsamples=10, plan=plan))
    t_fast, _ = timeit(fast, up, ref_r, t_r)
    print("refine_fast_s", round(t_fast, 3))

    copt = jax.jit(lambda d, rr: color_guided_optimize(d, rr, iterations=100))
    t_copt, _ = timeit(copt, d2, ref_r)
    print("coloropt_100_s", round(t_copt, 3))

    total = t_sgm + t_dense + t_copt
    print("dense_total_s", round(total, 3), "maps_per_s", round(1 / total, 3))


if __name__ == "__main__":
    main()
