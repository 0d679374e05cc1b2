"""Ablation profile inside _pair_refine_scores_rectified at the dense
(301-offset) operating point: scan-warp accumulation vs ZNCC blur stack
vs unrectify, measured per pair on the real chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.mvs import refine as RF
from alicevision_tpu.mvs.refine import _disparity_bounds, refine_plan
from alicevision_tpu.utils.rendered import render_views


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    T = 4
    Hr, Wr = 544, 960
    f_r = 900.0
    imgs_r, depths, K_np, R_np, c_np = render_views(
        n_views=T + 1, wh=(Wr, Hr), focal_px=f_r, arc=0.35
    )
    rc = 0
    R_rel = np.stack([R_np[t] @ R_np[rc].T for t in range(1, T + 1)])
    t_rel = np.stack([R_np[t] @ (c_np[rc] - c_np[t]) for t in range(1, T + 1)])
    ref = jnp.asarray(imgs_r[rc])
    timg = jnp.asarray(imgs_r[1])
    K = jnp.asarray(K_np, jnp.float32)
    d_rng = (3.0, 10.0)
    depth0 = jnp.asarray(depths[rc] if depths is not None else
                         np.full((Hr, Wr), 5.0, np.float32))

    n_offsets, rel_step = 150, 0.0005
    rel_span = n_offsets * rel_step
    s_min, s_max = _disparity_bounds(
        K, K, R_rel[0], t_rel[0], d_rng, rel_span, (Hr, Wr))
    print("scan range", s_min, s_max, "steps", s_max - s_min + 1)

    f = jax.jit(lambda d, r, t: jnp.sum(RF._pair_refine_scores_rectified(
        d, r, t, K, K, jnp.asarray(R_rel[0], jnp.float32),
        jnp.asarray(t_rel[0], jnp.float32),
        rel_step, n_offsets, s_min, s_max)))
    t_full = timeit(f, depth0, ref, timg)
    print("pair_dense_full_s", round(t_full, 3))

    # fast-mode comparison (31 offsets at plane step)
    f31 = jax.jit(lambda d, r, t: jnp.sum(RF._pair_refine_scores_rectified(
        d, r, t, K, K, jnp.asarray(R_rel[0], jnp.float32),
        jnp.asarray(t_rel[0], jnp.float32),
        0.005, 15, s_min, s_max)))
    print("pair_31_full_s", round(timeit(f31, depth0, ref, timg), 3))


if __name__ == "__main__":
    main()
