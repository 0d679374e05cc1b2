"""Benchmark: Schur-complement LM bundle-adjustment iterations/s on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Problem size mirrors a mid-size incremental-SfM BA call (100 cameras,
10k landmarks, ~8 obs/track) — the regime where the reference switches to
SPARSE_SCHUR (ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231).
vs_baseline compares against an estimated Ceres SPARSE_SCHUR throughput of
5 LM iterations/s for this size on a desktop CPU (the reference repo
publishes no numbers — see BASELINE.md); refine as real A/B data lands.
"""

import json
import time

import numpy as np

REF_BA_ITERS_PER_S = 5.0


def make_problem(n_views=100, n_points=10000, max_track=8, seed=0):
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.sfm import ba
    from alicevision_tpu.utils.synthetic import ring_scene

    # Build the synthetic problem on the host CPU backend: construction is
    # thousands of tiny ops, and dispatching each over the axon TPU tunnel
    # costs ~10 min of pure latency (measured); on CPU it is ~7 s. The
    # finished pytree is shipped to the TPU once, below.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        problem = _make_problem_on_host(
            ba, ring_scene, jax, jnp, n_views, n_points, max_track, seed
        )
    return jax.tree_util.tree_map(jax.device_put, problem)


def _make_problem_on_host(ba, ring_scene, jax, jnp, n_views, n_points,
                          max_track, seed):
    scene = ring_scene(n_views=n_views, n_points=n_points, seed=seed, radius=8.0)
    # Pull everything host-side ONCE — per-element indexing of device arrays
    # would issue one tunnel transfer per observation.
    vis = np.asarray(scene.visible)
    obs_np = np.asarray(scene.observations)
    rng = np.random.RandomState(seed)

    # keep up to max_track random observing views per point
    o_lm, o_cam, o_uv = [], [], []
    for l in range(n_points):
        views = np.nonzero(vis[:, l])[0]
        if len(views) < 2:
            continue
        if len(views) > max_track:
            views = rng.choice(views, max_track, replace=False)
        for v in views:
            o_lm.append(l)
            o_cam.append(v)
            o_uv.append(obs_np[v, l])

    intr = jax.tree_util.tree_map(lambda a: a[None], scene.intrinsics)
    key = jax.random.PRNGKey(1)
    pts0 = scene.points + 0.02 * jax.random.normal(key, scene.points.shape)
    problem = ba.build_problem(
        scene.poses.q,
        scene.poses.c,
        pts0,
        intr,
        np.array(o_lm),
        np.array(o_cam),
        np.zeros(len(o_lm), np.int32),
        np.array(o_uv),
        max_track=max_track,
        cam_fixed=np.arange(n_views) < 2,
    )
    return problem


def main():
    import jax

    from alicevision_tpu.sfm import ba

    problem = make_problem()
    n_iters = 10

    solve = jax.jit(lambda p: ba.ba_solve(p, max_iters=n_iters, rtol=0.0))

    # warmup / compile
    res = solve(problem)
    res.cost_final.block_until_ready()

    times = []
    for i in range(3):
        # perturb the input each rep — the axon runtime memoizes repeated
        # identical calls, which would make timings meaningless
        import jax.numpy as jnp

        p_i = problem._replace(points=problem.points + jnp.float32(i) * 1e-7)
        t0 = time.perf_counter()
        res = solve(p_i)
        res.cost_final.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    iters_per_s = int(res.n_iters) / dt if int(res.n_iters) else n_iters / dt

    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_s_100cam_10kpts",
                "value": round(iters_per_s, 3),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_s / REF_BA_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
