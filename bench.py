"""Benchmarks on the real TPU chip. Prints per-section progress lines, a
full JSON record, and — as the very LAST stdout line — a COMPACT headline
JSON carrying every number README/DESIGN cite (the driver keeps only the
tail of stdout):

    {"metric", "value", "unit", "vs_baseline",
     "ba_pcg_iters_per_s", "maps_per_s_dense/fast/tiled",
     "e2e_tpu_6img_s", "e2e_tpu_10img_s", "e2e_cpu_10img_s",
     "feat_imgs_per_s", "hard_ate_rel", "hard_img_*",
     "fusion_ici_eff_8sh", "sgm_sim_frac_bw"}

Headline metric: Schur-complement LM bundle-adjustment iterations/s at the
100-camera / 10k-landmark operating point (where the reference switches to
SPARSE_SCHUR, ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231).
`vs_baseline` is a MEASURED A/B against the FASTER of two same-problem CPU
contenders run on this host (not an estimate): (a) a block-sparse Schur LM
in vectorized numpy/BLAS float64 with pre-built CSR scatter operators —
the same exploit-the-sparsity structure as Ceres SPARSE_SCHUR — and (b)
the identical ba_solve program XLA-compiled for the host CPU (same math,
only the chip differs). Both are reported separately in `extra`.

`extra` carries the other BASELINE.md configs:
  * ba_pcg_iters_per_s_1024cam_300kpts — large-scene matrix-free PCG path
    (warm-started CG at cg_iters=8; ba_pcg_cost_final_by_cg_iters is the
    auditable quality curve)
  * sgm_refine_depth_maps_per_s       — SGM+Refine per-view throughput at
    the LITERAL reference operating point (scale 2 + stepXY 2 -> 480x272
    volume, D=256, T=4; refine at 960x544 with the full RefineParams grid
    — 301 hypotheses at 1/10-plane steps + 100 color-opt iterations, on
    rendered box-world imagery; SgmParams.hpp:21-26, RefineParams.hpp
    :19-25). sgm_refine_fast_two_stage_maps_per_s is the equivalent-
    quality 31+21 two-stage mode; sgm_tiled_1920x1088_maps_per_s the
    Hann-merged tiled large-image point
  * feature_extraction_images_per_s   — batched DSP-SIFT at 1024x768, with
    the identical-program host-CPU twin as the measured denominator
  * e2e_10img_wall_s                  — 10-image incremental SfM pipeline
    (cameraInit -> SIFT -> exhaustive match -> incremental SfM) on CPU jax
    per BASELINE config 1; steady-state (2nd in-process run)
  * e2e_6img_wall_s_tpu / e2e_10img_wall_s_tpu (+ stage walls) — the same
    pipeline on the real chip path, steady-state (warm-up pass loads the
    executables; DESIGN.md 6d/6e)
  * hard_scene_* / hard_scene_img_*   — the rendered GT benchmark (40
    occluded views, unknown radial distortion, noise, outlier matches):
    synthetic-verified-matches variant AND the pixels->poses variant
    through the real front end at 1280x960
  * roofline                          — per-kernel achieved GFLOP/s + HBM
    GB/s vs v5e peaks with compute/bandwidth/latency classification
  * ba_comms_table / fusion_comms_table — collective bytes vs local FLOPs
    of the compiled sharded BA and sharded depth FUSION at 1/2/4/8 shards
  * cpu_lm_iters_per_s_measured       — the measured baseline denominator
"""

import json
import os
import time
from functools import partial

import numpy as np


def _enable_compile_cache():
    """Persistent executable cache: compiles travel the slow axon relay
    (~10 min for the BA program, measured) but cached executables load in
    seconds — the round's first bench run warms the cache for later ones."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def make_problem(n_views=100, n_points=10000, max_track=8, seed=0):
    import jax

    from alicevision_tpu.sfm import ba
    from alicevision_tpu.utils.synthetic import ring_scene

    # Build the synthetic problem on the host CPU backend: construction is
    # thousands of tiny ops, and dispatching each over the axon TPU tunnel
    # costs ~10 min of pure latency (measured); on CPU it is ~7 s. The
    # finished pytree is shipped to the TPU once, below.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        problem = _make_problem_on_host(ba, ring_scene, jax, n_views,
                                        n_points, max_track, seed)
    return jax.tree_util.tree_map(jax.device_put, problem)


def _make_problem_on_host(ba, ring_scene, jax, n_views, n_points, max_track,
                          seed):
    scene = ring_scene(n_views=n_views, n_points=n_points, seed=seed, radius=8.0)
    vis = np.asarray(scene.visible)
    obs_np = np.asarray(scene.observations)
    rng = np.random.RandomState(seed)

    # keep up to max_track random observing views per point (vectorized:
    # random scores per (view, point), top-K among visible)
    score = rng.rand(n_views, n_points) + vis
    order = np.argsort(-score, axis=0)[:max_track]  # (K, L) view indices
    sel_vis = np.take_along_axis(vis, order, axis=0)
    lm_idx = np.broadcast_to(np.arange(n_points), order.shape)
    keep = sel_vis & (vis.sum(0) >= 2)[None, :]
    o_cam = order[keep]
    o_lm = lm_idx[keep]
    o_uv = obs_np[o_cam, o_lm]

    intr = jax.tree_util.tree_map(lambda a: a[None], scene.intrinsics)
    key = jax.random.PRNGKey(1)
    pts0 = scene.points + 0.02 * jax.random.normal(key, scene.points.shape)
    return ba.build_problem(
        scene.poses.q, scene.poses.c, pts0, intr,
        o_lm, o_cam, np.zeros(len(o_lm), np.int32), o_uv,
        max_track=max_track, cam_fixed=np.arange(n_views) < 2,
    )


def make_large_problem(C=1024, L=300_000, K=6, seed=0):
    """Sparse large-scene problem built directly in numpy (a dense (V, L)
    observation tensor at this size would be ~2.4 GB)."""
    import jax

    from alicevision_tpu import camera as cam
    from alicevision_tpu.sfm import ba

    rng = np.random.RandomState(seed)
    ring_r = 10.0
    ang = np.linspace(0, 2 * np.pi, C, endpoint=False)
    centers = np.stack(
        [ring_r * np.cos(ang), ring_r * np.sin(ang), 0.5 * np.sin(3 * ang)], -1
    )
    fwd = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=-2)  # world->cam rows

    pts = rng.uniform(-1, 1, (L, 3)) * np.array([3.0, 3.0, 1.5])
    # banded covisibility: each landmark sees K distinct cameras from a
    # window near its angular position (realistic ring-scan connectivity)
    theta = np.arctan2(pts[:, 1], pts[:, 0])
    base = ((theta + np.pi) / (2 * np.pi) * C).astype(np.int64)
    WIN = 32
    off_rank = np.argsort(rng.rand(L, WIN), axis=1)[:, :K]
    cam_idx = (base[:, None] + off_rank - WIN // 2) % C

    f, w_img, h_img = 1200.0, 1920.0, 1080.0
    x = pts[:, None, :] - centers[cam_idx]
    u = np.einsum("lkij,lkj->lki", R[cam_idx], x)
    z = u[..., 2]
    uv = f * u[..., :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[..., None]
    uv += np.array([w_img / 2, h_img / 2])
    ok = (
        (z > 1.0)
        & (np.abs(uv[..., 0] - w_img / 2) < w_img / 2)
        & (np.abs(uv[..., 1] - h_img / 2) < h_img / 2)
    )
    o_lm = np.broadcast_to(np.arange(L)[:, None], cam_idx.shape)[ok]
    o_cam = cam_idx[ok]
    o_uv = (uv + rng.normal(0, 0.5, uv.shape))[ok]

    from alicevision_tpu.geometry.rotations import mat_to_quat
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        q = np.asarray(mat_to_quat(jnp.asarray(R, jnp.float32)))
        intr = jax.tree_util.tree_map(
            lambda a: np.asarray(a)[None], cam.make_intrinsics(w_img, h_img, f)
        )
        pts0 = pts + rng.normal(0, 0.02, pts.shape)
        problem = ba.build_problem(
            q, centers, pts0, intr, o_lm, o_cam,
            np.zeros(len(o_lm), np.int32), o_uv,
            max_track=K, cam_fixed=np.arange(C) < 2,
        )
    return jax.tree_util.tree_map(jax.device_put, problem)


def _rtt_baseline():
    """Round-trip latency of dispatch + tiny value fetch over the relay —
    subtracted from per-call walls so numbers reflect device time."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    x = jnp.ones((8, 128))
    float(np.asarray(f(x)))  # warm
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(x + jnp.float32(i))))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_solve(solve, problem, n_iters):
    """Wall time per call, timed by VALUE fetch (block_until_ready is a
    no-op on the lazy axon runtime — round-1's timings measured dispatch
    only), net of the relay round-trip."""
    import jax.numpy as jnp

    res = solve(problem)
    float(np.asarray(res.cost_final))  # forces compile + first run
    rtt = _rtt_baseline()
    times = []
    for i in range(5):  # min-of-5: the shared tunnel chip drifts 1.5-2x
        # perturb the input each rep — the axon runtime memoizes repeated
        # identical calls, which would make timings meaningless
        p_i = problem._replace(points=problem.points + jnp.float32(i + 1) * 1e-7)
        t0 = time.perf_counter()
        res = solve(p_i)
        float(np.asarray(res.cost_final))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - rtt, 1e-9)
    done = int(res.n_iters)
    return (done if done else n_iters) / dt


def bench_ba_small():
    import jax

    from alicevision_tpu.sfm import ba

    problem = make_problem()
    n_iters = 10
    # unrolled: no HLO While — the axon runtime evaluates While conditions
    # through the relay (measured: never finished compiling); the straight-
    # line program compiles once (cached) and runs at device speed
    solve = jax.jit(lambda p: ba.ba_solve(p, max_iters=n_iters, rtol=0.0,
                                          solver="dense", loop="unrolled"))
    return _time_solve(solve, problem, n_iters), problem


def bench_ba_large():
    """Large-scene PCG BA at cg_iters=8 with warm-started CG (the previous
    LM iteration's step seeds the next solve) — measured on-chip: the
    final cost after 3 LM iterations agrees across cg_iters 8/16/64 to
    <0.7% (warm start + SCHUR_JACOBI converge the reduced solve below the
    1e-2 CG tolerance within ~8 matvecs; the one-hot fast matvec's ~1e-4
    operator noise breaks bit-equality, see ba._s_operator). The cost
    curve is reported so the equivalence is auditable.

    The solve streams only the PARAMETERS (q, c, points); the observation
    topology is a compile-time constant of the program, exactly as a
    production deployment would hold it resident for the life of one BA
    problem. (Passing the whole 40 MB problem pytree as per-call arguments
    costs ~0.5 s of relay-side argument hashing per call in this image —
    round-4's 1.9 it/s was mostly that artifact, not device time.)"""
    import jax

    from alicevision_tpu.sfm import ba

    problem = make_large_problem()
    n_iters = 3

    def run(q, c, pts, cg=8):
        return ba.ba_solve(
            problem._replace(cam_q=q, cam_c=c, points=pts),
            max_iters=n_iters, rtol=0.0, solver="pcg", cg_iters=cg,
            loop="unrolled",
        )

    solve = jax.jit(run)
    import jax.numpy as jnp

    res = solve(problem.cam_q, problem.cam_c, problem.points)
    float(np.asarray(res.cost_final))  # compile + first run
    rtt = _rtt_baseline()
    times = []
    for i in range(5):
        pts_i = problem.points + jnp.float32(i + 1) * 1e-7
        t0 = time.perf_counter()
        res = solve(problem.cam_q, problem.cam_c, pts_i)
        float(np.asarray(res.cost_final))
        times.append(time.perf_counter() - t0)
    rate = n_iters / max(min(times) - rtt, 1e-9)
    curve = {}
    for cg in (8, 16, 64):
        f = jax.jit(partial(run, cg=cg))
        curve[str(cg)] = round(float(np.asarray(
            f(problem.cam_q, problem.cam_c, problem.points).cost_final)), 0)
    return {
        "ba_pcg_iters_per_s_1024cam_300kpts": round(rate, 3),
        "ba_pcg_cost_final_by_cg_iters": curve,
    }


def bench_depth_maps():
    """SGM + Refine at the reference operating point, on RENDERED imagery.

    Refine runs the LITERAL RefineParams grid — 301 hypotheses
    (halfNbDepths 15 x nbSubsamples 10, RefineParams.hpp:23-24, evaluated
    dense at 1/10-plane steps like
    cuda/planeSweeping/deviceSimilarityVolume.cu:477-494) and 100
    color-optimization iterations (RefineParams.hpp:25). The two-stage
    fast mode (31+21 evaluations, tests/test_refine_subsample.py) is
    reported alongside. Inputs are ray-cast box-world views (textured,
    real parallax/occlusion) — random-noise images would hide
    texture-dependent pathologies and cannot exercise the gather fallback
    honestly."""
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.mvs.plane_sweep import SgmParams, sgm_depth_map
    from alicevision_tpu.mvs.refine import (
        color_guided_optimize,
        refine_depth_map_auto,
        refine_plan,
    )
    from alicevision_tpu.utils.rendered import render_views

    # SGM at scale2 + stepXY2 of a 1920x1080 capture -> 480x270 volume.
    # D=256 planes: the reference CAPS depths at maxDepths=1500
    # (SgmParams.hpp:23) but sizes the actual list from SfM landmark
    # ranges (SgmDepthList) — real scenes at this resolution land in the
    # 100-400 plane regime, and our per-view seeded lists (mvs/depth_list)
    # do the same; the sweep cost is linear in D, so scale accordingly.
    Hs, Ws, D, T = 272, 480, 256, 4
    Hr, Wr = 544, 960  # refine at scale 1 (of the prepared half-res image)
    f_r = 900.0  # focal at refine scale
    imgs_r, _, K_np, R_np, c_np = render_views(
        n_views=T + 1, wh=(Wr, Hr), focal_px=f_r, arc=0.35
    )
    rc = 0
    order = list(range(1, T + 1))
    R_rel_np = np.stack([R_np[t] @ R_np[rc].T for t in order])
    t_rel_np = np.stack(
        [R_np[t] @ (c_np[rc] - c_np[t]) for t in order]
    )
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
    d_rng = (3.0, 10.0)  # box world sits ~4-8 units from the arc
    params = SgmParams(n_depths=D)
    # host-side dispatch plan so the full SGM + rectified-refine +
    # color-opt view compiles as ONE XLA program; same +-15-plane span for
    # the dense and two-stage grids, so one plan serves both
    plan = refine_plan(K_r, Kt_r, R_rel, t_rel, d_rng, (Hr, Wr))

    def one_view(ref_s_, t_s_, ref_r_, t_r_, dense):
        depth, sim = sgm_depth_map(ref_s_, t_s_, K_s, Kt_s, R_rel, t_rel,
                                   d_rng[0], d_rng[1], params)
        up = jnp.repeat(jnp.repeat(depth, 2, 0), 2, 1)
        if dense:  # literal 301-hypothesis RefineParams grid
            d2, s2 = refine_depth_map_auto(
                up, ref_r_, t_r_, K_r, Kt_r, R_rel, t_rel,
                n_offsets=150, rel_step=0.0005, n_subsamples=1, plan=plan,
            )
        else:  # two-stage fast mode at the same granularity
            d2, s2 = refine_depth_map_auto(
                up, ref_r_, t_r_, K_r, Kt_r, R_rel, t_rel,
                n_offsets=15, n_subsamples=10, plan=plan,
            )
        d3 = color_guided_optimize(d2, ref_r_, iterations=100)
        # scalar summary: forces full execution, keeps the relay transfer
        # to 4 bytes (fetching the maps would time the pipe, not the chip)
        return jnp.sum(d3) + jnp.sum(s2)

    out = {}
    for key, dense in (
        ("sgm_refine_depth_maps_per_s", True),
        ("sgm_refine_fast_two_stage_maps_per_s", False),
    ):
        f = jax.jit(partial_static(one_view, dense))
        float(np.asarray(f(ref_s, t_s, ref_r, t_r)))  # compile + warm
        rtt = _rtt_baseline()
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(
                f(ref_s + jnp.float32(i + 1) * 1e-6, t_s, ref_r, t_r)
            ))
            best = min(best, time.perf_counter() - t0)
        out[key] = round(1.0 / max(best - rtt, 1e-9), 3)

    # the TILED large-image point (mvsUtils::TileParams mechanism): a
    # 1920x1088 refine-scale view as overlapping 1024px tiles with Hann
    # merge, full T-cam images per tile (SGM only — the tiling contract is
    # the claim; seam parity is pinned by tests/test_tiled_stage.py)
    from alicevision_tpu.mvs.sharded import sgm_depth_map_tiled

    Ht, Wt = 1088, 1920
    imgs_t, _, Kt_np, Rt_np, ct_np = render_views(
        n_views=T + 1, wh=(Wt, Ht), focal_px=1800.0, arc=0.35
    )
    Rt_rel = np.stack(
        [Rt_np[t] @ Rt_np[0].T for t in range(1, T + 1)]
    ).astype(np.float32)
    tt_rel = np.stack(
        [Rt_np[t] @ (ct_np[0] - ct_np[t]) for t in range(1, T + 1)]
    ).astype(np.float32)
    Kt33 = np.tile(Kt_np[None].astype(np.float32), (T, 1, 1))
    params_t = SgmParams(n_depths=128)

    def run_tiled():
        return sgm_depth_map_tiled(
            imgs_t[0], imgs_t[1:], Kt_np.astype(np.float32), Kt33,
            Rt_rel, tt_rel, d_rng[0], d_rng[1], params_t,
            tile=1024, overlap=128,
        )

    run_tiled()  # compile + warm (per-tile programs)
    t0 = time.perf_counter()
    dmap = run_tiled()
    out["sgm_tiled_1920x1088_maps_per_s"] = round(
        1.0 / max(time.perf_counter() - t0, 1e-9), 3
    )
    assert dmap.shape == (Ht, Wt)
    return out


def partial_static(one_view, dense):
    def g(a, b, c, d):
        return one_view(a, b, c, d, dense)

    return g


def bench_features():
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.features import sift

    H, W = 768, 1024
    rng = np.random.RandomState(0)
    img = rng.rand(H, W).astype(np.float32)
    # smooth so the DoG pyramid finds realistic blob counts
    k = np.ones((8, 8)) / 64.0
    from scipy.signal import convolve2d

    img = convolve2d(img, k, mode="same").astype(np.float32)
    x = jnp.asarray(img)
    # reference operating point: DSP-SIFT is the default describer
    cfg = sift.SiftConfig(max_keypoints=4096, dsp=True)

    def run(im):
        out = sift.extract(im, cfg)
        return sum(
            jnp.sum(o.astype(jnp.float32))
            for o in jax.tree_util.tree_leaves(out)
        )

    f = jax.jit(run)
    float(np.asarray(f(x)))  # compile + warm
    rtt = _rtt_baseline()
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(x + jnp.float32(i + 1) * 1e-6)))
        best = min(best, time.perf_counter() - t0)
    tpu_rate = 1.0 / max(best - rtt, 1e-9)

    # measured denominator: the IDENTICAL extract program XLA-compiled for
    # the host CPU (the same-math A/B pattern the BA headline uses). The
    # reference operating point being compared is VLFeat DSP-SIFT, which
    # pools dspNumScales=10 rescaled detections per keypoint
    # (ImageDescriber_DSPSIFT_vlfeat.cpp:304-311) — single-threaded VLFeat
    # runs O(1) img/s at this size; this denominator is the stronger
    # XLA-on-host contender.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        xc = jax.device_put(jnp.asarray(img), cpu)
        fc = jax.jit(run)
        float(np.asarray(fc(xc)))
        best_c = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fc(xc + jnp.float32(i + 1) * 1e-6)))
            best_c = min(best_c, time.perf_counter() - t0)
    return {
        "feature_extraction_images_per_s": round(tpu_rate, 3),
        "feature_extraction_images_per_s_cpu": round(1.0 / best_c, 3),
    }


def bench_matching():
    """BASELINE config 2: voctree retrieval + cascade-hash guided pair
    matching at 100 images (ref operating point: 128-bit hash, top-2 NN,
    ratio 0.8 — matching/CascadeHasher.hpp:80). Reports matched pairs/s
    on-chip; the voctree side (BoW + inverted-file query) is host+device
    and included in `extra` as a wall time."""
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.matching import voctree as vt
    from alicevision_tpu.matching.descriptor_matching import match_cascade_hash

    rng = np.random.RandomState(0)
    n_img, n_desc, D = 100, 2000, 128
    # a pool of unique "3D point" descriptors; image i observes a sliding
    # window of the pool, so sequential neighbours share most points (true
    # one-to-one correspondences that survive the ratio test) and distant
    # views share none — the covisibility structure voctree retrieval must
    # recover
    n_pts = 20000
    pool = rng.rand(n_pts, D).astype(np.float32)
    descs = np.empty((n_img, n_desc, D), np.float32)
    step_w = (n_pts - n_desc) // max(n_img - 1, 1)
    for i in range(n_img):
        sel = (i * step_w + np.arange(n_desc)) % n_pts
        descs[i] = pool[sel] + 0.05 * rng.randn(n_desc, D)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)

    # tree training + retrieval run on the host CPU backend (offline-side
    # work, thousands of tiny ops — relay dispatch would dominate);
    # quantization of all 200k descriptors is ONE batched call
    t_voc0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(0)
        sample = descs.reshape(-1, D)[:: max(1, (n_img * n_desc) // 20000)]
        tree = vt.build_voctree(key, jnp.asarray(sample), n_children=8,
                                n_levels=3)
        valid = jnp.ones(n_desc, bool)
        bows = jax.jit(
            jax.vmap(lambda d: vt.bow_vector(tree, d, valid))
        )(jnp.asarray(descs))
        db = vt.build_database(tree, bows)
        pairs = vt.query_pairs(db, n_neighbors=10)
    voctree_wall = time.perf_counter() - t_voc0

    # cascade-hash matching of the retrieved pairs, batched on-chip
    proj = jnp.asarray(rng.randn(D, 128).astype(np.float32))
    mean = jnp.asarray(descs.mean((0, 1)))
    d_dev = jax.device_put(jnp.asarray(descs))
    B = 8

    @jax.jit
    def match_chunk(ii, jj):
        def one(i, j):
            m = match_cascade_hash(
                d_dev[i], d_dev[j], valid, valid, proj, mean
            )
            return jnp.sum(m.idx2 >= 0)

        return jnp.sum(jax.vmap(one)(ii, jj))

    n_pairs = (len(pairs) // B) * B
    pi = jnp.asarray(pairs[:n_pairs, 0]).reshape(-1, B)
    pj = jnp.asarray(pairs[:n_pairs, 1]).reshape(-1, B)
    total = int(sum(int(match_chunk(a, b)) for a, b in zip(pi, pj)))  # warm
    rtt = _rtt_baseline()
    t0 = time.perf_counter()
    acc = 0
    for a, b in zip(pi, pj):
        acc += int(match_chunk(a, b))
    dt = max(time.perf_counter() - t0 - rtt * len(pi), 1e-9)
    assert acc == total and total > 0
    return {
        "match_pairs_per_s_100img_voctree": round(n_pairs / dt, 3),
        "voctree_build_query_wall_s_100img": round(voctree_wall, 1),
    }


def bench_e2e_cpu():
    """10-image pipeline wall time on CPU jax (BASELINE config 1),
    steady-state: second in-process run (module-level jit caches warm)."""
    import tempfile

    import jax

    from alicevision_tpu.pipeline import stages
    from alicevision_tpu.utils.render import make_test_dataset

    cpu = jax.devices("cpu")[0]

    def run_once(img_dir, work):
        scene = os.path.join(work, "cameraInit.sfm")
        stages.camera_init(img_dir, scene, default_focal_px=400.0)
        feats = os.path.join(work, "features")
        stages.feature_extraction(scene, feats, max_keypoints=2048,
                                  downscale_to=0)
        pairs_f = os.path.join(work, "pairs.txt")
        stages.image_matching(scene, feats, pairs_f, method="exhaustive")
        matches_f = os.path.join(work, "matches.npz")
        stages.feature_matching(scene, feats, pairs_f, matches_f)
        out = stages.incremental_sfm(scene, feats, matches_f,
                                     os.path.join(work, "sfm.sfm"))
        return out.n_poses

    with jax.default_device(cpu):
        with tempfile.TemporaryDirectory() as d:
            img_dir = os.path.join(d, "imgs")
            os.makedirs(img_dir)
            make_test_dataset(img_dir, n_views=10, wh=(480, 360), focal=400.0)
            os.makedirs(os.path.join(d, "w1"))
            run_once(img_dir, os.path.join(d, "w1"))  # warm jit caches
            os.makedirs(os.path.join(d, "w2"))
            t0 = time.perf_counter()
            n_poses = run_once(img_dir, os.path.join(d, "w2"))
            dt = time.perf_counter() - t0
    if n_poses < 8:
        raise RuntimeError(f"e2e posed only {n_poses}/10 views")
    return dt


def bench_e2e_tpu():
    """A 6-image pipeline on the DEFAULT (TPU) backend with per-stage wall
    times — quantifies host-round-trip costs on the real chip path (the
    CPU-jax number isolates the algorithms; this one the deployment).

    NOTE this deployment path is DISPATCH-bound on the axon relay: a
    10-image warm+measured run made hundreds of small host->relay round
    trips and sat >45 min at ~5% CPU. The section therefore runs a single
    6-image pass (compile cache shared with earlier sections) and reports
    per-stage walls — the per-stage breakdown IS the requested profile of
    where host-bound time goes.
    """
    import sys
    import tempfile

    # HLO While costs a host round-trip per iteration through the axon
    # relay — run BA as a straight-line program on this path
    os.environ.setdefault("AV_BA_LOOP", "unrolled")

    from alicevision_tpu.pipeline import stages
    from alicevision_tpu.utils.render import make_test_dataset

    def run_once(img_dir, work, walls):
        def t(name, fn):
            t0 = time.perf_counter()
            out = fn()
            walls[name] = round(time.perf_counter() - t0, 1)
            print(f"# e2e_tpu {name}: {walls[name]}s", file=sys.stderr,
                  flush=True)
            return out

        scene = os.path.join(work, "cameraInit.sfm")
        t("cameraInit", lambda: stages.camera_init(
            img_dir, scene, default_focal_px=400.0))
        feats = os.path.join(work, "features")
        t("featureExtraction", lambda: stages.feature_extraction(
            scene, feats, max_keypoints=1024, downscale_to=0))
        pairs_f = os.path.join(work, "pairs.txt")
        t("imageMatching", lambda: stages.image_matching(
            scene, feats, pairs_f, method="exhaustive"))
        matches_f = os.path.join(work, "matches.npz")
        t("featureMatching", lambda: stages.feature_matching(
            scene, feats, pairs_f, matches_f))
        out = t("incrementalSfM", lambda: stages.incremental_sfm(
            scene, feats, matches_f, os.path.join(work, "sfm.sfm")))
        return out.n_poses

    with tempfile.TemporaryDirectory() as d:
        img_dir = os.path.join(d, "imgs")
        os.makedirs(img_dir)
        make_test_dataset(img_dir, n_views=6, wh=(480, 360), focal=400.0)
        # steady-state like the CPU section: the first pass loads every
        # cached executable through the relay (seconds per program — the
        # dominant first-run cost now that warm program calls are ~30 ms);
        # the measured second pass is the deployment-relevant wall
        os.makedirs(os.path.join(d, "w1"))
        run_once(img_dir, os.path.join(d, "w1"), {})
        os.makedirs(os.path.join(d, "w2"))
        walls = {}
        t0 = time.perf_counter()
        n_poses = run_once(img_dir, os.path.join(d, "w2"), walls)
        dt = time.perf_counter() - t0
    if n_poses < 5:
        raise RuntimeError(f"e2e-tpu posed only {n_poses}/6 views")

    # the 10-image TPU wall, steady-state (same warm programs; a couple of
    # new capacity buckets load on the first pass)
    with tempfile.TemporaryDirectory() as d:
        img_dir = os.path.join(d, "imgs")
        os.makedirs(img_dir)
        make_test_dataset(img_dir, n_views=10, wh=(480, 360), focal=400.0)
        os.makedirs(os.path.join(d, "w1"))
        run_once(img_dir, os.path.join(d, "w1"), {})
        os.makedirs(os.path.join(d, "w2"))
        t0 = time.perf_counter()
        n10 = run_once(img_dir, os.path.join(d, "w2"), {})
        dt10 = time.perf_counter() - t0
    if n10 < 8:
        raise RuntimeError(f"e2e-tpu posed only {n10}/10 views")
    top = sorted(walls.items(), key=lambda kv: -kv[1])[:2]
    return {
        "e2e_6img_wall_s_tpu": round(dt, 1),
        "e2e_10img_wall_s_tpu": round(dt10, 1),
        "e2e_tpu_stage_walls": walls,
        "e2e_tpu_top_host_bound": [k for k, _ in top],
    }


def bench_hard_ate():
    """ATE on the HARD rendered benchmark (occlusion + radial distortion +
    noise + verified outliers), run on CPU jax — the parity-evidence
    metric demanded by BASELINE.json's north star."""
    import jax

    from alicevision_tpu import camera as avcam
    from alicevision_tpu.sfm.incremental import (
        IncrementalConfig,
        IncrementalSfM,
    )
    from alicevision_tpu.tracks.builder import build_tracks
    from alicevision_tpu.utils.rendered import (
        hard_scene,
        verified_matches_from_scene,
    )

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        hs = hard_scene(n_views=40, n_points=600)
        pm, fxy, nf = verified_matches_from_scene(hs)
        tracks = build_tracks(pm, nf, min_track_length=2)
        w, h = hs.image_size
        intr = avcam.make_intrinsics(
            w, h, float(hs.K[0, 0]) * 1.02,
            disto_kind=avcam.DISTO_RADIALK3, disto_params=(0.0, 0.0, 0.0),
        )
        import jax.tree_util as jtu

        intr = avcam.Intrinsics(*jtu.tree_map(lambda a: np.asarray(a)[None], intr))
        eng = IncrementalSfM(
            tracks, fxy, intr,
            view_intrinsic=np.zeros(40, np.int32),
            image_sizes=np.tile([w, h], (40, 1)),
            config=IncrementalConfig(robust_triangulation=True, seed=0),
        )
        res = eng.process()
    posed = np.nonzero(res.posed)[0]
    est = res.pose_c[posed]
    gt = hs.c[posed]
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(gc.T @ ec / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((ec**2).sum() / len(est))
    ate = float(np.sqrt(np.mean(np.sum(
        (est @ (s * R).T + (mu_g - s * R @ mu_e) - gt) ** 2, axis=1))))
    radius = float(np.linalg.norm(hs.c - hs.c.mean(0), axis=1).mean())
    # rms reprojection of the final model, in pixels
    from alicevision_tpu.sfm import ba as ba_mod

    m = eng._obs_table_mask()
    problem = eng._make_problem(m, cam_fixed=~res.posed)
    rms_px = float(np.asarray(ba_mod.rms_reprojection_error(
        problem, problem.cam_q, problem.cam_c, problem.points)))
    return {
        "hard_scene_posed": f"{len(posed)}/40",
        "hard_scene_ate_rel": round(ate / radius, 5),
        "hard_scene_rms_px": round(rms_px, 3),
        **bench_hard_ate_images(),
    }


def bench_hard_ate_images():
    """The same 40-view hard world, but THROUGH THE REAL FRONT-END at the
    REFERENCE'S OWN OPERATING POINT: the ring is rendered as 1280x960
    radially-distorted images, DSP-SIFT detects at FULL resolution with
    the reference's 10,000-keypoint default
    (ref: src/aliceVision/feature/sift/SIFT.hpp:38-50 maxTotalKeypoints),
    then voctree retrieval -> matching -> incremental SfM must recover
    poses AND the distortion from pixels alone. Runs on the DEFAULT (TPU)
    backend — 10k-descriptor brute-force matching is MXU work the CPU
    path would grind on for ~30 min."""
    import tempfile

    # straight-line BA on the relay path (HLO While costs a host round
    # trip per iteration through the axon tunnel)
    os.environ.setdefault("AV_BA_LOOP", "unrolled")

    from alicevision_tpu.pipeline import stages
    from alicevision_tpu.utils.rendered import render_hard_views

    V, W, H = 40, 1280, 960
    f = 900.0
    imgs, K, disto, R_gt, c_gt = render_hard_views(
        n_views=V, wh=(W, H), focal_px=f
    )
    with tempfile.TemporaryDirectory() as d:
        img_dir = os.path.join(d, "imgs")
        os.makedirs(img_dir)
        for v in range(V):
            np.save(
                os.path.join(img_dir, f"view_{v:03d}.npy"), imgs[v]
            )
        work = os.path.join(d, "w")
        os.makedirs(work)
        scene = os.path.join(work, "cameraInit.sfm")
        stages.camera_init(img_dir, scene, default_focal_px=f * 1.02)
        feats = os.path.join(work, "features")
        stages.feature_extraction(
            scene, feats, max_keypoints=10000, downscale_to=0,
            describer_types="dspsift",
        )
        pairs_f = os.path.join(work, "pairs.txt")
        stages.image_matching(
            scene, feats, pairs_f, method="voctree", n_neighbors=6
        )
        matches_f = os.path.join(work, "matches.npz")
        stages.feature_matching(scene, feats, pairs_f, matches_f)
        # RESOLUTION-SCALED outlier gate: the engine default (4 px, the
        # reference's fixed maxReprojectionError) is tuned for ~0.3 MPix —
        # at 1280x960 the pre-convergence corner-distortion residuals of a
        # zero-k1 prior exceed it, correct border matches get culled, and
        # the focal/k1 coupling breaks (measured: ATE 2.17%, focal +4.3%
        # at 4 px vs ATE 0.48%, focal +0.4%, k1 -0.245 of -0.25 at the
        # diagonal-scaled 8 px — and the SfM runs 5x fewer re-BA rounds).
        # This is a BEAT-the-reference config: the reference applies the
        # same fixed 4 px at any resolution.
        from alicevision_tpu.sfm.incremental import IncrementalConfig

        gate_px = 4.0 * np.hypot(W, H) / 800.0
        out = stages.incremental_sfm(
            scene, feats, matches_f, os.path.join(work, "sfm.sfm"),
            config=IncrementalConfig(seed=0, max_reproj_px=gate_px),
        )
    vp = out.view_pose
    posed_v = [v for v in range(V) if vp[v] >= 0]
    est = np.stack([out.pose_c[vp[v]] for v in posed_v])
    gt = c_gt[posed_v]
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(gc.T @ ec / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((ec**2).sum() / len(est))
    ate = float(np.sqrt(np.mean(np.sum(
        (est @ (s * R).T + (mu_g - s * R @ mu_e) - gt) ** 2, axis=1))))
    radius = float(np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean())
    return {
        "hard_scene_img_posed": f"{len(posed_v)}/{V}",
        "hard_scene_img_ate_rel": round(ate / radius, 5),
        "hard_scene_img_focal_rec": round(float(np.mean(out.scale[0])), 1),
        "hard_scene_img_focal_true": f,
        "hard_scene_img_k1_rec": round(float(out.disto[0][0]), 4),
        "hard_scene_img_k1_true": float(disto[0]),
        "hard_scene_img_gate_px": round(gate_px, 1),
    }


def bench_comms():
    """Collective-bytes vs local-FLOPs accounting of the compiled sharded
    BA at 1/2/4/8 shards (virtual CPU mesh) — the honest scaling proxy in
    a 1-chip image (see parallel/comms_report.py)."""
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    from alicevision_tpu.parallel.comms_report import (
        ba_comms_table,
        fusion_comms_table,
    )

    def fmt(rows):
        return {
            str(r["shards"]): {
                "collective_mb": round(r["collective_bytes"] / 1e6, 2),
                "gflops_per_shard": round(r["flops_per_shard"] / 1e9, 2),
                "bytes_per_flop": round(r["bytes_per_flop"], 4),
                "projected_ici_eff": r["projected_ici_efficiency"],
            }
            for r in rows
        }

    return {
        "ba_comms_table": fmt(ba_comms_table()),
        # ring-halo fusion at the realistic >=32-view operating point the
        # BASELINE >=80% bar is stated at (k=4 neighbour window)
        "fusion_comms_table": fmt(
            fusion_comms_table(V=32, hw=(272, 480), k=4)
        ),
    }


def bench_roofline():
    """Roofline accounting for the headline kernels — converts BASELINE's
    "speed-of-light per chip" bar into a measured table.

    For each kernel: achieved GFLOP/s and HBM GB/s (walls measured on the
    chip net of relay RTT; FLOP/byte counts from XLA's cost model on the
    compiled executable) against v5e peaks, and a classification:
      compute-bound   — arithmetic intensity above the ridge AND compute
                        utilization dominates,
      bandwidth-bound — intensity below the ridge AND BW utilization
                        dominates,
      latency-bound   — both utilizations low (dispatch / serial-dependency
                        limited, not resource limited).
    v5e peaks: 197 TFLOP/s bf16 MXU (f32 ~1/4 of that through the MXU),
    819 GB/s HBM (public TPU v5e specs).

    Caveat: XLA's "bytes accessed" is the LOGICAL pre-fusion traffic, an
    upper bound on real HBM traffic — utilization fractions slightly above
    1.0 mean the kernel is fused well, not that physics broke."""
    import jax
    import jax.numpy as jnp

    PEAK_F32 = 49.0e12  # f32-through-MXU peak
    PEAK_BW = 819.0e9

    def perturb_args(args, i):
        # the axon runtime memoizes repeated identical calls — nudge the
        # first float leaf each rep so timings measure real execution
        leaves, treedef = jax.tree_util.tree_flatten(args)
        for j, leaf in enumerate(leaves):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.floating
            ):
                leaves[j] = leaf + jnp.asarray(1e-7 * (i + 1), leaf.dtype)
                break
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def measure(name, fn, args, n_sub=1):
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
        jf = jax.jit(fn)

        def run(i):
            # time by VALUE fetch: block_until_ready is a no-op on the lazy
            # axon runtime (see _time_solve); all kernels return one scalar
            out = jf(*perturb_args(args, i))
            return float(np.asarray(jax.tree_util.tree_leaves(out)[0]))

        run(0)  # warm
        rtt = _rtt_baseline()
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 1)
            best = min(best, time.perf_counter() - t0)
        wall = max(best - rtt, 1e-9) / n_sub
        flops /= n_sub
        bytes_ /= n_sub
        gfs = flops / wall / 1e9
        gbs = bytes_ / wall / 1e9
        fc = flops / wall / PEAK_F32
        fb = bytes_ / wall / PEAK_BW
        if max(fc, fb) < 0.10:
            cls = "latency-bound"
        elif fc >= fb:
            cls = "compute-bound"
        else:
            cls = "bandwidth-bound"
        return {
            "wall_ms": round(wall * 1e3, 2),
            "gflop_per_s": round(gfs, 1),
            "hbm_gb_per_s": round(gbs, 1),
            "frac_peak_compute": round(fc, 3),
            "frac_peak_bw": round(fb, 3),
            "bound": cls,
        }

    out = {}

    # --- BA dense step (100 cams / 10k pts) --------------------------------
    from alicevision_tpu.sfm import ba

    problem = make_problem()
    out["ba_dense_iter"] = measure(
        "ba_dense",
        lambda p: ba.ba_solve(p, max_iters=4, rtol=0.0, solver="dense",
                              loop="unrolled").cost_final,
        (problem,), n_sub=4,
    )

    # --- BA PCG matvec (1024 cams / 300k pts / 1.8M obs) -------------------
    # topology closed over (streaming the 40 MB problem pytree as per-call
    # args costs ~0.5 s of relay argument hashing — see bench_ba_large)
    big = make_large_problem()

    def pcg_matvecs(pts):
        p = big._replace(points=pts)
        r, Jc, Jl = ba._residuals_and_jacobians(
            p, p.cam_q, p.cam_c, p.points
        )
        parts = ba._schur_prelude(p, r, Jc, Jl, jnp.float32(1e-4))
        S_apply, M_apply = ba._s_operator(parts, p.cam_q.shape[0], r.dtype)

        def body(x, _):
            return M_apply(S_apply(x)), None

        x, _ = jax.lax.scan(body, parts.b, None, length=16)
        return jnp.sum(x)

    out["ba_pcg_matvec"] = measure(
        "pcg_matvec", pcg_matvecs, (big.points,), n_sub=16
    )

    # --- SGM similarity volume (480x272, D=256, T=4, rectified) ------------
    from alicevision_tpu.mvs.plane_sweep import SgmParams
    from alicevision_tpu.mvs.rectified import similarity_volume_auto
    from alicevision_tpu.utils.rendered import render_views

    Hs, Ws, D, T = 272, 480, 256, 4
    imgs, _, K_np, R_np, c_np = render_views(
        n_views=T + 1, wh=(Ws, Hs), focal_px=450.0, arc=0.35
    )
    R_rel = np.stack([R_np[t] @ R_np[0].T for t in range(1, T + 1)])
    t_rel = np.stack(
        [R_np[t] @ (c_np[0] - c_np[t]) for t in range(1, T + 1)]
    )
    K_s = jnp.asarray(K_np, jnp.float32)
    depths = jnp.linspace(3.0, 10.0, D)
    params = SgmParams(n_depths=D)
    # poses must be CONCRETE closures: similarity_volume_auto's per-pair
    # rectifiability gate is host-side — traced poses silently fall back
    # to the gather sweep (measured 4.9 s vs ~0.2 s rectified)
    R_rel_j = jnp.asarray(R_rel, jnp.float32)
    t_rel_j = jnp.asarray(t_rel, jnp.float32)
    out["sgm_similarity"] = measure(
        "sgm_sim",
        lambda ref, ts: jnp.sum(similarity_volume_auto(
            ref, ts, K_s, jnp.broadcast_to(K_s, (T, 3, 3)),
            R_rel_j, t_rel_j, depths, params,
        )),
        (jnp.asarray(imgs[0]), jnp.asarray(imgs[1:])),
    )

    # --- Refine rectified scan (544x960, 31 offsets, 1 pair) ---------------
    from alicevision_tpu.mvs.refine import (
        _pair_refine_scores_rectified,
        refine_plan,
    )

    Hr, Wr = 544, 960
    imgs_r, _, K2_np, R2_np, c2_np = render_views(
        n_views=2, wh=(Wr, Hr), focal_px=900.0, arc=0.35
    )
    R2 = (R2_np[1] @ R2_np[0].T).astype(np.float32)
    t2 = (R2_np[1] @ (c2_np[0] - c2_np[1])).astype(np.float32)
    K_r = jnp.asarray(K2_np, jnp.float32)
    plan = refine_plan(
        K_r, jnp.asarray(K2_np[None], jnp.float32), jnp.asarray(R2[None]),
        jnp.asarray(t2[None]), (3.0, 10.0), (Hr, Wr),
    )
    assert plan[0][0] == "rectified"
    _, s_lo, s_hi = plan[0]
    d0 = jnp.full((Hr, Wr), 5.0, jnp.float32)
    out["refine_scan_pair"] = measure(
        "refine_scan",
        lambda d, ref, t: jnp.sum(_pair_refine_scores_rectified(
            d, ref, t, K_r, K_r, jnp.asarray(R2), jnp.asarray(t2),
            0.005, 15, s_lo, s_hi,
        )),
        (d0, jnp.asarray(imgs_r[0]), jnp.asarray(imgs_r[1])),
    )

    # --- DSP-SIFT extraction (1024x768) ------------------------------------
    from alicevision_tpu.features import sift

    rng = np.random.RandomState(0)
    from scipy.signal import convolve2d

    img = convolve2d(
        rng.rand(768, 1024), np.ones((8, 8)) / 64.0, mode="same"
    ).astype(np.float32)
    cfg = sift.SiftConfig(max_keypoints=4096, dsp=True)
    out["sift_extract"] = measure(
        "sift",
        lambda im: sum(
            jnp.sum(o.astype(jnp.float32))
            for o in jax.tree_util.tree_leaves(sift.extract(im, cfg))
        ),
        (jnp.asarray(img),),
    )
    return {"roofline": out}


def _section_ba_small():
    v, problem = bench_ba_small()
    from benchmarks.cpu_lm_reference import (
        measure_iters_per_s,
        measure_xla_cpu_iters_per_s,
    )

    cpu = measure_iters_per_s(problem, n_iters=4)
    # same ba_solve program compiled for the host CPU: the purest A/B
    # (identical math, only the chip differs)
    try:
        cpu_xla = measure_xla_cpu_iters_per_s(problem, n_iters=5)
    except Exception:  # CPU backend unavailable under some runtimes
        cpu_xla = None
    # vs_baseline denominator: the FASTEST CPU contender (conservative)
    cands = [c for c in (cpu, cpu_xla) if c]
    return {
        "ba_lm_iters_per_s_100cam_10kpts": round(v, 3),
        "cpu_lm_iters_per_s_measured": round(max(cands), 3),
        "cpu_numpy_schur_iters_per_s": round(cpu, 3),
        "cpu_xla_samemath_iters_per_s": round(cpu_xla, 3) if cpu_xla else None,
    }


SECTIONS = {
    "ba_small": _section_ba_small,
    "ba_large": bench_ba_large,
    "depth": bench_depth_maps,
    "features": bench_features,
    "matching": bench_matching,
    "e2e": lambda: {"e2e_10img_wall_s": round(bench_e2e_cpu(), 1)},
    "e2e_tpu": bench_e2e_tpu,
    "hard_ate": bench_hard_ate,
    "roofline": bench_roofline,
    "comms": bench_comms,
}


def run_section(name):
    _enable_compile_cache()
    print(json.dumps(SECTIONS[name]()))


def main():
    """Each section runs in its own subprocess with a hard timeout: a
    compile stalling on the axon relay (minutes uncached, potentially worse)
    must not take the whole bench down — it gets killed and reported null."""
    import subprocess
    import sys

    timeout = int(os.environ.get("BENCH_SECTION_TIMEOUT", "2400"))
    extra = {}
    for name in SECTIONS:
        t0 = time.perf_counter()
        # retries per section: the tunneled TPU worker intermittently
        # crashes/restarts mid-run ("TPU worker process crashed"); a fresh
        # subprocess reattaches and the compile cache makes retries cheap
        for attempt in (1, 2, 3):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--section", name],
                    capture_output=True,
                    timeout=timeout,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                line = out.stdout.decode().strip().splitlines()[-1]
                vals = json.loads(line)
                extra.update(vals)
                print(f"# {name}: {vals} ({time.perf_counter()-t0:.0f}s)",
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001 — sections are independent
                tail = ""
                try:
                    tail = out.stderr.decode(errors="replace")[-300:]
                except Exception:  # noqa: BLE001
                    pass
                print(f"# {name} attempt {attempt} FAILED: "
                      f"{type(e).__name__}: {e} | stderr tail: {tail!r}",
                      flush=True)

    value = extra.pop("ba_lm_iters_per_s_100cam_10kpts", None)
    baseline = extra.get("cpu_lm_iters_per_s_measured") or None
    vs = round(value / baseline, 3) if (baseline and value) else None
    # full record first (auditable), COMPACT headline line LAST — the
    # driver keeps only the tail of stdout, and the headline line must
    # always carry every number README/DESIGN cite (round-4's artifact
    # truncated the e2e/BA keys away).
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_s_100cam_10kpts",
                "value": value,
                "unit": "iters/s",
                "vs_baseline": vs,
                "extra": extra,
            }
        ),
        flush=True,
    )
    fus = extra.get("fusion_comms_table") or {}
    headline = {
        "metric": "ba_lm_iterations_per_s_100cam_10kpts",
        "value": value,
        "unit": "iters/s",
        "vs_baseline": vs,
        "ba_pcg_iters_per_s": extra.get("ba_pcg_iters_per_s_1024cam_300kpts"),
        "maps_per_s_dense": extra.get("sgm_refine_depth_maps_per_s"),
        "maps_per_s_fast": extra.get("sgm_refine_fast_two_stage_maps_per_s"),
        "maps_per_s_tiled": extra.get("sgm_tiled_1920x1088_maps_per_s"),
        "e2e_tpu_6img_s": extra.get("e2e_6img_wall_s_tpu"),
        "e2e_tpu_10img_s": extra.get("e2e_10img_wall_s_tpu"),
        "e2e_cpu_10img_s": extra.get("e2e_10img_wall_s"),
        "feat_imgs_per_s": extra.get("feature_extraction_images_per_s"),
        "hard_ate_rel": extra.get("hard_scene_ate_rel"),
        "hard_img_posed": extra.get("hard_scene_img_posed"),
        "hard_img_ate_rel": extra.get("hard_scene_img_ate_rel"),
        "hard_img_k1": extra.get("hard_scene_img_k1_rec"),
        "fusion_ici_eff_8sh": (fus.get("8") or {}).get("projected_ici_eff"),
        "sgm_sim_frac_bw": (extra.get("roofline") or {})
        .get("sgm_similarity", {})
        .get("frac_peak_bw"),
    }
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        run_section(sys.argv[2])
    else:
        main()
