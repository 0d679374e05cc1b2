"""Rig bundle adjustment: shared sub-poses as BA parameters.

Ref: rig reprojection costs chaining sub-pose x frame pose
(src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:38-140) and
RigSequence calibration (sfm/pipeline/sequential/RigSequence.cpp).
"""

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu import camera as cam
from alicevision_tpu import geometry as geo
from alicevision_tpu.sfm import ba


def _make_rig_problem(n_frames=10, n_points=200, noise_px=0.0, seed=0,
                      perturb_sub=0.0, perturb_pose=0.0, perturb_pts=0.0):
    """Two-camera rig on a ring: sub-pose 0 = identity, sub-pose 1 = a fixed
    baseline offset + small rotation. Returns (problem, gt)."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    radius = 5.0
    centers = np.stack([radius * np.cos(ang), radius * np.sin(ang),
                        np.zeros(n_frames)], -1)
    fwd = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    R_f = np.stack([right, down, fwd], axis=-2)  # world->frame

    # GT sub-poses
    w_gt = np.array([0.02, -0.015, 0.01])
    R_s1 = np.asarray(geo.so3_exp(jnp.asarray(w_gt)[None]))[0]
    t_s1 = np.array([0.4, 0.02, -0.01])
    sub_R = np.stack([np.eye(3), R_s1])
    sub_t = np.stack([np.zeros(3), t_s1])

    pts = rng.uniform(-1.5, 1.5, (n_points, 3))
    f, w_img, h_img = 800.0, 1280.0, 960.0
    intr = jax.tree_util.tree_map(
        lambda a: np.asarray(a)[None], cam.make_intrinsics(w_img, h_img, f)
    )

    o_lm, o_cam, o_sub, o_uv = [], [], [], []
    for fr in range(n_frames):
        for s in range(2):
            xf = (pts - centers[fr]) @ R_f[fr].T
            xc = xf @ sub_R[s].T + sub_t[s]
            z = xc[:, 2]
            uv = f * xc[:, :2] / z[:, None] + np.array([w_img / 2, h_img / 2])
            ok = (z > 0.5) & (np.abs(uv[:, 0] - w_img / 2) < w_img / 2) \
                 & (np.abs(uv[:, 1] - h_img / 2) < h_img / 2)
            idx = np.nonzero(ok)[0]
            o_lm.extend(idx)
            o_cam.extend([fr] * len(idx))
            o_sub.extend([s] * len(idx))
            o_uv.extend(uv[idx] + rng.normal(0, noise_px, (len(idx), 2)))

    q_gt = np.asarray(geo.mat_to_quat(jnp.asarray(R_f, jnp.float32)))
    q0 = q_gt.copy()
    c0 = centers.copy()
    if perturb_pose:
        dq = rng.normal(0, perturb_pose, (n_frames, 4))
        q0 = q0 + dq
        q0 /= np.linalg.norm(q0, axis=1, keepdims=True)
        q0[:2] = q_gt[:2]  # keep gauge frames exact
        c0 = c0 + rng.normal(0, perturb_pose, centers.shape)
        c0[:2] = centers[:2]
    pts0 = pts + rng.normal(0, perturb_pts, pts.shape) if perturb_pts else pts

    sq0 = np.asarray(geo.mat_to_quat(jnp.asarray(sub_R, jnp.float32)))
    st0 = sub_t.copy()
    if perturb_sub:
        w = rng.normal(0, perturb_sub, 3)
        dR = np.asarray(geo.so3_exp(jnp.asarray(w)[None]))[0]
        sq0 = np.stack([
            sq0[0],
            np.asarray(geo.mat_to_quat(jnp.asarray(
                (dR @ sub_R[1]), jnp.float32)[None]))[0],
        ])
        st0 = np.stack([st0[0], st0[1] + rng.normal(0, perturb_sub, 3)])

    problem = ba.build_problem(
        q0, c0, pts0, intr,
        np.array(o_lm), np.array(o_cam), np.zeros(len(o_lm), np.int32),
        np.array(o_uv), max_track=24,
        cam_fixed=np.arange(n_frames) < 2,
        obs_sub=np.array(o_sub), sub_q=sq0, sub_t=st0,
    )
    gt = dict(R_f=R_f, centers=centers, pts=pts, sub_R=sub_R, sub_t=sub_t,
              q_gt=q_gt)
    return problem, gt


def test_rig_residuals_zero_at_gt():
    problem, gt = _make_rig_problem()
    r = ba._residuals(problem, problem.cam_q, problem.cam_c, problem.points)
    r = np.asarray(r) * np.asarray(problem.obs_mask.T)
    assert np.max(np.abs(r)) < 0.05  # f32 roundoff at 800px focal


def test_rig_ba_recovers_frames_and_points():
    """Sub-poses held at GT: the Schur LM over frame poses converges."""
    problem, gt = _make_rig_problem(perturb_pose=0.01, perturb_pts=0.03)
    res = ba.ba_solve(problem, max_iters=25)
    assert float(res.cost_final) < float(res.cost_initial) * 1e-3
    rms = ba.rms_reprojection_error(problem, res.cam_q, res.cam_c, res.points)
    assert float(rms) < 0.05


def test_rig_solve_recovers_subpose():
    """Alternating rig BA recovers a perturbed sub-pose to sub-millirad."""
    problem, gt = _make_rig_problem(
        perturb_pose=0.005, perturb_pts=0.02, perturb_sub=0.02
    )
    res, sq, st = ba.rig_solve(problem, rounds=10, max_iters=15)
    # recovered sub-pose 1 vs GT
    R1 = np.asarray(geo.quat_to_mat(sq))[1]
    ang = np.degrees(np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(R1 @ gt["sub_R"][1].T)[None]))[0]))
    t_err = np.linalg.norm(np.asarray(st)[1] - gt["sub_t"][1])
    assert ang < 0.1, ang  # degrees
    assert t_err < 5e-3, t_err
    # identity sub-pose untouched
    np.testing.assert_allclose(np.asarray(st)[0], 0.0, atol=1e-7)
    rms = ba.rms_reprojection_error(
        problem._replace(sub_q=sq, sub_t=st), res.cam_q, res.cam_c, res.points
    )
    assert float(rms) < 0.1  # f32 roundoff floor at 800px focal, 4k obs


def test_rig_constraint_beats_unconstrained():
    """With observation noise, enforcing the shared sub-pose yields lower
    frame-pose error than treating every view independently."""
    problem, gt = _make_rig_problem(
        n_frames=8, n_points=60, noise_px=1.5,
        perturb_pose=0.01, perturb_pts=0.03, seed=3,
    )
    res = ba.ba_solve(problem, max_iters=25)
    err_rig = float(jnp.mean(jnp.linalg.norm(
        res.cam_c - jnp.asarray(gt["centers"], jnp.float32), axis=-1)))

    # unconstrained: each (frame, sub) view is its own camera
    n_frames = gt["centers"].shape[0]
    L, K = problem.obs_mask.shape
    view_idx = problem.obs_cam * 2 + problem.obs_sub  # (L, K)
    sub_R = jnp.asarray(gt["sub_R"], jnp.float32)
    sub_t = jnp.asarray(gt["sub_t"], jnp.float32)
    R_f = jnp.asarray(gt["R_f"], jnp.float32)
    R_v = jnp.einsum("sij,fjk->fsik", sub_R, R_f).reshape(2 * n_frames, 3, 3)
    # camera center of composed pose: c_v = c_f - R_f^T R_s^T t_s
    c_v = (jnp.asarray(gt["centers"], jnp.float32)[:, None]
           - jnp.einsum("fji,skj,sk->fsi", R_f, sub_R, sub_t)).reshape(-1, 3)
    q_v = geo.mat_to_quat(R_v)
    import numpy.random as npr
    rng = np.random.default_rng(3)
    q_p = np.asarray(q_v) + rng.normal(0, 0.01, (2 * n_frames, 4))
    q_p /= np.linalg.norm(q_p, axis=1, keepdims=True)
    c_p = np.asarray(c_v) + rng.normal(0, 0.01, (2 * n_frames, 3))
    fixed = np.zeros(2 * n_frames, bool)
    fixed[:4] = True
    q_p[fixed] = np.asarray(q_v)[fixed]
    c_p[fixed] = np.asarray(c_v)[fixed]
    flat = ba.BAProblem(
        cam_q=jnp.asarray(q_p, jnp.float32),
        cam_c=jnp.asarray(c_p, jnp.float32),
        points=problem.points,
        intr=problem.intr,
        obs_cam=view_idx,
        obs_intr=problem.obs_intr,
        obs_uv=problem.obs_uv,
        obs_mask=problem.obs_mask,
        cam_fixed=jnp.asarray(fixed),
        point_fixed=problem.point_fixed,
    )
    res_flat = ba.ba_solve(flat, max_iters=25)
    c_flat = np.asarray(res_flat.cam_c)
    # frame centers from the sub-pose-0 views
    err_flat = float(np.mean(np.linalg.norm(
        c_flat.reshape(n_frames, 2, 3)[:, 0] - gt["centers"], axis=-1)))
    assert err_rig <= err_flat * 1.1, (err_rig, err_flat)


def test_rig_sequence_from_independent_views():
    """RigSequence analog: independently-posed (noisy) rig views ->
    sub-pose calibration -> rig BA -> view poses better than the input."""
    from alicevision_tpu.sfm.rig_sequence import solve_rig_sequence

    problem, gt = _make_rig_problem(n_frames=10, n_points=150, seed=5)
    n_frames = gt["centers"].shape[0]
    rng = np.random.default_rng(7)

    # per-view GT poses + independent noise (simulating separate resections)
    sub_R = gt["sub_R"]; sub_t = gt["sub_t"]; R_f = gt["R_f"]
    view_frame = np.repeat(np.arange(n_frames), 2)
    view_sub = np.tile(np.arange(2), n_frames)
    R_v = np.einsum("vij,vjk->vik", sub_R[view_sub], R_f[view_frame])
    c_v = (gt["centers"][view_frame]
           - np.einsum("vji,vkj,vk->vi", R_f[view_frame], sub_R[view_sub],
                       sub_t[view_sub]))
    dw = rng.normal(0, 0.01, (2 * n_frames, 3))
    dR = np.asarray(geo.so3_exp(jnp.asarray(dw, jnp.float32)))
    R_noisy = np.einsum("vij,vjk->vik", dR, R_v)
    c_noisy = c_v + rng.normal(0, 0.02, c_v.shape)
    posed = np.ones(2 * n_frames, bool)

    # flat observations from the rig problem's tables, re-keyed by view
    L, K = problem.obs_mask.shape
    m = np.asarray(problem.obs_mask)
    o_lm = np.broadcast_to(np.arange(L)[:, None], (L, K))[m]
    o_view = (np.asarray(problem.obs_cam) * 2 + np.asarray(problem.obs_sub))[m]
    o_uv = np.asarray(problem.obs_uv)[m]
    pts0 = np.asarray(problem.points) + rng.normal(0, 0.02, (L, 3))

    intr = jax.tree_util.tree_map(lambda a: np.asarray(a), problem.intr)
    R_out, c_out, sub_R_est, sub_t_est, _, _, _, res = solve_rig_sequence(
        R_noisy, c_noisy, posed, view_frame, view_sub, 2,
        pts0, intr, o_lm, o_view, np.zeros(len(o_lm), np.int32), o_uv,
        max_track=24, fix_gauge=1,  # a noisy gauge frame = rigid offset, absorbed below
    )
    ang = np.degrees(np.linalg.norm(np.asarray(geo.so3_log(
        jnp.asarray(sub_R_est[1] @ gt["sub_R"][1].T, jnp.float32)[None]))[0]))
    assert ang < 0.2, ang
    assert np.linalg.norm(sub_t_est[1] - gt["sub_t"][1]) < 0.01
    # the optimized scene is anchored to the (noisy) gauge frames, so
    # compare up to a similarity alignment
    from alicevision_tpu.sfm.alignment import umeyama_similarity

    def aligned_err(est):
        s, R, t = umeyama_similarity(est, c_v)
        return np.linalg.norm(s * est @ R.T + t - c_v, axis=-1).mean()

    err_in = aligned_err(c_noisy)
    err_out = aligned_err(c_out)
    assert err_out < err_in * 0.3, (err_out, err_in)
