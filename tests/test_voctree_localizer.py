"""Retrieval-based localization + rig resection against a synthetic scene.

Ref: localization/VoctreeLocalizer.hpp:34-153, localization/rigResection.cpp.
"""

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu import geometry as geo
from alicevision_tpu.localization.voctree_localizer import (
    VoctreeLocalizer,
    rig_resection,
)
from alicevision_tpu.utils.synthetic import ring_scene


def _scene_with_descriptors(n_views=8, n_points=300, D=32, seed=0):
    """Ring scene + synthetic descriptors: each landmark gets a random unit
    descriptor; observations see it with small noise."""
    scene = ring_scene(n_views=n_views, n_points=n_points, seed=seed)
    rng = np.random.default_rng(seed)
    lm_desc = rng.normal(size=(n_points, D))
    lm_desc /= np.linalg.norm(lm_desc, axis=1, keepdims=True)
    vis = np.asarray(scene.visible)
    obs_np = np.asarray(scene.observations)
    o_lm, o_view, o_desc, o_uv = [], [], [], []
    for v in range(n_views):
        ids = np.nonzero(vis[v])[0]
        d = lm_desc[ids] + rng.normal(0, 0.05, (len(ids), D))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_lm.extend(ids)
        o_view.extend([v] * len(ids))
        o_desc.append(d)
        o_uv.append(obs_np[v, ids])
    return (
        scene,
        lm_desc,
        np.asarray(o_lm),
        np.asarray(o_view),
        np.concatenate(o_desc),
        np.concatenate(o_uv),
    )


def test_retrieval_finds_neighbor_views():
    scene, lm_desc, o_lm, o_view, o_desc, o_uv = _scene_with_descriptors()
    loc = VoctreeLocalizer(np.asarray(scene.points), o_lm, o_view, o_desc)
    # query with view 3's own (noisy) descriptors: view 3 must rank top
    rows = np.nonzero(o_view == 3)[0]
    top = loc.retrieve(o_desc[rows], top_k=3)
    assert 3 in top, top


def test_localize_held_out_view():
    """Localize a held-out query against the DB of the other views to <1%
    of scene scale (VERDICT round-1 'done' criterion)."""
    scene, lm_desc, o_lm, o_view, o_desc, o_uv = _scene_with_descriptors()
    held = 5
    db = o_view != held
    loc = VoctreeLocalizer(
        np.asarray(scene.points), o_lm[db], o_view[db], o_desc[db]
    )
    rows = np.nonzero(o_view == held)[0]
    rng = np.random.default_rng(1)
    q_desc = o_desc[rows] + rng.normal(0, 0.02, o_desc[rows].shape)
    # normalized coords of the held-out view's observations
    from alicevision_tpu import camera as cam

    intr = scene.intrinsics
    p = cam.ima2cam(intr, jnp.asarray(o_uv[rows]))
    q_norm = np.asarray(cam.remove_distortion(intr.disto_kind, intr.disto, p))

    f = float(np.asarray(intr.scale)[0])
    wh = tuple(np.asarray(intr.size))
    res = loc.localize(jax.random.PRNGKey(0), q_desc, q_norm, f, wh)
    assert res.success, res.n_inliers
    c_gt = np.asarray(scene.poses.c)[held]
    R_gt = np.asarray(scene.poses.R)[held]
    scene_scale = float(np.linalg.norm(np.asarray(scene.poses.c), axis=1).max())
    assert np.linalg.norm(res.c - c_gt) < 0.01 * scene_scale
    ang = np.degrees(np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(res.R @ R_gt.T, jnp.float32)[None]))[0]))
    assert ang < 0.5, ang


def test_rig_resection_recovers_frame():
    """Two-camera rig localization with known sub-poses, with outliers."""
    rng = np.random.default_rng(0)
    # GT frame pose
    w = np.array([0.1, -0.2, 0.15])
    R_f = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)[None]))[0]
    c_f = np.array([0.3, -0.4, -4.0])
    sub_R = np.stack([
        np.eye(3),
        np.asarray(geo.so3_exp(jnp.asarray([0.01, 0.02, -0.01], jnp.float32)[None]))[0],
    ])
    sub_t = np.stack([np.zeros(3), np.array([0.3, 0.0, 0.02])])

    pts = rng.uniform(-1.5, 1.5, (120, 3))
    world_pc, obs_pc = [], []
    for s in range(2):
        xf = (pts - c_f) @ R_f.T
        xc = xf @ sub_R[s].T + sub_t[s]
        obs = xc[:, :2] / xc[:, 2:3]
        obs += rng.normal(0, 0.5 / 800.0, obs.shape)  # 0.5px noise at f=800
        # 20% outliers
        n_out = 24
        out_idx = rng.choice(len(obs), n_out, replace=False)
        obs[out_idx] += rng.uniform(-0.2, 0.2, (n_out, 2))
        world_pc.append(pts)
        obs_pc.append(obs)

    res = rig_resection(
        jax.random.PRNGKey(0), world_pc, obs_pc, sub_R, sub_t,
        focal_px=800.0, im_size=(1280.0, 960.0),
    )
    assert res.success
    assert res.n_inliers > 150  # ~80% of 240
    assert np.linalg.norm(res.c_frame - c_f) < 5e-3
    ang = np.degrees(np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(res.R_frame @ R_f.T, jnp.float32)[None]))[0]))
    assert ang < 0.1, ang


def test_joint_rig_resection_beats_per_camera_averaging():
    """Asymmetric noise (camera 1 is 5x noisier): the joint non-central
    resection (rigResection.cpp semantics, used by the rigLocalization CLI)
    must localize the frame better than per-camera P3P + quaternion
    averaging, because the joint fit weighs all correspondences in one
    consensus instead of averaging a good pose with a bad one."""
    from alicevision_tpu import robust
    from alicevision_tpu.localization.voctree_localizer import (
        _frame_from_view,
    )
    from alicevision_tpu.misc.rig import average_quaternions

    rng = np.random.default_rng(3)
    w = np.array([0.05, -0.1, 0.2])
    R_f = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)[None]))[0]
    c_f = np.array([0.2, 0.1, -4.5])
    sub_R = np.stack([
        np.eye(3),
        np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.03, 0.0], jnp.float32)[None]))[0],
    ])
    sub_t = np.stack([np.zeros(3), np.array([0.4, 0.0, 0.0])])
    f_px = 800.0
    wh = (1280.0, 960.0)

    noise = [0.5 / f_px, 2.5 / f_px]  # cam 1 five times noisier
    pts_pc, obs_pc = [], []
    for s in range(2):
        pts = rng.uniform(-1.5, 1.5, (100, 3))
        xf = (pts - c_f) @ R_f.T
        xc = xf @ sub_R[s].T + sub_t[s]
        obs = xc[:, :2] / xc[:, 2:3] + rng.normal(0, noise[s], (100, 2))
        pts_pc.append(pts)
        obs_pc.append(obs)

    res_joint = rig_resection(
        jax.random.PRNGKey(0), pts_pc, obs_pc, sub_R, sub_t, f_px, wh
    )
    assert res_joint.success

    # legacy: per-camera robust P3P -> frame poses -> quaternion average
    qs, cs = [], []
    for s in range(2):
        rp = robust.robust_resection_p3p(
            jax.random.PRNGKey(10 + s),
            jnp.asarray(pts_pc[s], jnp.float32),
            jnp.asarray(obs_pc[s], jnp.float32),
            f_px, wh, n_hyps=256,
        )
        R_v = np.asarray(rp.R)
        c_v = -R_v.T @ np.asarray(rp.t)
        R0, c0 = _frame_from_view(R_v, c_v, sub_R[s], sub_t[s])
        qs.append(np.asarray(geo.mat_to_quat(jnp.asarray(R0, jnp.float32))))
        cs.append(c0)
    q_avg = average_quaternions(jnp.asarray(np.stack(qs)))
    R_avg = np.asarray(geo.quat_to_mat(q_avg))
    c_avg = np.mean(cs, axis=0)

    err_joint = np.linalg.norm(res_joint.c_frame - c_f)
    err_avg = np.linalg.norm(c_avg - c_f)
    ang_joint = np.degrees(np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(res_joint.R_frame @ R_f.T, jnp.float32)[None]))[0]))
    ang_avg = np.degrees(np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(R_avg @ R_f.T, jnp.float32)[None]))[0]))
    assert err_joint < err_avg, (err_joint, err_avg)
    assert ang_joint < ang_avg, (ang_joint, ang_avg)
    assert err_joint < 5e-3
