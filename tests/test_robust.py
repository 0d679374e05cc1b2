import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import camera as cam
from alicevision_tpu import geometry as geo
from alicevision_tpu import robust
from alicevision_tpu.utils.synthetic import ring_scene, normalized_obs


def _corrupt(key, x, frac, scale=300.0):
    """Replace a fraction of correspondences with random outliers."""
    n = x.shape[0]
    k1, k2 = jax.random.split(key)
    is_out = jax.random.uniform(k1, (n,)) < frac
    noise = jax.random.uniform(k2, x.shape, minval=0.0, maxval=scale)
    return jnp.where(is_out[:, None], noise, x), is_out


def test_sample_minimal_no_replacement():
    idx = robust.sample_minimal(jax.random.PRNGKey(0), 50, 8, 64)
    assert idx.shape == (64, 8)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 8


def test_sample_minimal_respects_valid():
    valid = jnp.arange(50) < 10
    idx = robust.sample_minimal(jax.random.PRNGKey(1), 50, 3, 32, valid)
    assert int(jnp.max(idx)) < 10


def test_robust_fundamental_with_outliers():
    scene = ring_scene(n_views=8, n_points=150, noise_px=0.3)
    x1, x2 = scene.observations[0], scene.observations[3]
    x2c, is_out = _corrupt(jax.random.PRNGKey(2), x2, 0.3, 1000.0)
    rm = robust.robust_fundamental(
        jax.random.PRNGKey(3), x1, x2c, im_size=(1920, 1080), n_hyps=512
    )
    inl = np.asarray(rm.inliers)
    out = np.asarray(is_out)
    # all detected inliers must be true inliers; most true inliers recovered
    assert (inl & out).sum() <= 3
    assert inl.sum() > 0.8 * (~out).sum()


def test_robust_resection_with_outliers():
    scene = ring_scene(n_views=8, n_points=150, noise_px=0.2)
    v = 2
    obs_n = normalized_obs(scene)[v]
    obs_c, is_out = _corrupt(jax.random.PRNGKey(4), obs_n, 0.3, 0.8)
    rp = robust.robust_resection_p3p(
        jax.random.PRNGKey(5),
        scene.points,
        obs_c,
        focal_mean=1200.0,
        im_size=(1920, 1080),
        n_hyps=256,
    )
    R_gt, t_gt = scene.poses.R[v], scene.poses.t[v]
    ang = float(jnp.linalg.norm(geo.so3_log(rp.R @ R_gt.T)))
    assert ang < 2e-3
    assert float(jnp.linalg.norm(rp.t - t_gt)) < 5e-3
    inl = np.asarray(rp.inliers)
    assert (inl & np.asarray(is_out)).sum() <= 3


def test_robust_relative_pose_with_outliers():
    scene = ring_scene(n_views=8, n_points=200, noise_px=0.2)
    i, j = 0, 2
    x1n, x2n = normalized_obs(scene)[i], normalized_obs(scene)[j]
    x2c, is_out = _corrupt(jax.random.PRNGKey(6), x2n, 0.25, 0.8)
    R, t, rm = robust.robust_relative_pose(
        jax.random.PRNGKey(7), x1n, x2c, focal_mean=1200.0, im_size=(1920, 1080),
        n_hyps=512,
    )
    pose_i = geo.Pose(q=scene.poses.q[i : i + 1], c=scene.poses.c[i : i + 1])
    pose_j = geo.Pose(q=scene.poses.q[j : j + 1], c=scene.poses.c[j : j + 1])
    rel_gt = geo.relative_pose(pose_i, pose_j)
    ang = float(jnp.degrees(jnp.linalg.norm(geo.so3_log(R @ rel_gt.R[0].T))))
    assert ang < 0.5
    t_est = t / jnp.linalg.norm(t)
    t_gt = rel_gt.t[0] / jnp.linalg.norm(rel_gt.t[0])
    assert float(jnp.abs(jnp.sum(t_est * t_gt))) > 0.999


def test_robust_homography_with_outliers():
    scene = ring_scene(n_views=6, n_points=100)
    pts = scene.points * jnp.array([1.0, 0.0, 1.0])
    x_cam = geo.transform(
        geo.Pose(q=scene.poses.q[:, None, :], c=scene.poses.c[:, None, :]),
        pts[None, :, :],
    )
    obs = cam.project_cam(scene.intrinsics, x_cam)
    x2c, is_out = _corrupt(jax.random.PRNGKey(8), obs[2], 0.3, 1000.0)
    rm = robust.robust_homography(
        jax.random.PRNGKey(9), obs[1], x2c, im_size=(1920, 1080), n_hyps=256
    )
    inl = np.asarray(rm.inliers)
    out = np.asarray(is_out)
    assert (inl & out).sum() <= 3
    assert inl.sum() > 0.8 * (~out).sum()


def test_acransac_jit_compatible():
    """The whole robust pipeline must jit (static shapes)."""
    scene = ring_scene(n_views=6, n_points=100)
    f = jax.jit(
        lambda k, a, b: robust.robust_fundamental(k, a, b, im_size=(1920, 1080), n_hyps=128)
    )
    rm = f(jax.random.PRNGKey(0), scene.observations[0], scene.observations[2])
    assert int(rm.n_inliers) > 80
