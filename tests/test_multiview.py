import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alicevision_tpu import camera as cam
from alicevision_tpu import geometry as geo
from alicevision_tpu import multiview as mv
from alicevision_tpu.numeric import cubic_roots_real, quartic_roots_real
from alicevision_tpu.utils.synthetic import ring_scene, normalized_obs


# ---------------------------------------------------------------------------
# Polynomial roots
# ---------------------------------------------------------------------------


def test_cubic_roots():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    roots, n = cubic_roots_real(
        jnp.array(1.0), jnp.array(-6.0), jnp.array(11.0), jnp.array(-6.0)
    )
    np.testing.assert_allclose(np.sort(np.asarray(roots)), [1, 2, 3], atol=1e-4)
    assert int(n) == 3
    # single real root: x^3 + x + 1
    roots, n = cubic_roots_real(
        jnp.array(1.0), jnp.array(0.0), jnp.array(1.0), jnp.array(1.0)
    )
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(roots[0]), -0.6823278, atol=1e-4)


def test_quartic_roots():
    # (x-1)(x+1)(x-2)(x+3) = x^4 + x^3 -7x^2 -x + 6
    roots, valid = quartic_roots_real(
        jnp.array(1.0), jnp.array(1.0), jnp.array(-7.0), jnp.array(-1.0), jnp.array(6.0)
    )
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(got, [-3, -1, 1, 2], atol=1e-3)


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------


def _scene(**kw):
    return ring_scene(n_views=8, n_points=50, **kw)


def _proj_matrices(scene):
    K = cam.K_matrix(scene.intrinsics)
    return geo.projection_matrix(K, scene.poses)  # (V, 3, 4)


def test_triangulate_dlt_exact():
    scene = _scene()
    P = _proj_matrices(scene)
    X = mv.triangulate_dlt(
        P[0][None], P[4][None], scene.observations[0], scene.observations[4]
    )
    np.testing.assert_allclose(np.asarray(X), np.asarray(scene.points), atol=1e-2)


def test_triangulate_nview_masked():
    scene = _scene()
    P = _proj_matrices(scene)  # (V, 3, 4)
    V, N = scene.visible.shape
    Pb = jnp.broadcast_to(P[None], (N, V, 3, 4))
    x = jnp.swapaxes(scene.observations, 0, 1)  # (N, V, 2)
    mask = jnp.swapaxes(scene.visible, 0, 1)
    X = mv.triangulate_nview(Pb, x, mask)
    np.testing.assert_allclose(np.asarray(X), np.asarray(scene.points), atol=1e-2)


def test_triangulate_midpoint():
    scene = _scene()
    rays_cam = cam.backproject_ray(scene.intrinsics, scene.observations)  # (V,N,3)
    q = scene.poses.q[:, None, :]
    rays_world = geo.quat_rotate(geo.quat_conj(q), rays_cam)
    centers = jnp.broadcast_to(scene.poses.c[:, None, :], rays_world.shape)
    X = mv.triangulate_midpoint(
        jnp.swapaxes(centers, 0, 1), jnp.swapaxes(rays_world, 0, 1)
    )
    np.testing.assert_allclose(np.asarray(X), np.asarray(scene.points), atol=1e-2)


def test_reprojection_errors_zero_at_gt():
    scene = _scene()
    P = _proj_matrices(scene)
    N, V = scene.points.shape[0], P.shape[0]
    Pb = jnp.broadcast_to(P[None], (N, V, 3, 4))
    x = jnp.swapaxes(scene.observations, 0, 1)
    err = mv.reprojection_errors(Pb, x, scene.points)
    assert float(jnp.max(err)) < 1e-1


# ---------------------------------------------------------------------------
# Epipolar solvers
# ---------------------------------------------------------------------------


def test_fundamental_8pt_on_gt():
    scene = _scene()
    x1, x2 = scene.observations[0], scene.observations[3]
    F = mv.fundamental_8pt(x1, x2)
    d = mv.epipolar_distance_sq(F, x1, x2)
    assert float(jnp.sqrt(jnp.mean(d))) < 0.1  # px


def test_fundamental_7pt_on_gt():
    scene = _scene()
    x1, x2 = scene.observations[0][:7], scene.observations[3][:7]
    Fs = mv.fundamental_7pt(x1, x2)  # (3, 3, 3)
    x1a, x2a = scene.observations[0], scene.observations[3]
    d = jnp.stack([mv.epipolar_distance_sq(Fs[i], x1a, x2a) for i in range(3)])
    best = jnp.min(jnp.sqrt(jnp.mean(d, axis=-1)))
    assert float(best) < 0.5


def test_essential_and_relative_pose():
    scene = _scene()
    i, j = 0, 2
    x1n = normalized_obs(scene)[i]
    x2n = normalized_obs(scene)[j]
    E = mv.essential_8pt(x1n, x2n)
    pose = mv.relative_pose_from_essential(E, x1n, x2n)
    # ground truth relative pose j in frame of i
    pose_i = geo.Pose(q=scene.poses.q[i : i + 1], c=scene.poses.c[i : i + 1])
    pose_j = geo.Pose(q=scene.poses.q[j : j + 1], c=scene.poses.c[j : j + 1])
    rel_gt = geo.relative_pose(pose_i, pose_j)

    # rotation error in degrees
    dR = pose.R[0] @ rel_gt.R[0].T if pose.R.ndim == 3 else pose.R @ rel_gt.R[0].T
    ang = jnp.degrees(jnp.linalg.norm(geo.so3_log(dR)))
    assert float(ang) < 0.5
    # translation direction error (scale is unobservable)
    t_est = pose.t / jnp.linalg.norm(pose.t)
    t_gt = rel_gt.t[0] / jnp.linalg.norm(rel_gt.t[0])
    cos = jnp.abs(jnp.sum(t_est * t_gt))
    assert float(cos) > 0.999


def test_homography_4pt_planar():
    # planar points -> exact homography between two views
    scene = ring_scene(n_views=6, n_points=64, point_extent=1.5)
    # squash to plane y=0 (the ring centers lie in z=0, so avoid that plane)
    pts = scene.points * jnp.array([1.0, 0.0, 1.0])
    intr = scene.intrinsics
    x_cam = geo.transform(
        geo.Pose(q=scene.poses.q[:, None, :], c=scene.poses.c[:, None, :]),
        pts[None, :, :],
    )
    obs = cam.project_cam(intr, x_cam)
    # views 1 (60 deg) and 2 (120 deg) are well off the point plane
    H = mv.homography_4pt(obs[1], obs[2])
    err = mv.homography_error_sq(H, obs[1], obs[2])
    assert float(jnp.sqrt(jnp.mean(err))) < 0.1


# ---------------------------------------------------------------------------
# P3P + refine
# ---------------------------------------------------------------------------


def test_p3p_recovers_pose():
    scene = _scene()
    v = 1
    rays = cam.backproject_ray(scene.intrinsics, scene.observations[v, :3])
    R, t, valid = mv.p3p(scene.points[:3][None], rays[None])
    R, t, valid = R[0], t[0], valid[0]
    assert bool(jnp.any(valid))
    R_gt = scene.poses.R[v]
    t_gt = scene.poses.t[v]
    errs = []
    for k in range(4):
        if bool(valid[k]):
            ang = jnp.linalg.norm(geo.so3_log(R[k] @ R_gt.T))
            errs.append(float(ang) + float(jnp.linalg.norm(t[k] - t_gt)))
    assert min(errs) < 1e-2


def test_p3p_batched():
    scene = _scene()
    v = 2
    # many random 3-point samples from one view
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (32, 3), 0, scene.points.shape[0])
    world = scene.points[idx]  # (32, 3, 3)
    rays = cam.backproject_ray(scene.intrinsics, scene.observations[v][idx])
    R, t, valid = mv.p3p(world, rays)
    R_gt, t_gt = scene.poses.R[v], scene.poses.t[v]
    # for most samples at least one candidate matches GT
    ok = 0
    for s in range(32):
        for k in range(4):
            if bool(valid[s, k]):
                ang = float(jnp.linalg.norm(geo.so3_log(R[s, k] @ R_gt.T)))
                dt = float(jnp.linalg.norm(t[s, k] - t_gt))
                if ang < 1e-2 and dt < 1e-2:
                    ok += 1
                    break
    assert ok >= 28  # tolerate occasional degenerate samples


def test_gauss_newton_refine():
    scene = _scene()
    v = 3
    R_gt, t_gt = scene.poses.R[v], scene.poses.t[v]
    # perturb
    dw = jnp.array([0.02, -0.01, 0.015])
    R0 = geo.so3_exp(dw) @ R_gt
    t0 = t_gt + jnp.array([0.05, -0.02, 0.03])
    obs_n = normalized_obs(scene)[v]
    R1, t1 = mv.gauss_newton_pose_refine(R0, t0, scene.points, obs_n, iters=8)
    assert float(jnp.linalg.norm(geo.so3_log(R1 @ R_gt.T))) < 1e-4
    assert float(jnp.linalg.norm(t1 - t_gt)) < 1e-4


def test_kabsch():
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    R_gt = geo.random_rotation(k1)
    t_gt = jax.random.normal(k2, (3,))
    src = jax.random.normal(k3, (20, 3))
    dst = src @ R_gt.T + t_gt
    R, t = mv.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-5)


class TestResectionNPoint:
    """EPnP and 6-point DLT resection against exact synthetic poses
    (ref: multiview/resection/EPnPSolver.hpp, Resection6PSolver.hpp)."""

    def _scene(self, seed, n=12):
        import numpy as np

        rng = np.random.default_rng(seed)
        from alicevision_tpu.geometry.rotations import so3_exp

        R = np.array(so3_exp(jnp.asarray(rng.normal(size=3) * 0.4, jnp.float32)))
        t = rng.normal(size=3) * 0.3 + np.array([0.0, 0.0, 4.0])
        X = rng.normal(size=(n, 3))
        Xc = X @ R.T + t
        uv = Xc[:, :2] / Xc[:, 2:]
        return X, uv, R, t

    def test_dlt6_exact(self):
        from alicevision_tpu.multiview import resection_dlt6

        for seed in range(3):
            X, uv, R, t = self._scene(seed)
            Re, te, ve = resection_dlt6(jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32))
            assert bool(ve)
            np.testing.assert_allclose(np.asarray(Re), R, atol=2e-4)
            np.testing.assert_allclose(np.asarray(te), t, atol=2e-3)

    def test_epnp_exact(self):
        from alicevision_tpu.multiview import epnp

        for seed in range(3):
            X, uv, R, t = self._scene(seed)
            Re, te, ve = epnp(jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32))
            assert bool(ve)
            np.testing.assert_allclose(np.asarray(Re), R, atol=2e-4)
            np.testing.assert_allclose(np.asarray(te), t, atol=2e-3)

    def test_epnp_masked_and_batched(self):
        from alicevision_tpu.multiview import epnp

        X, uv, R, t = self._scene(7, n=16)
        # Corrupt the last 4 points but mask them out.
        uv2 = uv.copy()
        uv2[-4:] += 10.0
        mask = np.ones(16, bool)
        mask[-4:] = False
        Re, te, ve = epnp(
            jnp.asarray(X, jnp.float32), jnp.asarray(uv2, jnp.float32), mask=jnp.asarray(mask)
        )
        assert bool(ve)
        np.testing.assert_allclose(np.asarray(Re), R, atol=5e-4)
        Xb = jnp.asarray(np.stack([X, X]), jnp.float32)
        uvb = jnp.asarray(np.stack([uv, uv]), jnp.float32)
        Rb, tb, vb = epnp(Xb, uvb)
        assert Rb.shape == (2, 3, 3) and tb.shape == (2, 3) and vb.shape == (2,)


def test_lmeds_select_rejects_outliers():
    """LMedS picks the model supported by the inlier majority
    (ref: robustEstimation/LMeds.hpp)."""
    from alicevision_tpu.robust import lmeds_select

    rng = np.random.default_rng(0)
    n = 100
    res_good = np.abs(rng.normal(size=n)) * 1e-3
    res_good[60:] = np.abs(rng.normal(size=40)) * 10.0  # 40% outliers
    res_bad = np.abs(rng.normal(size=n)) * 5.0
    res_sq = jnp.asarray(np.stack([res_bad, res_good]) ** 2, jnp.float32)
    sel = lmeds_select(res_sq, sample_size=2)
    assert int(sel.best_hyp) == 1
    assert int(sel.n_inliers) >= 55
    assert bool(np.all(np.asarray(sel.inliers)[:55]))
