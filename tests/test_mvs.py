"""SGM plane-sweep depth estimation on a synthetic textured plane/scene.

The reference has NO unit tests for its CUDA depth-map code (SURVEY.md §4);
these golden tests against analytically-known geometry are new coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.mvs import plane_sweep as ps


def _render_plane_scene(z0=4.0, H=96, W=128, fx=120.0, baseline=0.4, n_t=2, seed=0):
    """Fronto-parallel textured plane at depth z0, reference camera at the
    origin and T-cams shifted along +x. T-cam images are rendered by the
    exact plane-induced disparity du = fx * b / z0."""
    rng = np.random.RandomState(seed)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])

    import scipy.ndimage as ndi

    tex = ndi.gaussian_filter(rng.rand(H * 2, W * 2).astype(np.float32), 1.2)

    def tex_at(u, v):
        uu = np.mod(u * 2.0, tex.shape[1] - 1)
        vv = np.mod(v * 2.0, tex.shape[0] - 1)
        u0, v0 = np.floor(uu).astype(int), np.floor(vv).astype(int)
        fu, fv = uu - u0, vv - v0
        return (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u0 + 1] * fu * (1 - fv)
            + tex[v0 + 1, u0] * (1 - fu) * fv
            + tex[v0 + 1, u0 + 1] * fu * fv
        )

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    ref_img = tex_at(xs, ys).astype(np.float32)

    t_imgs, K_t, R_rel, t_rel = [], [], [], []
    for i in range(1, n_t + 1):
        b = baseline * i
        # pose of tcam in ref frame: x_t = x_ref - (b, 0, 0)
        R, t = np.eye(3), np.array([-b, 0.0, 0.0])
        # tcam pixel u_t sees the plane point that ref sees at u_t + fx*b/z0
        du = fx * b / z0
        t_imgs.append(tex_at(xs + du, ys).astype(np.float32))
        K_t.append(K)
        R_rel.append(R)
        t_rel.append(t)
    return K, ref_img, np.stack(t_imgs), K_t, R_rel, t_rel, z0


def test_homography_warp_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(32, 48).astype(np.float32))
    out, valid = ps.warp_homography(img, jnp.eye(3), (32, 48))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert bool(jnp.all(valid))


def test_plane_sweep_flat_plane():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _render_plane_scene()
    params = ps.SgmParams(n_depths=64)
    depth, sim = ps.sgm_depth_map(
        jnp.asarray(ref),
        jnp.asarray(t_imgs),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(np.stack(K_t), jnp.float32),
        jnp.asarray(np.stack(R_rel), jnp.float32),
        jnp.asarray(np.stack(t_rel), jnp.float32),
        d_min=2.0,
        d_max=8.0,
        params=params,
    )
    d = np.asarray(depth)
    # interior pixels recover the plane depth within a plane step; the left
    # margin (max disparity ~ fx*b_max/z0 = 24 px) has no T-cam coverage
    inner = d[10:-10, 28:-10]
    err = np.abs(inner - z0) / z0
    assert np.median(err) < 0.02, np.median(err)
    assert (err < 0.05).mean() > 0.9


def test_sgm_aggregation_smooths_outliers():
    """A noisy flat cost volume with a clear global minimum: SGM must not
    change the winner but must reduce spurious minima."""
    rng = np.random.RandomState(1)
    D, H, W = 32, 40, 40
    cost = np.full((D, H, W), 128.0, np.float32)
    cost[12] = 20.0  # true plane
    cost += rng.rand(D, H, W).astype(np.float32) * 10
    # spurious strong minima at random voxels
    for _ in range(50):
        d, y, x = rng.randint(0, D), rng.randint(0, H), rng.randint(0, W)
        cost[d, y, x] = 0.0
    ref = np.zeros((H, W), np.float32)  # flat image -> strong smoothing
    agg = ps.sgm_aggregate(jnp.asarray(cost), jnp.asarray(ref), ps.SgmParams())
    best = np.asarray(jnp.argmin(agg, axis=0))
    assert (best == 12).mean() > 0.95


def test_depth_planes_inverse_spacing():
    d = np.asarray(ps.inverse_depth_planes(2.0, 8.0, 16))
    assert abs(d[0] - 2.0) < 1e-5 and abs(d[-1] - 8.0) < 1e-4
    inv = 1.0 / d
    steps = np.diff(inv)
    np.testing.assert_allclose(steps, steps[0], rtol=1e-3)


def test_retrieve_best_depth_subpixel():
    D, H, W = 16, 8, 8
    depths = ps.inverse_depth_planes(2.0, 8.0, D)
    # quadratic cost with minimum between plane 7 and 8
    inv = 1.0 / np.asarray(depths)
    inv_true = inv[7] + 0.4 * (inv[8] - inv[7])
    cost = np.zeros((D, H, W), np.float32)
    for k in range(D):
        cost[k] = ((inv[k] - inv_true) * 100) ** 2 * 255
    depth, sim = ps.retrieve_best_depth(jnp.asarray(cost), depths)
    d = float(np.asarray(depth)[4, 4])
    assert abs(1.0 / d - inv_true) < 0.1 * abs(inv[8] - inv[7])


def test_sgm_eight_direction_aggregation():
    """n_dirs=8 adds the diagonal paths (classic Hirschmuller SGM); on a
    noisy volume with a smooth GT surface it should denoise at least as
    well as the reference-default 4 paths."""
    from alicevision_tpu.mvs.plane_sweep import SgmParams, sgm_aggregate

    rng = np.random.RandomState(0)
    H, W, D = 48, 64, 32
    yy, xx = np.mgrid[0:H, 0:W]
    gt = ((yy + xx) * (D - 8) // (H + W) + 4).astype(np.int64)  # diagonal ramp
    cost = rng.rand(D, H, W).astype(np.float32) * 2.0
    cost[gt, yy, xx] -= 1.5  # GT depth is cheap, plus noise
    ref = ((yy + xx) % 7 / 7.0).astype(np.float32)

    err = {}
    for nd in (4, 8):
        agg = np.asarray(sgm_aggregate(
            jnp.asarray(cost), jnp.asarray(ref), SgmParams(n_depths=D, n_dirs=nd)
        ))
        assert np.isfinite(agg).all()
        est = agg.argmin(axis=0)
        err[nd] = np.abs(est - gt).mean()
    assert err[8] <= err[4] + 0.05, err
    # plain argmin of the raw volume must be worse than either
    raw_err = np.abs(cost.argmin(axis=0) - gt).mean()
    assert err[4] < raw_err and err[8] < raw_err
