"""Tests for localization, keyframe, photometric stereo, lighting,
color harmonization, masking, rig calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import geometry as geo
from alicevision_tpu.keyframe import (
    block_flow_displacement,
    select_keyframes_regular,
    select_keyframes_smart,
    sharpness_score,
)
from alicevision_tpu.localization import build_landmark_index, localize_image
from alicevision_tpu.misc import calibrate_rig, harmonize_gains, hsv_mask
from alicevision_tpu.photometric import (
    estimate_sh_lighting,
    normal_integration_dct,
    photometric_stereo,
    render_sh,
)
from alicevision_tpu.utils.synthetic import ring_scene, normalized_obs


# --------------------------------------------------------------------------
# localization
# --------------------------------------------------------------------------


def test_localize_against_scene():
    scene = ring_scene(n_views=8, n_points=150, noise_px=0.2)
    rng = np.random.RandomState(0)
    # fake per-landmark descriptors: random but consistent
    L = scene.points.shape[0]
    lm_desc = rng.rand(L, 64).astype(np.float32)
    lm_desc /= np.linalg.norm(lm_desc, axis=-1, keepdims=True)

    # observations of view 3 = its visible landmarks with noisy descriptors
    v = 3
    vis = np.asarray(scene.visible[v])
    idx = np.nonzero(vis)[0]
    q_desc = lm_desc[idx] + 0.05 * rng.randn(len(idx), 64).astype(np.float32)
    q_desc /= np.linalg.norm(q_desc, axis=-1, keepdims=True)
    q_norm = np.asarray(normalized_obs(scene)[v])[idx]

    res = localize_image(
        jax.random.PRNGKey(0),
        lm_desc,
        np.asarray(scene.points),
        q_desc,
        q_norm,
        focal_px=1200.0,
        im_size=(1920, 1080),
    )
    assert res.success
    R_gt = np.asarray(scene.poses.R[v])
    c_gt = np.asarray(scene.poses.c[v])
    ang = np.degrees(
        np.arccos(np.clip((np.trace(res.R @ R_gt.T) - 1) / 2, -1, 1))
    )
    assert ang < 0.5, ang
    assert np.linalg.norm(res.c - c_gt) < 0.05


def test_build_landmark_index():
    pts = np.zeros((3, 3))
    obs_lm = np.array([0, 0, 1, 2])
    obs_desc = np.array([[1, 0], [0, 1], [2, 0], [0, 3]], float)
    desc, p = build_landmark_index(pts, obs_lm, obs_desc)
    np.testing.assert_allclose(desc[0], [0.5 / np.sqrt(0.5), 0.5 / np.sqrt(0.5)], atol=1e-6)
    np.testing.assert_allclose(desc[1], [1, 0])


# --------------------------------------------------------------------------
# keyframe
# --------------------------------------------------------------------------


def test_sharpness_ranks_blur():
    rng = np.random.RandomState(0)
    sharp = rng.rand(64, 64).astype(np.float32)
    import scipy.ndimage as ndi

    blurry = ndi.gaussian_filter(sharp, 2.0)
    assert float(sharpness_score(jnp.asarray(sharp))) > 3 * float(
        sharpness_score(jnp.asarray(blurry))
    )


def test_block_flow_displacement():
    rng = np.random.RandomState(1)
    a = rng.rand(64, 64).astype(np.float32)
    b = np.roll(a, 3, axis=1)
    d = float(block_flow_displacement(jnp.asarray(a), jnp.asarray(b)))
    assert 2.0 < d < 4.5, d
    d0 = float(block_flow_displacement(jnp.asarray(a), jnp.asarray(a)))
    assert d0 < 0.5


def test_keyframe_selection():
    assert list(select_keyframes_regular(10, 3)) == [0, 3, 6, 9]
    rng = np.random.RandomState(2)
    base = rng.rand(48, 48).astype(np.float32)
    frames = [np.roll(base, s, axis=1) for s in range(0, 40, 2)]
    sel = select_keyframes_smart(frames, motion_threshold=4.0)
    assert len(sel) >= 3
    assert sel[0] == 0
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        select_keyframes_smart(frames[:4], min_gap=2, motion_threshold=4.0)
    assert any(issubclass(w.category, DeprecationWarning) for w in rec)


# --------------------------------------------------------------------------
# photometric stereo + lighting
# --------------------------------------------------------------------------


def _sphere_normals(H=48, W=48):
    ys, xs = np.mgrid[0:H, 0:W]
    x = (xs - W / 2) / (W / 2.2)
    y = (ys - H / 2) / (H / 2.2)
    r2 = x * x + y * y
    mask = r2 < 0.95
    z = np.sqrt(np.clip(1 - r2, 1e-6, 1))
    n = np.stack([x, y, z], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return n.astype(np.float32), mask


def test_photometric_stereo_recovers_normals():
    n_gt, mask = _sphere_normals()
    lights = np.array(
        [[0, 0, 1], [0.5, 0, 0.86], [0, 0.5, 0.86], [-0.5, 0, 0.86], [0, -0.5, 0.86]],
        np.float32,
    )
    lights /= np.linalg.norm(lights, axis=-1, keepdims=True)
    albedo_gt = 0.7
    imgs = np.stack([albedo_gt * np.clip(n_gt @ l, 0, None) for l in lights])
    normals, albedo = photometric_stereo(
        jnp.asarray(imgs), jnp.asarray(lights), mask=jnp.asarray(mask)
    )
    n_est = np.asarray(normals)[mask]
    dots = np.sum(n_est * n_gt[mask], axis=-1)
    assert np.median(dots) > 0.999
    assert abs(float(jnp.median(jnp.asarray(albedo)[mask])) - albedo_gt) < 0.02


def test_normal_integration_flat_slope():
    """Normals of the plane z = a*x integrate back to a linear ramp."""
    H = W = 32
    a = 0.3
    n = np.zeros((H, W, 3), np.float32)
    n[..., 0] = -a
    n[..., 2] = 1.0
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    z = np.asarray(normal_integration_dct(jnp.asarray(n)))
    xs = np.arange(W) - W / 2 + 0.5
    expected = a * xs
    got = z[H // 2] - z[H // 2].mean()
    np.testing.assert_allclose(got[4:-4], expected[4:-4] - expected[4:-4].mean() + got[4:-4].mean() - got[4:-4].mean(), atol=0.2)
    # slope check
    slope = np.polyfit(xs[4:-4], got[4:-4], 1)[0]
    assert abs(slope - a) < 0.05


def test_sh_lighting_roundtrip():
    n_gt, mask = _sphere_normals()
    L_gt = jnp.asarray([0.8, 0.2, -0.1, 0.4, 0.05, -0.02, 0.03, 0.01, 0.1])
    img = render_sh(jnp.asarray(n_gt), L_gt)
    L_est = estimate_sh_lighting(img, jnp.asarray(n_gt), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(L_est), np.asarray(L_gt), atol=1e-3)


# --------------------------------------------------------------------------
# color harmonization / masking / rig
# --------------------------------------------------------------------------


def test_harmonize_gains():
    # views 0,1,2 with gains 1.0, 0.5, 2.0 observing shared gray patches
    rng = np.random.RandomState(3)
    true_g = np.array([1.0, 0.5, 2.0])
    edges, mi, mj = [], [], []
    for (i, j) in [(0, 1), (1, 2), (0, 2)]:
        for _ in range(10):
            m = rng.uniform(0.2, 0.8)
            edges.append((i, j))
            mi.append(m * true_g[i])
            mj.append(m * true_g[j])
    g, o = harmonize_gains(3, np.array(edges), jnp.asarray(mi), jnp.asarray(mj))
    g = np.asarray(g)
    # harmonized: g_i * observed_i should equalize => g ~ 1/true_g up to gauge
    ratio = g * true_g
    np.testing.assert_allclose(ratio / ratio[0], np.ones(3), atol=0.05)


def test_hsv_mask():
    img = jnp.asarray(
        [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [0.5, 0.5, 0.5]]]
    )
    green = hsv_mask(img, h_range=(0.25, 0.45), s_range=(0.5, 1.0))
    assert bool(green[0, 1]) and not bool(green[0, 0]) and not bool(green[0, 3])
    red = hsv_mask(img, h_range=(0.95, 0.05), s_range=(0.5, 1.0))  # wrap
    assert bool(red[0, 0]) and not bool(red[0, 1])


def test_calibrate_rig():
    key = jax.random.PRNGKey(0)
    # GT sub-pose of cam1 relative to cam0
    R_rel_gt = np.asarray(geo.so3_exp(jnp.asarray([0.1, -0.05, 0.2])))
    c_rel_gt = np.array([0.3, 0.0, -0.1])
    F = 12
    R0s, c0s, R1s, c1s = [], [], [], []
    for f in range(F):
        kf = jax.random.fold_in(key, f)
        R0 = np.asarray(geo.random_rotation(kf))
        c0 = np.asarray(jax.random.normal(jax.random.fold_in(kf, 1), (3,)))
        p0 = geo.pose_from_Rc(jnp.asarray(R0), jnp.asarray(c0))
        rel = geo.pose_from_Rc(jnp.asarray(R_rel_gt), jnp.asarray(c_rel_gt))
        p1 = geo.compose(rel, p0)
        R0s.append(R0); c0s.append(c0)
        R1s.append(np.asarray(p1.R)); c1s.append(np.asarray(p1.c))
    subs = calibrate_rig([(np.stack(R0s), np.stack(c0s)), (np.stack(R1s), np.stack(c1s))])
    R_est, c_est = subs[1]
    np.testing.assert_allclose(R_est, R_rel_gt, atol=1e-4)
    np.testing.assert_allclose(c_est, c_rel_gt, atol=1e-4)
