import jax.numpy as jnp
import numpy as np

from alicevision_tpu.mvs import fusion


def _ring_cams(n=4, radius=5.0, fx=100.0, H=64, W=64):
    K = np.tile(np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]]), (n, 1, 1))
    R, c = [], []
    for i in range(n):
        a = 2 * np.pi * i / n
        ci = radius * np.array([np.cos(a), np.sin(a), 0.0])
        fwd = -ci / np.linalg.norm(ci)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R.append(np.stack([right, down, fwd]))
        c.append(ci)
    return K, np.stack(R), np.stack(c)


def _render_sphere_depths(K, R, c, center=(0, 0, 0), rad=1.0):
    """Exact depth maps of a sphere for each camera (ray-sphere)."""
    V = len(K)
    H, W = 64, 64
    depths = np.full((V, H, W), -1.0, np.float32)
    for v in range(V):
        ys, xs = np.mgrid[0:H, 0:W]
        d_cam = np.stack(
            [
                (xs - K[v][0, 2]) / K[v][0, 0],
                (ys - K[v][1, 2]) / K[v][1, 1],
                np.ones_like(xs, np.float64),
            ],
            axis=-1,
        )
        d_world = d_cam @ R[v]  # R^T rows
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        oc = c[v] - np.asarray(center)
        b = np.einsum("hwi,i->hw", d_world, oc)
        disc = b * b - (oc @ oc - rad * rad)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        # depth along camera z = t * (z-component of ray in cam frame)
        z_factor = d_cam[..., 2] / np.linalg.norm(d_cam, axis=-1)
        depth = t * z_factor
        depths[v] = np.where(hit & (t > 0), depth, -1.0).astype(np.float32)
    return depths


def test_backproject_project_roundtrip():
    K, R, c = _ring_cams()
    depth = np.full((64, 64), 4.0, np.float32)
    X = fusion.backproject_depth_map(
        jnp.asarray(depth), jnp.asarray(K[0]), jnp.asarray(R[0]), jnp.asarray(c[0])
    )
    uv, z = fusion.project_points(
        X, jnp.asarray(K[0]), jnp.asarray(R[0]), jnp.asarray(c[0])
    )
    ys, xs = np.mgrid[0:64, 0:64]
    np.testing.assert_allclose(np.asarray(uv[..., 0]), xs, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), ys, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), 4.0, atol=1e-4)


def test_consistency_filter_keeps_true_surface():
    K, R, c = _ring_cams(n=4)
    depths = _render_sphere_depths(K, R, c)
    filt, counts = fusion.consistency_filter(
        jnp.asarray(depths), jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(c, jnp.float32),
        min_consistent=2, rel_tol=0.02,
    )
    filt = np.asarray(filt)
    # most sphere pixels visible from adjacent cams survive
    valid_before = (depths > 0).sum()
    valid_after = (filt > 0).sum()
    assert valid_after > 0.3 * valid_before
    # surviving depths are unchanged
    m = filt > 0
    np.testing.assert_allclose(filt[m], depths[m])


def test_consistency_filter_rejects_outliers():
    K, R, c = _ring_cams(n=4)
    depths = _render_sphere_depths(K, R, c)
    corrupted = depths.copy()
    # corrupt a block of view 0 with bogus depths
    corrupted[0, 20:30, 20:30] = 2.0
    filt, _ = fusion.consistency_filter(
        jnp.asarray(corrupted), jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(c, jnp.float32),
        min_consistent=2, rel_tol=0.02,
    )
    filt = np.asarray(filt)
    assert (filt[0, 20:30, 20:30] > 0).mean() < 0.2


def test_fuse_point_cloud_sphere():
    K, R, c = _ring_cams(n=4)
    depths = _render_sphere_depths(K, R, c)
    pts, cols, views = fusion.fuse_point_cloud(depths, None, K, R, c)
    assert len(pts) > 1000
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(np.median(r), 1.0, atol=0.02)
    assert (np.abs(r - 1.0) < 0.05).mean() > 0.95

    # voxel downsampling reduces count but keeps the surface
    pts2, _, _ = fusion.fuse_point_cloud(depths, None, K, R, c, voxel_size=0.1)
    assert len(pts2) < len(pts)
    r2 = np.linalg.norm(pts2, axis=-1)
    np.testing.assert_allclose(np.median(r2), 1.0, atol=0.03)


def test_depth_range_from_landmarks():
    K, R, c = _ring_cams()
    pts = np.random.RandomState(0).uniform(-1, 1, (500, 3))
    dmin, dmax = fusion.depth_range_from_landmarks(pts, R[0], c[0])
    assert 2.0 < dmin < 5.0
    assert 5.0 < dmax < 8.0
