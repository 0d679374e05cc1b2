import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alicevision_tpu import camera as cam
from alicevision_tpu import geometry as geo


def _sample_points(key, n=256):
    """Points in front of the camera, within a moderate field of view."""
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, 2), minval=-0.4, maxval=0.4)
    z = jax.random.uniform(k2, (n, 1), minval=1.0, maxval=10.0)
    return jnp.concatenate([xy * z, z], axis=-1)


def test_pinhole_project_matches_K():
    intr = cam.make_intrinsics(1920, 1080, focal_px=1200.0)
    x = _sample_points(jax.random.PRNGKey(0))
    pix = cam.project_cam(intr, x)
    K = cam.K_matrix(intr)
    hom = jnp.einsum("ij,nj->ni", K, x)
    ref = hom[:, :2] / hom[:, 2:3]
    np.testing.assert_allclose(np.asarray(pix), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize(
    "kind,params",
    [
        (cam.DISTO_RADIALK1, (-0.2,)),
        (cam.DISTO_RADIALK3, (-0.25, 0.08, -0.01)),
        (cam.DISTO_BROWN, (-0.2, 0.05, -0.005, 0.001, -0.0015)),
        (cam.DISTO_FISHEYE, (0.1, -0.02, 0.003, -0.0004)),
        (cam.DISTO_FISHEYE1, (0.9,)),
    ],
)
def test_distortion_roundtrip(kind, params):
    intr = cam.make_intrinsics(1920, 1080, 1000.0, disto_kind=kind, disto_params=params)
    key = jax.random.PRNGKey(1)
    p = jax.random.uniform(key, (512, 2), minval=-0.45, maxval=0.45)
    d = cam.add_distortion(intr.disto_kind, intr.disto, p)
    u = cam.remove_distortion(intr.disto_kind, intr.disto, d)
    np.testing.assert_allclose(np.asarray(u), np.asarray(p), atol=2e-4)


def test_distortion_none_is_identity():
    intr = cam.make_intrinsics(100, 100, 50.0)
    p = jnp.array([[0.1, -0.2], [0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(cam.add_distortion(intr.disto_kind, intr.disto, p)),
        np.asarray(p),
        atol=1e-7,
    )


def test_project_backproject_roundtrip():
    intr = cam.make_intrinsics(
        1920, 1080, 1200.0, disto_kind=cam.DISTO_RADIALK3, disto_params=(-0.2, 0.04, -0.002)
    )
    x = _sample_points(jax.random.PRNGKey(2))
    pix = cam.project_cam(intr, x)
    ray = cam.backproject_ray(intr, pix)
    x_dir = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ray), np.asarray(x_dir), atol=5e-4)


def test_equidistant_project_backproject():
    intr = cam.make_intrinsics(1000, 1000, 400.0, cam_kind=cam.CAM_EQUIDISTANT)
    key = jax.random.PRNGKey(3)
    # wide angles, including > 90 deg off-axis
    theta = jax.random.uniform(key, (128,), minval=0.05, maxval=1.8)
    phi = jax.random.uniform(jax.random.PRNGKey(4), (128,), minval=0, maxval=2 * np.pi)
    d = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)], -1
    )
    pix = cam.project_cam(intr, d * 5.0)
    ray = cam.backproject_ray(intr, pix)
    np.testing.assert_allclose(np.asarray(ray), np.asarray(d), atol=1e-4)


def test_batched_mixed_models():
    """Rows with different models batch through a single vectorized call."""
    rows = [
        cam.make_intrinsics(640, 480, 500.0),
        cam.make_intrinsics(640, 480, 500.0, disto_kind=cam.DISTO_RADIALK1, disto_params=(-0.1,)),
        cam.make_intrinsics(640, 480, 500.0, cam_kind=cam.CAM_EQUIDISTANT),
    ]
    table = cam.stack_intrinsics(rows)
    x = jnp.array([[0.1, 0.2, 2.0]]).repeat(3, axis=0)
    pix_batched = jax.vmap(cam.project_cam)(table, x)
    for i, r in enumerate(rows):
        pix_single = cam.project_cam(r, x[i])
        np.testing.assert_allclose(
            np.asarray(pix_batched[i]), np.asarray(pix_single), atol=1e-4
        )


def test_ima2cam_cam2ima_roundtrip():
    intr = cam.make_intrinsics(1920, 1080, 1200.0, offset=(3.0, -2.0))
    pix = jnp.array([[0.0, 0.0], [960.0, 540.0], [1919.0, 1079.0]])
    back = cam.cam2ima(intr, cam.ima2cam(intr, pix))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-4)


def test_project_world_chain():
    """Full world->pixel chain through a pose."""
    intr = cam.make_intrinsics(1920, 1080, 1200.0)
    key = jax.random.PRNGKey(5)
    R = geo.random_rotation(key, ())
    c = jnp.array([0.5, -0.3, 0.2])
    pose = geo.pose_from_Rc(R, c)
    x_cam = _sample_points(jax.random.PRNGKey(6), 32)
    x_world = geo.inverse_transform(pose, x_cam)
    pix = cam.project_cam(intr, geo.transform(pose, x_world))
    ref = cam.project_cam(intr, x_cam)
    np.testing.assert_allclose(np.asarray(pix), np.asarray(ref), atol=1e-2)
