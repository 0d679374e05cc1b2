import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import geometry as geo


def test_quat_mat_roundtrip():
    key = jax.random.PRNGKey(0)
    R = geo.random_rotation(key, (64,))
    q = geo.mat_to_quat(R)
    R2 = geo.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
    # orthonormality
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )


def test_quat_rotate_matches_matmul():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    R = geo.random_rotation(k1, (32,))
    v = jax.random.normal(k2, (32, 3))
    q = geo.mat_to_quat(R)
    np.testing.assert_allclose(
        np.asarray(geo.quat_rotate(q, v)),
        np.asarray(jnp.einsum("nij,nj->ni", R, v)),
        atol=1e-5,
    )


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    direction = jax.random.normal(k1, (64, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    # keep |w| < pi so log(exp(w)) == w
    mag = jax.random.uniform(k2, (64, 1), minval=1e-3, maxval=3.0)
    w = direction * mag
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = geo.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)


def test_pose_transform_roundtrip():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    R = geo.random_rotation(k1, (16,))
    c = jax.random.normal(k2, (16, 3))
    x = jax.random.normal(k3, (16, 3))
    pose = geo.pose_from_Rc(R, c)
    x_cam = geo.transform(pose, x)
    x_back = geo.inverse_transform(pose, x_cam)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_back), atol=1e-5)
    # against explicit matrix math: R (x - c)
    ref = jnp.einsum("nij,nj->ni", R, x - c)
    np.testing.assert_allclose(np.asarray(x_cam), np.asarray(ref), atol=1e-5)


def test_pose_compose_inverse():
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 5)
    a = geo.pose_from_Rc(geo.random_rotation(ks[0], (8,)), jax.random.normal(ks[1], (8, 3)))
    b = geo.pose_from_Rc(geo.random_rotation(ks[2], (8,)), jax.random.normal(ks[3], (8, 3)))
    x = jax.random.normal(ks[4], (8, 3))
    ab = geo.compose(a, b)
    np.testing.assert_allclose(
        np.asarray(geo.transform(ab, x)),
        np.asarray(geo.transform(a, geo.transform(b, x))),
        atol=1e-4,
    )
    ident = geo.compose(a, geo.pose_inverse(a))
    np.testing.assert_allclose(np.asarray(geo.transform(ident, x)), np.asarray(x), atol=1e-4)


def test_pose_from_Rt_roundtrip():
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    R = geo.random_rotation(k1, (8,))
    t = jax.random.normal(k2, (8, 3))
    pose = geo.pose_from_Rt(R, t)
    np.testing.assert_allclose(np.asarray(pose.t), np.asarray(t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pose.R), np.asarray(R), atol=1e-5)
