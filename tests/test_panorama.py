import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import panorama as pano
from alicevision_tpu import geometry as geo


def test_equirect_direction_roundtrip():
    W, H = 256, 128
    uv = jnp.stack(
        jnp.meshgrid(jnp.arange(8.0) * 30 + 5, jnp.arange(4.0) * 30 + 4, indexing="xy"),
        -1,
    ).reshape(-1, 2)
    d = pano.equirect_to_direction(uv, (W, H))
    uv2 = pano.direction_to_equirect(d, (W, H))
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_warp_identity_rotation_center():
    """A forward-looking pinhole view warps into the pano center region."""
    Hi, Wi = 64, 64
    img = jnp.asarray(np.random.RandomState(0).rand(Hi, Wi).astype(np.float32))
    K = jnp.asarray([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]])
    out, valid = pano.warp_to_equirect(img, K, jnp.eye(3), (256, 128))
    v = np.asarray(valid)
    # valid region is centered around (lon=0, lat=0) = pixel (128, 64)
    assert v[64, 128]
    assert not v[64, 5]  # behind / far off axis
    ys, xs = np.nonzero(v)
    assert abs(xs.mean() - 128) < 3 and abs(ys.mean() - 64) < 3


def test_warp_rotation_shifts_longitude():
    Hi, Wi = 64, 64
    img = jnp.ones((Hi, Wi), jnp.float32)
    K = jnp.asarray([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]])
    # camera rotated 90 deg about the vertical (y) axis
    R = geo.so3_exp(jnp.asarray([0.0, jnp.pi / 2, 0.0]))
    out, valid = pano.warp_to_equirect(img, K, R, (256, 128))
    ys, xs = np.nonzero(np.asarray(valid))
    # 90 deg shift = W/4 = 64 pixels from center 128
    assert abs(abs(xs.mean() - 128) - 64) < 4


def test_multiband_blend_smooth_seam():
    """Two half-canvas views with different constant values: the multi-band
    result transitions smoothly (no hard step at the seam)."""
    H, W = 64, 128
    img1 = jnp.full((H, W), 0.2)
    img2 = jnp.full((H, W), 0.8)
    m1 = jnp.zeros((H, W), bool).at[:, : W // 2 + 8].set(True)
    m2 = jnp.zeros((H, W), bool).at[:, W // 2 - 8 :].set(True)
    out = pano.composite_panorama(jnp.stack([img1, img2]), jnp.stack([m1, m2]))
    o = np.asarray(out)
    # endpoints keep their values
    assert abs(o[32, 4] - 0.2) < 0.05
    assert abs(o[32, -4] - 0.8) < 0.05
    # seam column is intermediate, and max column-to-column jump is small
    jumps = np.abs(np.diff(o[32, 4:-4]))
    assert jumps.max() < 0.12, jumps.max()


def test_composite_full_coverage_identity():
    H, W = 32, 64
    img = jnp.asarray(np.random.RandomState(1).rand(H, W).astype(np.float32))
    mask = jnp.ones((H, W), bool)
    out = pano.composite_panorama(img[None], mask[None], levels=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)
