"""Normal maps from depth (ref: depthMap/NormalMapEstimator.hpp:22,
deviceDepthSimilarityMapKernels.cuh:394 depthSimMapComputeNormal_kernel)."""

import numpy as np
import jax.numpy as jnp

from alicevision_tpu.mvs.normals import normal_map_from_depth, backproject_depth


def _K(f=200.0, w=64, h=48):
    return jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]], jnp.float32)


def test_frontal_plane_normals():
    H, W = 48, 64
    depth = jnp.full((H, W), 5.0, jnp.float32)
    n = np.asarray(normal_map_from_depth(depth, _K()))
    inner = n[8:-8, 8:-8]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)
    np.testing.assert_allclose(inner[..., :2], 0.0, atol=2e-3)


def test_slanted_plane_normals():
    H, W = 48, 64
    K = _K()
    # plane z = 5 + 0.5 x  (x the camera-frame coordinate): n ~ (0.5, 0, -1)
    fx = float(K[0, 0]); cx = float(K[0, 2])
    us = (np.arange(W) - cx) / fx
    # depth solves z = 5 + 0.5 * (u z)  ->  z = 5 / (1 - 0.5 u)
    z = 5.0 / (1.0 - 0.5 * us)
    depth = jnp.asarray(np.tile(z, (H, 1)), jnp.float32)
    n = np.asarray(normal_map_from_depth(depth, K))
    inner = n[10:-10, 10:-10]
    expect = np.array([0.5, 0.0, -1.0]) / np.linalg.norm([0.5, 0.0, -1.0])
    med = np.median(inner.reshape(-1, 3), axis=0)
    np.testing.assert_allclose(med, expect, atol=0.02)


def test_depth_edge_gate_and_invalid():
    H, W = 40, 60
    depth = np.full((H, W), 4.0, np.float32)
    depth[:, W // 2 :] = 8.0  # depth discontinuity
    depth[:3, :3] = 0.0  # invalid corner
    n = np.asarray(normal_map_from_depth(jnp.asarray(depth), _K(w=W, h=H)))
    assert (n[0, 0] == -1).all()  # invalid marker
    # normals near (but not across) the jump stay frontal: the gate keeps
    # the plane fit from mixing the two surfaces
    near = n[10:-10, W // 2 + 2 : W // 2 + 6]
    np.testing.assert_allclose(near[..., 2], -1.0, atol=5e-2)
