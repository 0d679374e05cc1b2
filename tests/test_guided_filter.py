"""Guided filter / cost-volume filtering (the TPU analog of the CUDA
gammaC adaptive-support weighting, ref: depthMap/cuda/device/Patch.cuh)."""

import numpy as np
import jax.numpy as jnp

from alicevision_tpu.ops.guided_filter import box_filter, guided_filter, filter_cost_volume


def test_box_filter_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.rand(17, 23).astype(np.float32)
    r = 3
    ref = np.zeros_like(x)
    H, W = x.shape
    for i in range(H):
        for j in range(W):
            i0, i1 = max(0, i - r), min(H, i + r + 1)
            j0, j1 = max(0, j - r), min(W, j + r + 1)
            ref[i, j] = x[i0:i1, j0:j1].mean()
    got = np.asarray(box_filter(jnp.asarray(x), r))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_guided_filter_smooths_but_keeps_edges():
    rng = np.random.RandomState(1)
    H, W = 48, 64
    guide = np.zeros((H, W), np.float32)
    guide[:, W // 2 :] = 1.0  # hard vertical edge
    signal = guide * 2.0 - 1.0 + rng.randn(H, W).astype(np.float32) * 0.3
    out = np.asarray(guided_filter(jnp.asarray(guide), jnp.asarray(signal), 6, 1e-4))
    # noise suppressed away from the edge
    assert out[:, : W // 2 - 8].std() < signal[:, : W // 2 - 8].std() * 0.5
    # the edge survives (filtered means on each side stay separated)
    assert out[:, W // 2 + 4 :].mean() - out[:, : W // 2 - 4].mean() > 1.5


def test_cost_volume_filtering_improves_noisy_argmin():
    rng = np.random.RandomState(2)
    D, H, W = 16, 40, 56
    guide = np.zeros((H, W), np.float32)
    guide[:, W // 2 :] = 1.0
    d_gt = np.where(guide > 0.5, 11, 4)
    vol = rng.rand(D, H, W).astype(np.float32) * 2.5  # heavy noise
    for d in range(D):
        vol[d] += (d != d_gt) * 1.0  # true depth has lowest expected cost
    noisy_acc = (np.argmin(vol, 0) == d_gt).mean()
    filt = np.asarray(filter_cost_volume(jnp.asarray(guide), jnp.asarray(vol), 7, 1e-3))
    filt_acc = (np.argmin(filt, 0) == d_gt).mean()
    assert filt_acc > 0.97
    assert filt_acc > noisy_acc + 0.2
