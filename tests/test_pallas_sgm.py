"""Pallas SGM kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.mvs.plane_sweep import _directional_pass
from alicevision_tpu.ops.sgm_pallas import sgm_directional_pass


def test_pallas_matches_scan_reference():
    rng = np.random.RandomState(0)
    S, N, D = 12, 16, 128
    cost = jnp.asarray(rng.rand(S, N, D).astype(np.float32) * 100)
    p2 = jnp.asarray(rng.rand(S, N).astype(np.float32) * 50 + 10)
    ref = _directional_pass(cost, p2, 10.0)
    out = sgm_directional_pass(cost, p2, 10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_pallas_handles_padding():
    """Odd N and D exercise the pad/crop path."""
    rng = np.random.RandomState(1)
    S, N, D = 7, 13, 100
    cost = jnp.asarray(rng.rand(S, N, D).astype(np.float32) * 100)
    p2 = jnp.asarray(rng.rand(S, N).astype(np.float32) * 50 + 10)
    ref = _directional_pass(cost, p2, 10.0)
    out = sgm_directional_pass(cost, p2, 10.0, interpret=True)
    assert out.shape == (S, N, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
