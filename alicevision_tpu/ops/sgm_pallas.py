"""Pallas TPU kernel for the SGM directional cost aggregation.

The SGM recurrence (one sweep direction) is
  L_s = C_s + min(L_{s-1}, L_{s-1}(d±1) + P1, min_d L_{s-1} + P2) - min_d L_{s-1}

On the XLA path (mvs/plane_sweep._directional_pass) every scan step
round-trips the (N, D) carry through HBM. This kernel keeps the carry in
VMEM for a whole (TILE_N, D) row band and loops the sweep axis inside the
kernel, so each cost slice is read once from HBM and the aggregated slice
written once — the minimum possible HBM traffic for the recurrence.

Layout: cost (S, N, D) with D padded to a multiple of 128 (lane dim) and
TILE_N a multiple of 8 (sublane dim). Grid = (N / TILE_N,); each program
owns a row band across the full sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 8
_BIG = 1e30


def _sgm_kernel_const(p1, cost_ref, p2_ref, out_ref, carry):
    S = cost_ref.shape[0]

    carry[...] = cost_ref[0]
    out_ref[0] = cost_ref[0]

    def body(s, _):
        L_prev = carry[...]
        C = cost_ref[s]
        P2 = p2_ref[s]  # (TILE_N, 1)
        m = jnp.min(L_prev, axis=-1, keepdims=True)
        up = jnp.concatenate([L_prev[:, :1], L_prev[:, :-1]], axis=1)
        dn = jnp.concatenate([L_prev[:, 1:], L_prev[:, -1:]], axis=1)
        best = jnp.minimum(
            jnp.minimum(L_prev, jnp.minimum(up, dn) + p1), m + P2
        )
        L = C + best - m
        carry[...] = L
        out_ref[s] = L
        return 0

    jax.lax.fori_loop(1, S, body, 0)


@functools.partial(jax.jit, static_argnames=("p1", "interpret"))
def sgm_directional_pass(
    cost: jnp.ndarray, p2: jnp.ndarray, p1: float, interpret: bool = False
):
    """Public entry: Pallas forward SGM sweep with p1 baked as a constant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, N, D = cost.shape
    pad_n = (-N) % TILE_N
    pad_d = (-D) % 128
    if pad_n or pad_d:
        cost = jnp.pad(cost, ((0, 0), (0, pad_n), (0, pad_d)), constant_values=_BIG)
        p2 = jnp.pad(p2, ((0, 0), (0, pad_n)))
    Np, Dp = cost.shape[1], cost.shape[2]

    kernel = functools.partial(_sgm_kernel_const, float(p1))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, Np, Dp), cost.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((S, TILE_N, Dp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # trailing singleton keeps the (sublane, lane) tiling legal
            pl.BlockSpec((S, TILE_N, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (S, TILE_N, Dp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((TILE_N, Dp), cost.dtype)],
        interpret=interpret,
    )(cost, p2[..., None])
    return out[:, :N, :D]
