"""Scan-unroll ablation for the refine warp accumulation.

Variants at the dense chunk point (CH=64, S=193, J=11):
  A. original global scan (S steps, CH carry), unroll 1/8/16
  B. window extraction scan (S steps, J carry), unroll 1/8/16
  C. hat-sum over the window (J steps, CH carry), scan-unrolled vs python
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


H, W = 544, 960
pad_l, pad_r = 192, 64
Wp = W + pad_l + pad_r
s_min, s_max = 0, 192
S = s_max - s_min + 1
CH, J = 64, 11
key = jax.random.PRNGKey(0)
padded = jax.random.uniform(key, (H, Wp))
disp0 = jax.random.uniform(key, (H, W)) * 185.0 + 3.0
offs_c = (jnp.arange(CH, dtype=jnp.float32) - CH // 2) * 0.0005
scale_k = (1.0 + offs_c)[:, None, None]
uu = jnp.arange(W, dtype=jnp.float32)[None, :]


def orig_scan(padded, disp0, unroll):
    def body(acc, s):
        sl = jax.lax.dynamic_slice_in_dim(padded, pad_l - s, W, axis=1)
        sf = s.astype(jnp.float32)
        dk = disp0[None] * scale_k
        dk_i = jnp.floor(dk)
        w = jnp.where(dk_i == sf, 1.0 - (dk - dk_i), 0.0) + jnp.where(
            dk_i == sf - 1.0, dk - dk_i, 0.0)
        return acc + w * sl[None], None

    acc0 = jnp.zeros((CH, H, W), jnp.float32)
    warps, _ = jax.lax.scan(
        body, acc0, jnp.arange(s_min, s_max + 1, dtype=jnp.int32),
        unroll=unroll)
    return warps


def window_then_hat(padded, disp0, unroll, hat_unroll):
    s0 = jnp.floor(jnp.minimum(
        disp0 * (1.0 + offs_c[0]), disp0 * (1.0 + offs_c[-1]))) - 1.0
    jjf = jnp.arange(J, dtype=jnp.float32)[:, None, None]

    def ext(acc, s):
        sl = jax.lax.dynamic_slice_in_dim(padded, pad_l - s, W, axis=1)
        sf = s.astype(jnp.float32)
        m = s0[None] == sf - jjf
        return acc + jnp.where(m, sl[None], 0.0), None

    wnd0 = jnp.zeros((J, H, W), jnp.float32)
    wnd, _ = jax.lax.scan(
        ext, wnd0, jnp.arange(s_min, s_max + 1, dtype=jnp.int32),
        unroll=unroll)

    p = disp0[None] * scale_k - s0[None]
    if hat_unroll == "python":
        warps = jnp.zeros((CH, H, W), jnp.float32)
        for j in range(J):
            w = jnp.maximum(1.0 - jnp.abs(p - j), 0.0)
            warps = warps + w * wnd[j][None]
        return warps

    def hat(acc, jw):
        jf, wj = jw
        w = jnp.maximum(1.0 - jnp.abs(p - jf), 0.0)
        return acc + w * wj[None], None

    acc0 = jnp.zeros((CH, H, W), jnp.float32)
    warps, _ = jax.lax.scan(
        hat, acc0, (jnp.arange(J, dtype=jnp.float32), wnd), unroll=J)
    return warps


ref = None
for unroll in (1, 8, 16):
    f = jax.jit(lambda p_, d_, u=unroll: orig_scan(p_, d_, u))
    t = timeit(f, padded, disp0)
    if ref is None:
        ref = f(padded, disp0)
    print(f"orig unroll={unroll}: {t*1e3:.1f}ms")

for unroll in (8, 16):
    for hu in ("scan", "python"):
        f = jax.jit(lambda p_, d_, u=unroll, h=hu: window_then_hat(
            p_, d_, u, h))
        t = timeit(f, padded, disp0)
        err = float(jnp.abs(f(padded, disp0) - ref).max())
        print(f"window unroll={unroll} hat={hu}: {t*1e3:.1f}ms maxerr={err:.2e}")
