"""Window-extraction variants: one big take vs per-plane takes vs
global-scan accumulation."""
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


def main():
    H, W = 544, 960
    pad_l, pad_r = 192, 64
    Wp = W + pad_l + pad_r
    s_min, s_max = 0, 192
    key = jax.random.PRNGKey(0)
    padded = jax.random.uniform(key, (H, Wp))
    disp0 = jax.random.uniform(key, (H, W)) * 192.0
    rows = (jnp.arange(H, dtype=jnp.int32) * Wp)[:, None]
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]

    for J in (11, 34):
        def mk_idx(disp0):
            s0 = jnp.floor(disp0 * 0.97) - 1.0
            base = uu + jnp.float32(pad_l) - s0
            return rows + base.astype(jnp.int32)

        def big_take(padded, disp0):
            idx0 = mk_idx(disp0)
            jidx = jnp.arange(J, dtype=jnp.int32)[:, None, None]
            idx = jnp.clip(idx0[None] - jidx, 0, H * Wp - 1)
            return jnp.take(padded.reshape(-1), idx.reshape(-1)).reshape(
                J, H, W)

        def per_plane(padded, disp0):
            idx0 = mk_idx(disp0)
            flat = padded.reshape(-1)
            planes = [jnp.take(flat, jnp.clip(idx0 - j, 0, H * Wp - 1))
                      for j in range(J)]
            return jnp.stack(planes)

        def scan_extract(padded, disp0):
            s0 = jnp.floor(disp0 * 0.97) - 1.0
            jj = jnp.arange(J, dtype=jnp.float32)[:, None, None]

            def body(acc, s):
                sl = jax.lax.dynamic_slice_in_dim(
                    padded, pad_l - s, W, axis=1)
                sf = s.astype(jnp.float32)
                m = (s0[None] == sf - jj)
                return acc + jnp.where(m, sl[None], 0.0), None

            acc0 = jnp.zeros((J, H, W), jnp.float32)
            out, _ = jax.lax.scan(
                body, acc0, jnp.arange(s_min, s_max + 1, dtype=jnp.int32))
            return out

        for name, f in (("big_take", big_take), ("per_plane", per_plane),
                        ("scan_extract", scan_extract)):
            g = jax.jit(f)
            t = timeit(g, padded, disp0)
            print(f"J={J} {name}: {t*1e3:.1f}ms")
        a = jax.jit(big_take)(padded, disp0)
        b = jax.jit(per_plane)(padded, disp0)
        c = jax.jit(scan_extract)(padded, disp0)
        print("  parity big-vs-plane", float(jnp.abs(a - b).max()),
              "big-vs-scan", float(jnp.abs(a - c).max()))


if __name__ == "__main__":
    main()
