"""Micro-ablation of the windowed-gather chunk: gather vs scan vs ZNCC."""
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
    Wp = W + 256
    key = jax.random.PRNGKey(0)
    padded = jax.random.uniform(key, (H, Wp))
    disp0 = jax.random.uniform(key, (H, W)) * 192.0
    rows = (jnp.arange(H, dtype=jnp.int32) * Wp)[:, None]
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]

    for CH, J, label in ((64, 11, "dense64"), (31, 34, "coarse31"),
                         (21, 7, "fine21")):
        offs_c = (jnp.arange(CH, dtype=jnp.float32) - CH // 2) * 0.0005
        scale_k = (1.0 + offs_c)[:, None, None]

        def gather_only(padded, disp0):
            s0 = jnp.floor(jnp.minimum(
                disp0 * (1.0 + offs_c[0]), disp0 * (1.0 + offs_c[-1])
            )) - 1.0
            base = uu + 64.0 - s0
            idx0 = rows + base.astype(jnp.int32)
            jidx = jnp.arange(J, dtype=jnp.int32)[:, None, None]
            idx = jnp.clip(idx0[None] - jidx, 0, H * Wp - 1)
            return jnp.take(padded.reshape(-1), idx.reshape(-1)).reshape(J, H, W)

        g = jax.jit(gather_only)
        t_g = timeit(g, padded, disp0)
        wnd = g(padded, disp0)

        def scan_only(wnd, disp0):
            s0 = jnp.floor(jnp.minimum(
                disp0 * (1.0 + offs_c[0]), disp0 * (1.0 + offs_c[-1])
            )) - 1.0

            def body(acc, sj):
                jf, wj = sj
                p = disp0[None] * scale_k - s0[None]
                w = jnp.maximum(1.0 - jnp.abs(p - jf), 0.0)
                return acc + w * wj[None], None

            acc0 = jnp.zeros((CH, H, W), jnp.float32)
            warps, _ = jax.lax.scan(
                body, acc0, (jnp.arange(J, dtype=jnp.float32), wnd))
            return warps

        s = jax.jit(scan_only)
        t_s = timeit(s, wnd, disp0)
        warps = s(wnd, disp0)

        from alicevision_tpu.image.filtering import gaussian_blur_mm

        def zncc_only(warps, ref):
            w = (warps > 0.1).astype(jnp.float32)
            wz = warps * w
            stack = jnp.stack([w, wz, wz * warps, ref[None] * wz,
                               ref[None] * w])
            bl = gaussian_blur_mm(stack, 1.5)
            return bl[1] / bl[0].clip(1e-4)

        z = jax.jit(zncc_only)
        t_z = timeit(z, warps, padded[:, :W])
        print(f"{label}: gather={t_g*1e3:.1f}ms scan({J})={t_s*1e3:.1f}ms "
              f"zncc={t_z*1e3:.1f}ms")


if __name__ == "__main__":
    main()
