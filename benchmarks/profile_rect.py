import time
import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.mvs.plane_sweep import SgmParams
from alicevision_tpu.mvs import rectified as R

H, W, D = 384, 512, 128
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(H, W), jnp.float32)
Wp = 2 * W
img_f = jnp.fft.rfft(jnp.pad(img, ((0, 0), (0, Wp - W))), axis=-1)
a = jnp.asarray(rng.rand(D) * 0.1 + 0.95, jnp.float32)
b = jnp.asarray(rng.rand(D, H) * 40, jnp.float32)

def timeit(f, *args, n=3, tag=""):
    out = f(*args); jax.block_until_ready(out)
    best = 1e9
    for i in range(n):
        t0 = time.perf_counter(); out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.2f} ms")

# full per-plane shift+scale for D planes (one tcam's worth = D/T of the pair work)
f1 = jax.jit(lambda imf: jax.vmap(lambda i: R._shift_scale_rows(imf, a[i], b[i], W))(jnp.arange(D)))
timeit(f1, img_f, tag=f"shift_scale_rows x{D}")

# irfft alone
def irfft_only(imf):
    k = jnp.arange(imf.shape[-1], dtype=jnp.float32)
    def one(i):
        phase = jnp.exp(2j*jnp.pi*k[None,:]*(b[i][:,None]/Wp))
        return jnp.fft.irfft(imf*phase, n=Wp, axis=-1)
    return jax.vmap(one)(jnp.arange(D))
timeit(jax.jit(irfft_only), img_f, tag=f"phase+irfft x{D}")

# matmul alone
sh = jnp.asarray(rng.rand(D, H, Wp), jnp.float32)
def mm_only(s):
    u_out = jnp.arange(W, dtype=jnp.float32)
    u_in = jnp.arange(Wp, dtype=jnp.float32)
    def one(i):
        src = a[i]*u_out
        M = jnp.maximum(0.0, 1.0 - jnp.abs(src[:,None]-u_in[None,:]))
        return s[i] @ M.T
    return jax.vmap(one)(jnp.arange(D))
timeit(jax.jit(mm_only), sh, tag=f"banded matmul x{D}")

# unrectify volume
vol = jnp.asarray(rng.rand(D, H, W), jnp.float32)
Hm = jnp.eye(3, dtype=jnp.float32) + 0.01*jnp.asarray(rng.rand(3,3), jnp.float32)
timeit(jax.jit(lambda v: R._unrectify_volume(v, Hm, (H, W), -1.0)), vol, tag="unrectify (D,H,W)")

# zncc for D slices
from alicevision_tpu.mvs.plane_sweep import zncc
refb = jnp.broadcast_to(img, (D, H, W))
warp = jnp.asarray(rng.rand(D, H, W), jnp.float32)
valid = warp > 0.1
timeit(jax.jit(lambda w: zncc(refb, w, valid, 2.0)), warp, tag=f"zncc x{D}")
