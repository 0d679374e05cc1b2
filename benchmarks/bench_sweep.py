"""A/B: tensorized gather sweep vs rectified gather-free sweep on real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.mvs.plane_sweep import (
    SgmParams, similarity_volume, inverse_depth_planes, sgm_aggregate, retrieve_best_depth,
)
from alicevision_tpu.mvs.rectified import similarity_volume_rectified, rectification_ok

H, W, D, T = 384, 512, 128, 4
params = SgmParams(n_depths=D, depth_chunk=8)

rng = np.random.RandomState(0)
ref = jnp.asarray(rng.rand(H, W), jnp.float32)
ts = jnp.asarray(rng.rand(T, H, W), jnp.float32)
K = jnp.asarray([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]], jnp.float32)
Kt = jnp.broadcast_to(K, (T, 3, 3))
# sideways baselines (rectification-friendly, the common MVS geometry)
Rs, tsl = [], []
for i in range(T):
    ang = 0.02 * (i + 1)
    c, s = np.cos(ang), np.sin(ang)
    Rs.append(np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]]))
    tsl.append(np.array([-0.3 * (i + 1), 0.02 * i, 0.01]))
R_rel = jnp.asarray(np.stack(Rs), jnp.float32)
t_rel = jnp.asarray(np.stack(tsl), jnp.float32)
print("rect ok:", [rectification_ok(np.array(R_rel[i]), np.array(t_rel[i])) for i in range(T)])
depths = inverse_depth_planes(2.0, 20.0, D)

def timeit(f, *a, n=3, tag=""):
    out = f(*a); jax.block_until_ready(out)
    best = 1e9
    for i in range(n):
        # perturb to defeat memoization
        a2 = (a[0] + 1e-6 * (i + 1),) + a[1:]
        t0 = time.perf_counter(); out = f(*a2); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.1f} ms")
    return out

f_gather = jax.jit(lambda r, t: similarity_volume(r, t, K, Kt, R_rel, t_rel, depths, params))
f_rect = jax.jit(lambda r, t: similarity_volume_rectified(r, t, K, Kt, R_rel, t_rel, depths, params))
c1 = timeit(f_gather, ref, ts, tag="gather similarity")
c2 = timeit(f_rect, ref, ts, tag="rectified similarity")

f_agg = jax.jit(lambda c: retrieve_best_depth(sgm_aggregate(c, ref, params), depths))
timeit(f_agg, c1, tag="sgm aggregate+best")

d1, s1 = jax.jit(lambda c: retrieve_best_depth(sgm_aggregate(c, ref, params), depths))(c1)
d2, s2 = jax.jit(lambda c: retrieve_best_depth(sgm_aggregate(c, ref, params), depths))(c2)
print("cost corr:", np.corrcoef(np.array(c1).ravel(), np.array(c2).ravel())[0,1])
m = (np.array(d1) > 0) & (np.array(d2) > 0)
print("depth agree frac(|dz|<1 plane):", float(np.mean(np.abs(np.array(d1)[m]-np.array(d2)[m]) < (depths[1]-depths[0])*4)))
