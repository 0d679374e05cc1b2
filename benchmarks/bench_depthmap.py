import time
import numpy as np
import jax
import jax.numpy as jnp
from alicevision_tpu.mvs.plane_sweep import SgmParams, sgm_depth_map

H, W, D, T = 384, 512, 128, 4
rng = np.random.RandomState(0)
ref = jnp.asarray(rng.rand(H, W), jnp.float32)
ts = jnp.asarray(rng.rand(T, H, W), jnp.float32)
K = jnp.asarray([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]], jnp.float32)
Kt = jnp.broadcast_to(K, (T, 3, 3))
Rs, tsl = [], []
for i in range(T):
    ang = 0.02 * (i + 1)
    c, s = np.cos(ang), np.sin(ang)
    Rs.append(np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]]))
    tsl.append(np.array([-0.3 * (i + 1), 0.02 * i, 0.01]))
R_rel = jnp.asarray(np.stack(Rs), jnp.float32)
t_rel = jnp.asarray(np.stack(tsl), jnp.float32)

for method in ("auto", "gather"):
    p = SgmParams(n_depths=D, method=method)
    f = jax.jit(lambda r, t, p=p: sgm_depth_map(r, t, K, Kt, R_rel, t_rel, 2.0, 20.0, p))
    out = f(ref, ts); jax.block_until_ready(out)
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter(); out = f(ref + 1e-6 * i, ts); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"sgm_depth_map method={method}: {best*1e3:.0f} ms/view")
