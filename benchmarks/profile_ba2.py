import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from bench import make_problem
from alicevision_tpu.sfm import ba

problem = make_problem()
q, c, X = problem.cam_q, problem.cam_c, problem.points
lam = jnp.float32(1e-4)
N = 10

def amortized(make_body, init, tag):
    @jax.jit
    def run(init):
        def step(carry, _):
            return make_body(carry), None
        out, _ = jax.lax.scan(step, init, None, length=N)
        return out
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = run(init); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best/N*1e3:.2f} ms/it")
    return out

# trivial call overhead
f0 = jax.jit(lambda x: x + 1.0)
x = jnp.zeros(8); f0(x); jax.block_until_ready(f0(x))
t0 = time.perf_counter()
for _ in range(10): jax.block_until_ready(f0(x))
print(f"dispatch overhead: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call")

amortized(lambda qq: ba._residuals(problem, qq, c, X) [..., :4].sum() * 0 + qq,
          q, "residuals")
amortized(lambda qq: qq + 0 * ba._cost(problem, qq, c, X, jnp.float32(4.0)),
          q, "cost")

def rj_body(qq):
    r, Jc, Jl = ba._residuals_and_jacobians(problem, qq, c, X)
    return qq + 0 * r.sum() + 0 * Jc.sum() + 0 * Jl.sum()
amortized(rj_body, q, "residuals+jacobians")

r, Jc, Jl = ba._residuals_and_jacobians(problem, q, c, X)
r, Jc, Jl = map(jax.block_until_ready, (r, Jc, Jl))

def ss_body(rr):
    dx_cam, dx_pt = ba._schur_solve(problem, rr, Jc, Jl, lam)
    return rr + 0 * dx_cam.sum() * dx_pt.sum()
amortized(ss_body, r, "schur_solve")

def vinv_body(rr):
    V = jnp.einsum("lkri,lkrj->lij", Jl, Jl)
    V_d = V + 1e-2 * jnp.eye(3)
    V_inv = jnp.linalg.inv(V_d)
    Vh = jnp.linalg.cholesky(V_inv + 1e-3 * jnp.eye(3))
    return rr + 0 * Vh.sum()
amortized(vinv_body, r, "V + inv + chol")

def bigmm_body(rr):
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    Bm = jnp.broadcast_to(rr[:, :1, :1], (10000, 8, 18)).reshape(10000, 144)[:, :144]
    Bm2 = Bm.reshape(-1, 600).T if False else jnp.zeros((600, 30000), rr.dtype) + rr[0,0,0]
    S = jax.lax.dot_general(Bm2, Bm2, (((1,), (1,)), ((), ())), precision="highest")
    return rr + 0 * S.sum()
amortized(bigmm_body, r, "S_off matmul 600x30000")

def solve_body(rr):
    S = jnp.eye(600) * 2.0 + rr[0, 0, 0] * 0
    b = jnp.ones(600)
    dx = jax.scipy.linalg.solve(S, b, assume_a="pos")
    return rr + 0 * dx.sum()
amortized(solve_body, r, "dense solve 600")
