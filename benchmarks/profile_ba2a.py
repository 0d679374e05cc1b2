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
N = 8

def amortized(make_body, init, tag):
    @jax.jit
    def run(init):
        def step(carry, _):
            return make_body(carry), None
        out, _ = jax.lax.scan(step, init, None, length=N)
        return out
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); out = run(init); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best/N*1e3:.2f} ms/it", flush=True)
    return out

which = sys.argv[1]
if which == "a":
    amortized(lambda qq: qq + 0 * ba._cost(problem, qq, c, X, jnp.float32(4.0)), q, "cost(resid)")
    def rj_body(qq):
        r, Jc, Jl = ba._residuals_and_jacobians(problem, qq, c, X)
        return qq + 0 * r.sum() + 0 * Jc.sum() + 0 * Jl.sum()
    amortized(rj_body, q, "residuals+jacobians")
elif which == "b":
    r, Jc, Jl = ba._residuals_and_jacobians(problem, q, c, X)
    r, Jc, Jl = map(jax.block_until_ready, (r, Jc, Jl))
    def ss_body(rr):
        dx_cam, dx_pt = ba._schur_solve(problem, rr, Jc, Jl, lam)
        return rr + 0 * dx_cam.sum() * dx_pt.sum()
    amortized(ss_body, r, "schur_solve")
elif which == "c":
    r, Jc, Jl = ba._residuals_and_jacobians(problem, q, c, X)
    r, Jc, Jl = map(jax.block_until_ready, (r, Jc, Jl))
    def vinv_body(rr):
        V = jnp.einsum("lkri,lkrj->lij", Jl, Jl)
        V_d = V + 1e-2 * jnp.eye(3)
        V_inv = jnp.linalg.inv(V_d)
        Vh = jnp.linalg.cholesky(V_inv + 1e-3 * jnp.eye(3))
        return rr + 0 * Vh.sum()
    amortized(vinv_body, r, "V + inv + chol")
