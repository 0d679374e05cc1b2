import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from bench import make_problem
from alicevision_tpu.sfm import ba

problem = make_problem()
print("L,K =", problem.obs_mask.shape, "C =", problem.cam_q.shape[0])

def timeit(f, *a, n=5, tag=""):
    out = f(*a); jax.block_until_ready(out)
    best = 1e9
    for i in range(n):
        t0 = time.perf_counter(); out = f(*a); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.2f} ms")
    return out

q, c, X = problem.cam_q, problem.cam_c, problem.points
lam = jnp.float32(1e-4)

rj = jax.jit(lambda q, c, X: ba._residuals_and_jacobians(problem, q, c, X))
r, Jc, Jl = timeit(rj, q, c, X, tag="residuals+jacobians")

res = jax.jit(lambda q, c, X: ba._residuals(problem, q, c, X))
timeit(res, q, c, X, tag="residuals only (cost path)")

cost = jax.jit(lambda q, c, X: ba._cost(problem, q, c, X, jnp.float32(4.0)))
timeit(cost, q, c, X, tag="cost")

ss = jax.jit(lambda r, Jc, Jl: ba._schur_solve(problem, r, Jc, Jl, lam))
timeit(ss, r, Jc, Jl, tag="schur_solve")

# schur pieces
def pieces(r, Jc, Jl):
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    m = problem.obs_mask.astype(r.dtype)
    V = jnp.einsum("lkri,lkrj->lij", Jl, Jl)
    W = jnp.einsum("lkri,lkrj->lkij", Jc, Jl)
    V_d = V + 1e-9 * jnp.eye(3)
    V_inv = jnp.linalg.inv(V_d)
    Vh = jnp.linalg.cholesky(V_inv + 3e-2*jnp.eye(3))
    return V_inv, Vh
timeit(jax.jit(pieces), r, Jc, Jl, tag="V inv+chol (10k 3x3 batched)")

def onehot_part(r, Jc):
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    m = problem.obs_mask.astype(r.dtype)
    oh3 = jax.nn.one_hot(problem.obs_cam, C, dtype=r.dtype) * m[..., None]
    onehot = oh3.reshape(L*K, C)
    Jc2 = Jc.reshape(L*K, 2, 6)
    JJ = jnp.einsum("ori,orj->oij", Jc2, Jc2).reshape(L*K, 36)
    U = jax.lax.dot_general(onehot, JJ, (((0,), (0,)), ((), ())), precision="highest")
    return U
timeit(jax.jit(onehot_part), r, Jc, tag="one-hot U assembly")

# one full LM body iteration
def one_iter(q, c, X, lam):
    r, Jc, Jl = ba._residuals_and_jacobians(problem, q, c, X)
    w = ba._huber_weights(r, jnp.float32(4.0)) * problem.obs_mask
    rw = r * w[..., None]
    Jcw = Jc * w[..., None, None]
    Jlw = Jl * w[..., None, None]
    dx_cam, dx_pt = ba._schur_solve(problem, rw, Jcw, Jlw, lam)
    newc = ba._cost(problem, q, c + dx_cam[:, 3:6], X + dx_pt, jnp.float32(4.0))
    return dx_cam, dx_pt, newc
timeit(jax.jit(one_iter), q, c, X, lam, tag="one full LM iteration")
