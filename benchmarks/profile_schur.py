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
r, Jc, Jl = map(jax.block_until_ready, ba._residuals_and_jacobians(problem, q, c, X))
L, K = problem.obs_mask.shape
C = problem.cam_q.shape[0]
m = problem.obs_mask.astype(r.dtype)
N = 8

def amortized(body, init, tag):
    @jax.jit
    def run(init):
        def step(carry, _):
            return body(carry), None
        out, _ = jax.lax.scan(step, init, None, length=N)
        return out
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); out = run(init); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best/N*1e3:.2f} ms/it", flush=True)

oh3 = jax.nn.one_hot(problem.obs_cam, C, dtype=r.dtype) * m[..., None]
onehot = jax.block_until_ready(oh3.reshape(L*K, C))

def p1(rr):
    V = jnp.einsum("lkri,lkrj->lij", Jl, Jl)
    W = jnp.einsum("lkri,lkrj->lkij", Jc, Jl)
    g_l = -jnp.einsum("lkri,lkr->li", Jl, rr)
    return rr + 0*(V.sum()+W.sum()+g_l.sum())
amortized(p1, r, "V/W/g_l einsums")

def p2(rr):
    oh = jax.nn.one_hot(problem.obs_cam, C, dtype=rr.dtype) * m[..., None]
    return rr + 0*oh.sum()
amortized(p2, r, "one-hot build")

def p3(rr):
    Jc2 = Jc.reshape(L*K, 2, 6)
    JJ = jnp.einsum("ori,orj->oij", Jc2, Jc2).reshape(L*K, 36)
    U = jax.lax.dot_general(onehot, JJ, (((0,), (0,)), ((), ())), precision="highest")
    Jr = jnp.einsum("ori,or->oi", Jc2, rr.reshape(L*K, 2))
    g_c = jax.lax.dot_general(onehot, Jr, (((0,), (0,)), ((), ())), precision="highest")
    return rr + 0*(U.sum()+g_c.sum())
amortized(p3, r, "U/g_c one-hot matmuls (highest)")

def p3b(rr):
    Jc2 = Jc.reshape(L*K, 2, 6)
    JJ = jnp.einsum("ori,orj->oij", Jc2, Jc2).reshape(L*K, 36)
    U = jax.lax.dot_general(onehot, JJ, (((0,), (0,)), ((), ())))
    Jr = jnp.einsum("ori,or->oi", Jc2, rr.reshape(L*K, 2))
    g_c = jax.lax.dot_general(onehot, Jr, (((0,), (0,)), ((), ())))
    return rr + 0*(U.sum()+g_c.sum())
amortized(p3b, r, "U/g_c one-hot matmuls (default)")

W = jax.block_until_ready(jnp.einsum("lkri,lkrj->lkij", Jc, Jl))
Vh = jax.block_until_ready(ba._chol3(ba._sym3_inv(jnp.einsum("lkri,lkrj->lij", Jl, Jl) + 1e-2*jnp.eye(3))))
def p4(rr):
    Y = jnp.einsum("lkij,ljh->lkih", W, Vh)
    B = jnp.einsum("lkc,lkd->lcd", oh3, Y.reshape(L, K, 18), precision="highest")
    Bm = B.reshape(L, C, 6, 3).transpose(1, 2, 0, 3).reshape(C * 6, L * 3)
    S_off = jax.lax.dot_general(Bm, Bm, (((1,), (1,)), ((), ())), precision="highest")
    return rr + 0*S_off.sum()
amortized(p4, r, "Y/B/S_off")

def p5(rr):
    S = jnp.eye(600)*3.0 + rr[0,0,0]*0
    b = jnp.ones(600)
    dx = jax.scipy.linalg.solve(S, b, assume_a="pos")
    return rr + 0*dx.sum()
amortized(p5, r, "dense 600 solve")
