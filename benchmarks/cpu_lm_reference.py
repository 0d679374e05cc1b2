"""Reference-style CPU Schur-complement LM in vectorized numpy/BLAS.

This is the measured A/B denominator for the BA benchmark: the same
problem, the same math (analytic Jacobians, landmark elimination, dense
reduced camera system, Marquardt damping with accept/reject), executed the
way a tuned CPU implementation would run it — float64, BLAS-backed matmuls,
no JAX. It plays the role of the reference's Ceres DENSE_SCHUR solve
(ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231) so
`vs_baseline` is a measurement, not an estimate.

Pinhole-only (the benchmark problem carries no distortion).
"""

from __future__ import annotations

import time

import numpy as np


def _quat_to_mat(q):
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def _so3_exp(w):
    th = np.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
    k = w / th
    K = np.zeros(w.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    s = np.sin(th)[..., None]
    c = np.cos(th)[..., None]
    eye = np.broadcast_to(np.eye(3), K.shape)
    return eye + s * K + (1 - c) * (K @ K)


class CpuSchurLM:
    """Dense-Schur LM on the (L, K) bucketed observation table."""

    def __init__(self, R, c, X, obs_cam, obs_uv, obs_mask, f, pp,
                 cam_fixed=None, huber_px=4.0):
        self.R = np.asarray(R, np.float64)
        self.c = np.asarray(c, np.float64)
        self.X = np.asarray(X, np.float64)
        self.obs_cam = np.asarray(obs_cam)
        self.obs_uv = np.asarray(obs_uv, np.float64)
        self.m = np.asarray(obs_mask, bool)
        self.f = np.asarray(f, np.float64)  # (2,)
        self.pp = np.asarray(pp, np.float64)  # (2,)
        self.C = len(c)
        self.L, self.K = obs_cam.shape
        self.huber = huber_px
        self.cam_fixed = (
            np.zeros(self.C, bool) if cam_fixed is None else np.asarray(cam_fixed)
        )
        self.lam = 1e-4

        # Pre-built sparse aggregation operators (the observation graph is
        # static across LM iterations): scatter-summing per-observation /
        # per-camera-pair blocks through a CSR matmul measured 4x faster
        # than np.add.at and 4x than per-component bincounts.
        import scipy.sparse as sp

        C, L, K = self.C, self.L, self.K
        cam_f = self.obs_cam.reshape(-1)  # (L*K,)
        n = L * K
        self.P_cam = sp.csr_matrix(
            (np.ones(n), cam_f, np.arange(n + 1)), shape=(n, C)
        ).T.tocsr()  # (C, L*K)
        # scalar-level scatter for the Schur off-diagonal: entry
        # (l, ki, i, kj, j) of the native (L, K6, K6) block product lands at
        # S[ci*6+i, cj*6+j] — indexing matches the contiguous flatten, so
        # no 184 MB transpose copy is ever made
        ci = np.repeat(self.obs_cam, 6, axis=1)  # (L, K6) camera per row
        row6 = ci * 6 + np.tile(np.arange(6), K)[None, :]  # (L, K6)
        tgt = (
            row6[:, :, None] * (C * 6) + row6[:, None, :]
        ).reshape(-1)  # (L*K6*K6,)
        m2 = tgt.shape[0]
        self.P_scal = sp.csr_matrix(
            (np.ones(m2, np.float64), tgt, np.arange(m2 + 1)),
            shape=(m2, C * 6 * C * 6),
        ).T.tocsr()  # (C6*C6, L*K6*K6)

    def _residuals_jacobians(self, R_all, c_all, X):
        Rm = R_all[self.obs_cam]  # (L,K,3,3)
        cc = c_all[self.obs_cam]  # (L,K,3)
        u = np.matmul(Rm, (X[:, None] - cc)[..., None])[..., 0]
        z = np.where(np.abs(u[..., 2]) < 1e-9, 1e-9, u[..., 2])
        pix = self.f * u[..., :2] / z[..., None] + self.pp
        r = np.where(self.m[..., None], pix - self.obs_uv, 0.0)  # (L,K,2)

        fx, fy = self.f
        A = np.zeros(u.shape[:2] + (2, 3))
        A[..., 0, 0] = fx / z
        A[..., 0, 2] = -fx * u[..., 0] / (z * z)
        A[..., 1, 1] = fy / z
        A[..., 1, 2] = -fy * u[..., 1] / (z * z)

        ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
        skew = np.zeros(u.shape[:2] + (3, 3))
        skew[..., 0, 1], skew[..., 0, 2] = -uz, uy
        skew[..., 1, 0], skew[..., 1, 2] = uz, -ux
        skew[..., 2, 0], skew[..., 2, 1] = -uy, ux
        J_rot = -np.matmul(A, skew)  # d u/d rot = -[u]x
        AR = np.matmul(A, Rm)
        Jl = AR  # d u / d X = R
        Jc = np.concatenate([J_rot, -AR], axis=-1)  # (L,K,2,6)

        live = self.m & ~self.cam_fixed[self.obs_cam]
        Jc = np.where(live[..., None, None], Jc, 0.0)
        Jl = np.where(self.m[..., None, None], Jl, 0.0)
        return r, Jc, Jl

    def _cost(self, R_all, c_all, X):
        Rm = R_all[self.obs_cam]
        cc = c_all[self.obs_cam]
        u = np.einsum("lkij,lkj->lki", Rm, X[:, None] - cc)
        z = np.where(np.abs(u[..., 2]) < 1e-9, 1e-9, u[..., 2])
        pix = self.f * u[..., :2] / z[..., None] + self.pp
        n = np.linalg.norm(pix - self.obs_uv, axis=-1)
        rho = np.where(
            n <= self.huber, 0.5 * n * n, self.huber * (n - 0.5 * self.huber)
        )
        return float(np.sum(np.where(self.m, rho, 0.0)))

    def iterate(self):
        """One full LM iteration (linearize, eliminate, solve, accept)."""
        L, K, C = self.L, self.K, self.C
        r, Jc, Jl = self._residuals_jacobians(self.R, self.c, self.X)
        n = np.linalg.norm(r, axis=-1)
        w = np.where(n <= self.huber, 1.0, np.sqrt(self.huber / n.clip(1e-12)))
        w = np.where(self.m, w, 0.0)[..., None]
        r = r * w
        Jc = Jc * w[..., None]
        Jl = Jl * w[..., None]

        # block products as batched BLAS matmuls (2-3x c_einsum)
        JlT = Jl.transpose(0, 1, 3, 2)  # (L,K,3,2)
        JcT = Jc.transpose(0, 1, 3, 2)  # (L,K,6,2)
        V = np.matmul(
            Jl.reshape(L, K * 2, 3).transpose(0, 2, 1), Jl.reshape(L, K * 2, 3)
        )  # (L,3,3)
        W = np.matmul(JcT, Jl)  # (L,K,6,3)
        Ublk = np.matmul(JcT, Jc)  # (L,K,6,6)
        g_l = -np.matmul(
            Jl.reshape(L, K * 2, 3).transpose(0, 2, 1),
            r.reshape(L, K * 2, 1),
        )[..., 0]
        g_c_blk = -np.matmul(JcT, r[..., None])[..., 0]

        U = (self.P_cam @ Ublk.reshape(-1, 36)).reshape(C, 6, 6)
        g_c = self.P_cam @ g_c_blk.reshape(-1, 6)

        lam = self.lam
        V_d = V + lam * V * np.eye(3) + 1e-9 * np.eye(3)
        U_d = U + lam * U * np.eye(6) + 1e-9 * np.eye(6)
        Vi = np.linalg.inv(V_d)
        Y = np.matmul(W.reshape(L, K * 6, 3), Vi).reshape(L, K, 6, 3)

        # Reduced system S = blkdiag(U_d) - sum_l Y_l W_l^T, assembled from
        # per-landmark (K6, K6) block products — 69 MFLOP of batched dgemm
        # instead of a dense (C6, L3)(L3, C6) product (10.8 GFLOP of
        # mostly-zero work), then one CSR scatter onto camera pairs. This is
        # the same exploit-the-sparsity structure as Ceres SPARSE_SCHUR
        # (ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231).
        Yr = Y.reshape(L, K * 6, 3)
        Wr = W.reshape(L, K * 6, 3)
        Sl = np.matmul(Yr, Wr.transpose(0, 2, 1))  # (L, K6, K6)
        S = (-(self.P_scal @ Sl.reshape(-1))).reshape(C * 6, C * 6)
        D = np.arange(C)
        S.reshape(C, 6, C, 6)[D, :, D, :] += U_d

        b = g_c - self._accum(
            np.matmul(Yr, g_l[:, :, None]).reshape(L, K, 6)
        )
        import scipy.linalg as sla

        try:
            cho = sla.cho_factor(
                S + 1e-10 * np.eye(C * 6), lower=True, check_finite=False
            )
            dx_cam = sla.cho_solve(cho, b.reshape(-1), check_finite=False)
        except np.linalg.LinAlgError:
            dx_cam = np.linalg.solve(S + 1e-10 * np.eye(C * 6), b.reshape(-1))
        dx_cam = dx_cam.reshape(C, 6)

        t = np.matmul(
            Wr.transpose(0, 2, 1),
            dx_cam[self.obs_cam].reshape(L, K * 6, 1),
        )[..., 0]  # (L, 3)
        dx_pt = np.matmul(Vi, (g_l - t)[..., None])[..., 0]

        dR = _so3_exp(dx_cam[:, :3])
        R_new = dR @ self.R
        c_new = self.c + dx_cam[:, 3:]
        X_new = self.X + dx_pt
        new_cost = self._cost(R_new, c_new, X_new)
        old_cost = self._cost(self.R, self.c, self.X)
        if np.isfinite(new_cost) and new_cost < old_cost:
            self.R, self.c, self.X = R_new, c_new, X_new
            self.lam = max(self.lam * 0.25, 1e-12)
        else:
            self.lam = min(self.lam * 4.0, 1e8)
        return new_cost

    def _accum(self, blk):
        return self.P_cam @ blk.reshape(-1, 6)


def measure_iters_per_s(problem, n_iters: int = 4) -> float:
    """Time n_iters full LM iterations of the numpy solver on a BAProblem."""
    intr = problem.intr
    f = np.atleast_2d(np.asarray(intr.scale))[0]
    # principal point = offset + size/2 (camera/IntrinsicScaleOffset.hpp:44-51)
    pp = (
        np.atleast_2d(np.asarray(intr.offset))[0]
        + 0.5 * np.atleast_2d(np.asarray(intr.size))[0]
    )
    R = _quat_to_mat(np.asarray(problem.cam_q, np.float64))
    lm = CpuSchurLM(
        R,
        np.asarray(problem.cam_c),
        np.asarray(problem.points),
        np.asarray(problem.obs_cam),
        np.asarray(problem.obs_uv),
        np.asarray(problem.obs_mask),
        f,
        pp,
        cam_fixed=np.asarray(problem.cam_fixed),
    )
    lm.iterate()  # warm numpy buffers + BLAS threads
    lm.iterate()
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            lm.iterate()
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return 1.0 / best


def measure_xla_cpu_iters_per_s(problem, n_iters: int = 5) -> float:
    """The SAME ba.ba_solve program compiled by XLA for the host CPU —
    the same-math A/B denominator (what the TPU number is divided by is
    then purely the chip, not the algorithm)."""
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.sfm import ba

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        p = jax.device_put(problem, cpu)
        solve = jax.jit(
            lambda pp_: ba.ba_solve(
                pp_, max_iters=n_iters, rtol=0.0, solver="dense",
                loop="unrolled",
            )
        )
        res = solve(p)
        float(np.asarray(res.cost_final))  # compile + warm
        best = np.inf
        for i in range(2):
            p_i = p._replace(points=p.points + jnp.float32(i + 1) * 1e-7)
            t0 = time.perf_counter()
            r = solve(p_i)
            float(np.asarray(r.cost_final))
            best = min(best, time.perf_counter() - t0)
    done = int(res.n_iters) or n_iters
    return done / best
