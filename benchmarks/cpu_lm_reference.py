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

    def _residuals_jacobians(self, R_all, c_all, X):
        Rm = R_all[self.obs_cam]  # (L,K,3,3)
        cc = c_all[self.obs_cam]  # (L,K,3)
        u = np.einsum("lkij,lkj->lki", Rm, X[:, None] - cc)
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
        J_rot = -np.einsum("lkri,lkij->lkrj", A, skew)  # d u/d rot = -[u]x
        AR = np.einsum("lkri,lkij->lkrj", A, Rm)
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

        V = np.einsum("lkri,lkrj->lij", Jl, Jl)
        W = np.einsum("lkri,lkrj->lkij", Jc, Jl)  # (L,K,6,3)
        Ublk = np.einsum("lkri,lkrj->lkij", Jc, Jc)  # (L,K,6,6)
        g_l = -np.einsum("lkri,lkr->li", Jl, r)
        g_c_blk = -np.einsum("lkri,lkr->lki", Jc, r)

        cam_f = self.obs_cam.reshape(-1)
        U = np.zeros((C, 6, 6))
        np.add.at(U, cam_f, Ublk.reshape(-1, 6, 6))
        g_c = np.zeros((C, 6))
        np.add.at(g_c, cam_f, g_c_blk.reshape(-1, 6))

        lam = self.lam
        V_d = V + lam * V * np.eye(3) + 1e-9 * np.eye(3)
        U_d = U + lam * U * np.eye(6) + 1e-9 * np.eye(6)
        Vi = np.linalg.inv(V_d)
        Y = np.einsum("lkij,ljh->lkih", W, Vi)  # (L,K,6,3)

        # reduced system S = U_d - sum_l W_l Vi W_l^T (scattered to pairs)
        B = np.zeros((C, 6, L, 3))
        l_idx = np.repeat(np.arange(L), K)
        np.add.at(B, (cam_f, slice(None), l_idx), Y.reshape(-1, 6, 3))
        Bm = B.reshape(C * 6, L * 3)
        Wm = np.zeros((C, 6, L, 3))
        np.add.at(Wm, (cam_f, slice(None), l_idx), W.reshape(-1, 6, 3))
        S = -Bm @ Wm.reshape(C * 6, L * 3).T
        D = np.zeros((C, 6, C, 6))
        D[np.arange(C), :, np.arange(C), :] = U_d
        S += D.reshape(C * 6, C * 6)

        b = g_c - self._accum(np.einsum("lkih,lh->lki", Y, g_l))
        dx_cam = np.linalg.solve(S + 1e-10 * np.eye(C * 6), b.reshape(-1)).reshape(C, 6)

        t = np.einsum("lkij,lki->lj", W, dx_cam[self.obs_cam])
        dx_pt = np.einsum("lij,lj->li", Vi, g_l - t)

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
        out = np.zeros((self.C, 6))
        np.add.at(out, self.obs_cam.reshape(-1), blk.reshape(-1, 6))
        return out


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
    lm.iterate()  # warm numpy buffers
    t0 = time.perf_counter()
    for _ in range(n_iters):
        lm.iterate()
    dt = time.perf_counter() - t0
    return n_iters / dt
