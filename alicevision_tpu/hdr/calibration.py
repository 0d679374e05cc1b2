"""HDR response-curve calibration: Debevec and Laguerre models.

TPU-native counterpart of the reference's HDR calibration stack
(ref: src/aliceVision/hdr/DebevecCalibrate.cpp — classic gsolve linear
system; LaguerreBACalibration.cpp — parametric Laguerre curve fit with
Ceres, here a Gauss-Newton on the bracket-consistency residuals;
sampling.cpp — stable pixel sample selection). The Grossberg/EMoR PCA
variant is intentionally replaced by the Laguerre parameterization: EMoR
needs the embedded response dataset, while Laguerre is a 1-parameter
closed-form family with equivalent practical coverage.

All solvers are dense linear algebra / fixed-iteration GN — jit-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def weight_triangle(z: jnp.ndarray) -> jnp.ndarray:
    """Hat weighting over [0, 1] (Debevec's w)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(2.0 * z - 1.0))


def weight_gaussian(z: jnp.ndarray, sigma: float = 0.25) -> jnp.ndarray:
    return jnp.exp(-((z - 0.5) ** 2) / (2 * sigma * sigma))


def sample_bracket_pixels(
    images: np.ndarray, n_samples: int = 1000, seed: int = 0
) -> np.ndarray:
    """Select sample pixel indices with good value coverage.

    images: (B, H, W) single channel. Returns flat indices (n_samples,).
    Mirrors hdr/sampling.cpp's intent: prefer pixels spanning the range and
    not saturated in every bracket.
    """
    B = images.shape[0]
    flat = images.reshape(B, -1)
    usable = ((flat > 0.02) & (flat < 0.98)).sum(0) >= max(1, B // 2)
    idx = np.nonzero(usable)[0]
    if len(idx) == 0:
        idx = np.arange(flat.shape[1])
    rng = np.random.RandomState(seed)
    # stratify by mid-bracket intensity
    mid = flat[B // 2, idx]
    order = np.argsort(mid)
    take = np.linspace(0, len(idx) - 1, min(n_samples, len(idx))).astype(int)
    return idx[order[take]]


class DebevecResponse(NamedTuple):
    g: jnp.ndarray  # (256,) log-exposure response: g[z] = ln E + ln dt


def debevec_calibrate(
    samples: jnp.ndarray,  # (B, N) pixel values in [0, 1] across B brackets
    exposures: jnp.ndarray,  # (B,) exposure times
    lambda_smooth: float = 20.0,
    n_levels: int = 256,
) -> DebevecResponse:
    """Solve for g and log radiances (gsolve of [Debevec97],
    DebevecCalibrate.cpp). Dense least squares: unknowns [g(0..255), lnE_i].
    """
    B, N = samples.shape
    z = jnp.clip((samples * (n_levels - 1)).astype(jnp.int32), 0, n_levels - 1)
    w = weight_triangle(samples) + 1e-4

    n_unk = n_levels + N
    n_eq = B * N + n_levels - 2 + 1
    A = jnp.zeros((n_eq, n_unk))
    b = jnp.zeros((n_eq,))

    rows = jnp.arange(B * N)
    zf = z.reshape(-1)
    wf = w.reshape(-1)
    if_ = jnp.tile(jnp.arange(N), B)
    lt = jnp.repeat(jnp.log(exposures), N)
    A = A.at[rows, zf].add(wf)
    A = A.at[rows, n_levels + if_].add(-wf)
    b = b.at[rows].set(wf * lt)

    # smoothness: lambda * (g[k-1] - 2 g[k] + g[k+1]) = 0
    ks = jnp.arange(1, n_levels - 1)
    r2 = B * N + ks - 1
    wk = weight_triangle(ks / (n_levels - 1.0)) + 1e-4
    A = A.at[r2, ks - 1].add(lambda_smooth * wk)
    A = A.at[r2, ks].add(-2.0 * lambda_smooth * wk)
    A = A.at[r2, ks + 1].add(lambda_smooth * wk)

    # gauge: g[mid] = 0
    A = A.at[n_eq - 1, n_levels // 2].set(1.0)

    AtA = A.T @ A + 1e-8 * jnp.eye(n_unk)
    Atb = A.T @ b
    x = jnp.linalg.solve(AtA, Atb)
    return DebevecResponse(g=x[:n_levels])


_EMOR_CACHE: dict = {}


def emor_tables():
    """(mean f0 (1024,), basis h (25, 1024)) of the INVERSE EMoR model.

    The learned DoRF PCA data of Grossberg & Nayar ("What is the Space of
    Camera Response Functions?", CVPR 2003) — factual published tables,
    shipped like the sensor DB (ref: src/aliceVision/hdr/emorCurveInv.cpp,
    GrossbergCalibrate.cpp uses the same inverse-curve basis)."""
    if "inv" not in _EMOR_CACHE:
        import os

        import numpy as np

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "emor.npz",
        )
        z = np.load(path)
        _EMOR_CACHE["inv"] = (z["emor_inv"][0], z["emor_inv"][1:])
        _EMOR_CACHE["fwd"] = (z["emor"][0], z["emor"][1:])
    return _EMOR_CACHE["inv"]


def _emor_interp(table, v):
    """Linear interpolation of (1024,)-sampled curves at v in [0, 1]."""
    q = table.shape[-1]
    x = jnp.clip(v, 0.0, 1.0) * (q - 1)
    i0 = jnp.floor(x).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, q - 1)
    f = x - i0
    t = jnp.asarray(table)
    return t[..., i0] * (1 - f) + t[..., i1] * f


def grossberg_basis(v: jnp.ndarray, n_coeffs: int, kind: str = "emor"):
    """Inverse-response basis h_k at v, stacked (..., K).

    kind="emor": the learned EMoR PCA basis (the reference's
    GrossbergCalibrate model, emorCurveInv.cpp). kind="analytic": the
    Fourier sine fallback sin(pi k v)/(pi k) — same function class
    (smooth deviations pinned at h(0)=0, h(1)=1), weaker prior."""
    if kind == "emor":
        _, h = emor_tables()
        return jnp.moveaxis(
            _emor_interp(h[:n_coeffs], v), 0, -1
        )  # (..., K)
    ks = jnp.arange(1, n_coeffs + 1, dtype=v.dtype)
    return jnp.sin(jnp.pi * ks * v[..., None]) / (jnp.pi * ks)


def grossberg_mean(v: jnp.ndarray, kind: str = "emor") -> jnp.ndarray:
    """The basis's mean inverse response f0 (identity for analytic)."""
    if kind == "emor":
        f0, _ = emor_tables()
        return _emor_interp(f0, v)
    return v


def grossberg_apply(coeffs: jnp.ndarray, v: jnp.ndarray,
                    kind: str = "emor") -> jnp.ndarray:
    """Inverse response: radiance = f0(v) + sum_k c_k h_k(v)."""
    return grossberg_mean(v, kind) + jnp.sum(
        grossberg_basis(v, coeffs.shape[-1], kind) * coeffs, axis=-1
    )


def grossberg_calibrate(
    samples: jnp.ndarray,  # (B, N) pixel values in [0, 1], same scene points
    exposures: jnp.ndarray,  # (B,) exposure times
    n_coeffs: int = 6,
    ridge: float = 1e-4,
    kind: str = "emor",
) -> jnp.ndarray:
    """Grossberg-Nayar style inverse-response calibration, linear LS.

    For each bracket pair (a, b): h(v_a) * t_b / t_a = h(v_b). With
    h(v) = f0(v) + H(v) c this is linear in c — one (K, K) normal system
    solved on-chip (ref: hdr/GrossbergCalibrate.cpp:40-120 builds the same
    pairwise-consistency quadratic program over the EMoR basis
    coefficients). Default basis: the learned EMoR PCA (emorCurveInv.cpp);
    kind="analytic" keeps the sine fallback.
    Returns coeffs (K,) for grossberg_apply.
    """
    B, N = samples.shape
    rows = []
    rhs = []
    ws = []
    for b in range(B - 1):
        ratio = exposures[b + 1] / exposures[b]
        va, vb = samples[b], samples[b + 1]
        w = weight_triangle(va) * weight_triangle(vb)
        # (f0a + Ha c) ratio = f0b + Hb c -> (ratio Ha - Hb) c = f0b - ratio f0a
        A = ratio * grossberg_basis(va, n_coeffs, kind) - grossberg_basis(
            vb, n_coeffs, kind
        )
        rows.append(A * w[:, None])
        rhs.append(
            (grossberg_mean(vb, kind) - ratio * grossberg_mean(va, kind)) * w
        )
        ws.append(w)
    A = jnp.concatenate(rows)  # (P, K)
    r = jnp.concatenate(rhs)
    AtA = A.T @ A + ridge * jnp.eye(n_coeffs, dtype=A.dtype)
    return jnp.linalg.solve(AtA, A.T @ r)


def laguerre_apply(phi: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Laguerre tone curve in [0, 1] (LaguerreBACalibration's model):
    f(x) = x + (2/pi) atan(phi sin(pi x) / (1 - phi cos(pi x)))."""
    s = jnp.sin(jnp.pi * x)
    c = jnp.cos(jnp.pi * x)
    return x + (2.0 / jnp.pi) * jnp.arctan2(phi * s, 1.0 - phi * c)


def laguerre_inverse(phi: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Inverse curve — the Laguerre family is closed under inversion with
    negated parameter."""
    return laguerre_apply(-phi, y)


def laguerre_calibrate(
    samples: jnp.ndarray,  # (B, N) in [0, 1]
    exposures: jnp.ndarray,  # (B,)
    iters: int = 30,
) -> jnp.ndarray:
    """Fit the single Laguerre parameter by Gauss-Newton on pairwise bracket
    consistency: linearize(sample_b1) * dt2/dt1 = linearize(sample_b2)."""
    B, N = samples.shape

    def residuals(phi):
        lin = laguerre_inverse(phi, samples)  # (B, N) pseudo-linear
        res = []
        for b in range(B - 1):
            ratio = exposures[b + 1] / exposures[b]
            w = weight_triangle(samples[b]) * weight_triangle(samples[b + 1])
            res.append(w * (lin[b] * ratio - lin[b + 1]))
        return jnp.concatenate(res)

    phi = jnp.asarray(0.0)

    def step(phi, _):
        r = residuals(phi)
        J = jax.jacfwd(residuals)(phi)
        denom = jnp.sum(J * J) + 1e-9
        return jnp.clip(phi - jnp.sum(J * r) / denom, -0.95, 0.95), None

    phi, _ = jax.lax.scan(step, phi, None, length=iters)
    return phi
