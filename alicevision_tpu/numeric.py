"""Numeric helpers: branch-free polynomial roots, homogeneous coords, misc.

TPU-native counterpart of the reference's numeric utilities
(ref: src/aliceVision/numeric/polynomial.hpp, numeric/numeric.hpp). Closed
forms only — general (nonsymmetric) eigendecomposition is CPU-only in XLA,
so cubic/quartic roots use Cardano/trig formulas that batch on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def f32_matmuls(fn):
    """Trace ``fn`` with float32 matmul precision.

    On TPU the MXU truncates matmul operands to bfloat16 by default, which
    is fine for similarity scores (descriptor matching, ZNCC volumes) but
    wrong for geometry: 3x3 rotation products and J^T J normal equations
    lose ~3 decimal digits and Gauss-Newton stalls at 1e-3 residuals.
    Solver entry points wrap themselves with this decorator; large-volume
    score kernels deliberately do not.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper


def cbrt(x: jnp.ndarray) -> jnp.ndarray:
    """Real cube root with sign, safe for negatives."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def cubic_roots_real(c3, c2, c1, c0):
    """Real roots of c3 x^3 + c2 x^2 + c1 x + c0, branch-free and batched.

    Returns (roots (..., 3), n_real (...,)). When only one real root exists it
    is replicated into all three slots (downstream scoring dedups naturally).
    Inputs broadcast; float32-safe via normalization.
    """
    c3 = jnp.where(jnp.abs(c3) < 1e-12, 1e-12, c3)
    a = c2 / c3
    b = c1 / c3
    c = c0 / c3
    # Depressed cubic t^3 + p t + q, x = t - a/3.
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c

    disc = -4.0 * p**3 - 27.0 * q**2  # > 0 => 3 real roots

    # Three-real-root branch (trigonometric).
    p_neg = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg)
    k = jnp.arange(3.0, dtype=theta.dtype)
    t3 = m[..., None] * jnp.cos((theta[..., None] - 2.0 * jnp.pi * k) / 3.0)

    # Single-real-root branch (Cardano).
    s = jnp.sqrt(jnp.maximum(q**2 / 4.0 + p**3 / 27.0, 0.0))
    t1 = cbrt(-q / 2.0 + s) + cbrt(-q / 2.0 - s)
    t1 = jnp.broadcast_to(t1[..., None], t3.shape)

    three = (disc > 0.0)[..., None]
    roots = jnp.where(three, t3, t1) - (a / 3.0)[..., None]
    n_real = jnp.where(disc > 0.0, 3, 1)
    return roots, n_real


def quartic_roots_real(c4, c3, c2, c1, c0):
    """Real roots of a quartic via Ferrari's method, branch-free and batched.

    Returns (roots (..., 4), valid (..., 4) bool). Complex roots are flagged
    invalid (their slots hold the real part of the quadratic vertex).
    """
    c4 = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a = c3 / c4
    b = c2 / c4
    c = c1 / c4
    d = c0 / c4
    # Depressed quartic y^4 + p y^2 + q y + r with x = y - a/4.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a**3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a**4 / 256.0

    # Resolvent cubic 8 m^3 + 8 p m^2 + (2 p^2 - 8 r) m - q^2 = 0.
    m_roots, _ = cubic_roots_real(
        jnp.full_like(p, 8.0), 8.0 * p, 2.0 * p * p - 8.0 * r, -q * q
    )
    # Use the largest real root; it is always >= 0 for a valid factorization.
    m = jnp.max(m_roots, axis=-1)
    m = jnp.maximum(m, 0.0)
    s = jnp.sqrt(jnp.maximum(2.0 * m, _EPS))

    # Factor into two quadratics: y^2 +- s y + (p/2 + m -+ q/(2s)).
    t0 = p / 2.0 + m - q / (2.0 * s)
    t1 = p / 2.0 + m + q / (2.0 * s)

    def quad_roots(bq, cq):
        disc = bq * bq / 4.0 - cq
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-bq / 2.0 + sq, -bq / 2.0 - sq, ok)

    y0a, y0b, ok0 = quad_roots(s, t0)
    y1a, y1b, ok1 = quad_roots(-s, t1)
    roots = jnp.stack([y0a, y0b, y1a, y1b], axis=-1) - (a / 4.0)[..., None]
    valid = jnp.stack([ok0, ok0, ok1, ok1], axis=-1)
    return roots, valid


def homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def euclidean(xh: jnp.ndarray) -> jnp.ndarray:
    w = xh[..., -1:]
    return xh[..., :-1] / jnp.where(jnp.abs(w) < _EPS, _EPS, w)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    from .geometry.rotations import hat

    return hat(v)
