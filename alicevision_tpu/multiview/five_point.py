"""Nistér 5-point essential-matrix solver, batched and branch-free.

TPU-native re-design of the reference's minimal relative-pose solver
(ref: src/aliceVision/multiview/relativePose/Essential5PSolver.hpp:17,
Essential5PSolver.cpp — o(10) polynomial via Gauss-Jordan elimination of the
10x20 cubic-constraint matrix). The classic implementation builds the 10x20
coefficient matrix with hand-expanded symbolic products and finds the 10
roots with a companion-matrix eigensolve; neither maps well to TPU (huge
scalar expression trees; no nonsymmetric eig in XLA). This design instead:

1. gets the 4-dim null-space basis E(x,y,z) = x*X + y*Y + z*Z + W from an
   eigh of the 9x9 normal matrix (batched over RANSAC samples);
2. expands the 10x20 cubic-constraint coefficients *exactly* with
   precomputed monomial-product tensors: every entry of E(x,y,z) is a
   degree-1 polynomial over the monomial basis [x,y,z,1]; products lift
   through fixed (10,4,4) and (20,10,4) structure tensors (einsum, MXU
   friendly), so the constraints det E = 0 and 2*E*E^T*E - tr(E*E^T)*E = 0
   come out as exact degree-3 coefficient vectors with no interpolation
   conditioning loss;
3. Gauss-Jordan reduces to [I | A] (one batched linear solve), forms the
   3x3 polynomial matrix B(z) via the z*row(m) - row(m*z) combinations
   (rows x^2z/x^2, y^2z/y^2, xyz/xy), and expands n(z) = det B(z) (degree
   10) with fixed-size convolutions;
4. finds the real roots with a fixed tan-grid sign scan + bisection,
   evaluating the polynomial sign in homogeneous form (reversed Horner for
   |z| > 1) so it never overflows — fully vectorized, fixed iteration count;
5. polishes every candidate (x,y,z) with an exact-Jacobian (jax.jvp)
   damped Gauss-Newton on the 10 constraints, and keeps a candidate iff its
   *final* constraint residual is small — so intervals where the f32 sign
   scan near-missed a root still converge and count.

Returns all 10 candidate E per sample with a validity mask; invalid slots
(complex roots, degenerate samples) are flagged, which the fixed-budget
RANSAC turns into +inf residuals.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..numeric import f32_matmuls

# Monomial order (Nistér's grevlex-style split): 10 leading cubic monomials
# that Gauss-Jordan eliminates, then the 10-dim tail in which the reduced
# rows live. The tail is linear in x and y with z-polynomial coefficients.
_LEAD = ["x3", "y3", "x2y", "xy2", "x2z", "x2", "y2z", "y2", "xyz", "xy"]
_TAIL = ["xz2", "xz", "x", "yz2", "yz", "y", "z3", "z2", "z", "1"]

_POWERS = {
    "x3": (3, 0, 0), "y3": (0, 3, 0), "x2y": (2, 1, 0), "xy2": (1, 2, 0),
    "x2z": (2, 0, 1), "x2": (2, 0, 0), "y2z": (0, 2, 1), "y2": (0, 2, 0),
    "xyz": (1, 1, 1), "xy": (1, 1, 0), "xz2": (1, 0, 2), "xz": (1, 0, 1),
    "x": (1, 0, 0), "yz2": (0, 1, 2), "yz": (0, 1, 1), "y": (0, 1, 0),
    "z3": (0, 0, 3), "z2": (0, 0, 2), "z": (0, 0, 1), "1": (0, 0, 0),
}


# Degree-2 monomial basis (10) used as the intermediate ring; degree-1 basis
# is [x, y, z, 1] in that order (matching the null-space stack [X, Y, Z, W]).
_MON1 = ["x", "y", "z", "1"]
_MON2 = ["x2", "xy", "xz", "x", "y2", "yz", "y", "z2", "z", "1"]
_MON3 = _LEAD + _TAIL
_P1 = {"x": (1, 0, 0), "y": (0, 1, 0), "z": (0, 0, 1), "1": (0, 0, 0)}
_P2 = {
    "x2": (2, 0, 0), "xy": (1, 1, 0), "xz": (1, 0, 1), "x": (1, 0, 0),
    "y2": (0, 2, 0), "yz": (0, 1, 1), "y": (0, 1, 0), "z2": (0, 0, 2),
    "z": (0, 0, 1), "1": (0, 0, 0),
}


def _structure_tensors():
    """Exact monomial-product lift tensors, built once in numpy.

    T2[m, a, b] = 1 iff mon1[a] * mon1[b] == mon2[m];
    T3[m, c, a] = 1 iff mon2[c] * mon1[a] == mon3[m].
    A deg1 x deg1 product is then einsum('mab,...a,...b->...m', T2, p, q) and
    a deg2 x deg1 product einsum('mca,...c,...a->...m', T3, r, p) — exact in
    f32 up to rounding of the products themselves.
    """
    i2 = {tuple(np.add(_P1[a], _P1[b])): None for a in _MON1 for b in _MON1}
    idx2 = {_P2[n]: i for i, n in enumerate(_MON2)}
    assert all(k in idx2 for k in i2)
    T2 = np.zeros((10, 4, 4), np.float32)
    for a, na in enumerate(_MON1):
        for b, nb in enumerate(_MON1):
            T2[idx2[tuple(np.add(_P1[na], _P1[nb]))], a, b] = 1.0
    idx3 = {_POWERS[n]: i for i, n in enumerate(_MON3)}
    T3 = np.zeros((20, 10, 4), np.float32)
    for c, nc in enumerate(_MON2):
        for a, na in enumerate(_MON1):
            T3[idx3[tuple(np.add(_P2[nc], _P1[na]))], c, a] = 1.0
    return T2, T3


_T2, _T3 = _structure_tensors()

# fixed quasi-random unit seeds on the null-space 4-sphere: multi-start
# fallbacks for roots whose f32 polynomial chain misdirects every
# data-derived seed (deterministic; chosen once at import).
_QSEEDS = np.random.RandomState(7).randn(8, 4).astype(np.float32)
_QSEEDS /= np.linalg.norm(_QSEEDS, axis=-1, keepdims=True)


def _constraint_coeffs(XYZW: jnp.ndarray) -> jnp.ndarray:
    """Exact 10x20 cubic-constraint coefficient matrix from the null-space
    basis. XYZW: (..., 4, 3, 3) stacked [X, Y, Z, W] -> K: (..., 10, 20) over
    the _LEAD+_TAIL monomial order. Row 0 is det E; rows 1..9 are the
    flattened entries of 2*E*E^T*E - tr(E*E^T)*E."""
    dt = XYZW.dtype
    T2 = jnp.asarray(_T2, dt)
    T3 = jnp.asarray(_T3, dt)
    P = XYZW  # (..., 4, 3, 3): coefficient of mon1[c] in E_ij

    # EEt (deg 2): EEt_ij = sum_k E_ik E_jk
    C2 = jnp.einsum("mab,...aik,...bjk->...mij", T2, P, P)  # (..., 10, 3, 3)
    tr2 = C2[..., 0, 0] + C2[..., 1, 1] + C2[..., 2, 2]  # (..., 10)
    # T = 2*EEt@E - tr*E (deg 3)
    TE = 2.0 * jnp.einsum("mca,...cik,...akj->...mij", T3, C2, P) - jnp.einsum(
        "mca,...c,...aij->...mij", T3, tr2, P
    )  # (..., 20, 3, 3)

    def prod2(p, q):  # deg1*deg1
        return jnp.einsum("mab,...a,...b->...m", T2, p, q)

    def prod3(r, p):  # deg2*deg1
        return jnp.einsum("mca,...c,...a->...m", T3, r, p)

    e = lambda i, j: P[..., :, i, j]
    m0 = prod2(e(1, 1), e(2, 2)) - prod2(e(1, 2), e(2, 1))
    m1 = prod2(e(1, 0), e(2, 2)) - prod2(e(1, 2), e(2, 0))
    m2 = prod2(e(1, 0), e(2, 1)) - prod2(e(1, 1), e(2, 0))
    det3 = prod3(m0, e(0, 0)) - prod3(m1, e(0, 1)) + prod3(m2, e(0, 2))

    rowsT = jnp.swapaxes(TE.reshape(TE.shape[:-2] + (9,)), -1, -2)  # (..., 9, 20)
    return jnp.concatenate([det3[..., None, :], rowsT], axis=-2)


def _constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 cubic constraints on an essential matrix. E: (..., 3, 3) ->
    (..., 10): [det E, flatten(2 E E^T E - tr(E E^T) E)]."""
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    T = 2.0 * (EEt @ E) - tr[..., None, None] * E
    det = jnp.linalg.det(E)
    return jnp.concatenate([det[..., None], T.reshape(T.shape[:-2] + (9,))], axis=-1)


def _polymul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Convolution of coefficient vectors (highest degree first), batched on
    leading axes. a: (..., Na), b: (..., Nb) -> (..., Na+Nb-1)."""
    na, nb = a.shape[-1], b.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (na + nb - 1,), a.dtype)
    for i in range(na):
        out = out.at[..., i : i + nb].add(a[..., i : i + 1] * b)
    return out


def _poly_homval(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Homogenized value h(z) = p(z) (|z| <= 1) or z^-deg * p(z) (|z| > 1),
    evaluated via reversed Horner in u = 1/z so it never overflows. Sign of
    h equals sign of p (deg = 10 is even so z^deg > 0).
    coeffs: (..., 11) highest-first; z: (...,) -> value (...,)."""
    inner = jnp.abs(z) <= 1.0
    zi = jnp.where(inner, z, 1.0)
    ui = jnp.where(inner, 1.0, 1.0 / jnp.where(z == 0, 1.0, z))

    def horner(c_hi_first, t):
        acc = c_hi_first[..., 0]
        for i in range(1, c_hi_first.shape[-1]):
            acc = acc * t + c_hi_first[..., i]
        return acc

    p_in = horner(coeffs, zi)
    p_out = horner(coeffs[..., ::-1], ui)
    return jnp.where(inner, p_in, p_out)


def _poly_sign(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(_poly_homval(coeffs, z))


def real_roots_deg10(coeffs: jnp.ndarray, grid: int = 768, iters: int = 56):
    """Up to 10 real roots of a degree-10 polynomial, batched and branch-free.

    coeffs: (..., 11) highest power first -> (roots (..., 10), valid (..., 10)).
    """
    import jax

    dt = coeffs.dtype
    theta = jnp.linspace(-np.pi / 2 * 0.9999, np.pi / 2 * 0.9999, grid, dtype=dt)
    zs = jnp.tan(theta)
    c = coeffs / jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True).clip(1e-30)
    h = _poly_homval(c[..., None, :], zs)
    sgn = jnp.sign(h)
    flip = sgn[..., :-1] * sgn[..., 1:] < 0
    # rank intervals: sign flips first (true brackets), then near-zero dips
    # (candidate double roots / f32 near-misses that GN polish can rescue)
    minmag = jnp.minimum(jnp.abs(h[..., :-1]), jnp.abs(h[..., 1:]))
    score = jnp.where(flip, 2.0, -minmag)
    _, idx = jax.lax.top_k(score, 10)  # (..., 10) interval indices
    valid = jnp.take_along_axis(flip, idx, axis=-1)
    lo = zs[idx]
    hi = zs[idx + 1]
    s_lo = _poly_sign(c[..., None, :], lo)

    def body(carry, _):
        lo, hi, s_lo = carry
        mid = 0.5 * (lo + hi)
        s_mid = _poly_sign(c[..., None, :], mid)
        go_left = s_mid * s_lo < 0  # root in [lo, mid]
        hi = jnp.where(go_left, mid, hi)
        lo2 = jnp.where(go_left, lo, mid)
        s_lo = jnp.where(go_left, s_lo, s_mid)
        return (lo2, hi, s_lo), None

    (lo, hi, _), _ = jax.lax.scan(body, (lo, hi, s_lo), None, length=iters)
    roots = 0.5 * (lo + hi)
    return roots, valid


def _polish_q(XYZW: jnp.ndarray, q: jnp.ndarray, iters: int = 16):
    """Levenberg-Marquardt on the 10 essential-matrix constraints over the
    *unit sphere* of null-space coordinates. XYZW: (..., 4, 3, 3) with
    orthonormal basis matrices (rows of an eigh eigenbasis), q: (..., R, 4).

    Working projectively kills the affine chart's failure mode: solutions
    with small W-coefficient have huge (x, y, z), where f32 cubic constraint
    arithmetic loses all precision. On the sphere |E(q)|_F = |q| = 1 exactly
    (orthonormal basis), so residuals and Jacobians stay O(1) for every
    root. Jacobian columns are exact (jax.jvp); the radial direction is a
    null direction of J handled by LM damping; q is renormalized each step.
    """
    import jax

    def residuals(qv):
        qn = qv / jnp.linalg.norm(qv, axis=-1, keepdims=True).clip(1e-20)
        E = jnp.einsum("...rc,...cij->...rij", qn, XYZW)
        return _constraints(E)  # (..., R, 10)

    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-20)
    lam = jnp.full(q.shape[:-1], 1e-3, q.dtype)

    tangents = [jnp.zeros_like(q).at[..., c].set(1.0) for c in range(4)]

    def step(carry, _):
        q, lam = carry
        r0, j0 = jax.jvp(residuals, (q,), (tangents[0],))
        _, j1 = jax.jvp(residuals, (q,), (tangents[1],))
        _, j2 = jax.jvp(residuals, (q,), (tangents[2],))
        _, j3 = jax.jvp(residuals, (q,), (tangents[3],))
        J = jnp.stack([j0, j1, j2, j3], axis=-1)  # (..., R, 10, 4)
        H = jnp.einsum("...ic,...id->...cd", J, J)
        tr = (H[..., 0, 0] + H[..., 1, 1] + H[..., 2, 2] + H[..., 3, 3]) / 4.0
        H = H + (lam * tr + 1e-12)[..., None, None] * jnp.eye(4, dtype=q.dtype)
        g = -jnp.einsum("...ic,...i->...c", J, r0)
        dq = jnp.linalg.solve(H, g[..., None])[..., 0]
        dq = jnp.where(jnp.isfinite(dq), dq, 0.0)
        q_new = q + dq
        # reject norm collapse (zero is a spurious homogeneous minimum)
        nn = jnp.linalg.norm(q_new, axis=-1, keepdims=True)
        q_new = jnp.where(nn > 1e-3, q_new / nn.clip(1e-20), q)
        c_old = jnp.sum(r0 * r0, -1)
        r_new = residuals(q_new)
        c_new = jnp.sum(r_new * r_new, -1)
        better = c_new < c_old
        q = jnp.where(better[..., None], q_new, q)
        lam = jnp.where(better, lam * 0.3, lam * 4.0).clip(1e-8, 1e4)
        return (q, lam), None

    (q, _), _ = jax.lax.scan(step, (q, lam), None, length=iters)
    return q


def _polish_e9(A5: jnp.ndarray, e: jnp.ndarray, iters: int = 12):
    """Final Levenberg-Marquardt over unit-norm E in R^9 with the *full*
    equation set: the 5 epipolar products A5 @ e plus the 10 cubic
    constraints (15 residuals, 8 DOF on the sphere).

    The null-space stage alone cannot pin E better than the f32 eigh of the
    normal matrix A^T A resolves its null subspace (eps * cond(A)^2 — worth
    ~1e-3 on hard samples). The epipolar rows re-enter here *exactly* as
    measured, so the polished E is limited only by the data's own f32
    rounding. A5: (..., 5, 9); e: (..., R, 9) seeds."""
    import jax

    def residuals(ev):
        en = ev / jnp.linalg.norm(ev, axis=-1, keepdims=True).clip(1e-20)
        epi = jnp.einsum("...ni,...ri->...rn", A5, en)  # (..., R, 5)
        E = en.reshape(en.shape[:-1] + (3, 3))
        return jnp.concatenate([epi, _constraints(E)], axis=-1)  # (..., R, 15)

    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-20)
    lam = jnp.full(e.shape[:-1], 1e-3, e.dtype)
    eye9 = jnp.eye(9, dtype=e.dtype)
    tangents = [jnp.zeros_like(e).at[..., c].set(1.0) for c in range(9)]

    def step(carry, _):
        e, lam = carry
        cols = []
        r0 = None
        for c in range(9):
            r0, jc = jax.jvp(residuals, (e,), (tangents[c],))
            cols.append(jc)
        J = jnp.stack(cols, axis=-1)  # (..., R, 15, 9)
        H = jnp.einsum("...ic,...id->...cd", J, J)
        tr = jnp.trace(H, axis1=-2, axis2=-1) / 9.0
        H = H + (lam * tr + 1e-12)[..., None, None] * eye9
        g = -jnp.einsum("...ic,...i->...c", J, r0)
        de = jnp.linalg.solve(H, g[..., None])[..., 0]
        de = jnp.where(jnp.isfinite(de), de, 0.0)
        e_new = e + de
        # the zero vector is a spurious global minimum of the homogeneous
        # system — reject steps that collapse the norm instead of dividing
        # by the clip floor
        nn = jnp.linalg.norm(e_new, axis=-1, keepdims=True)
        e_new = jnp.where(nn > 1e-3, e_new / nn.clip(1e-20), e)
        c_old = jnp.sum(r0 * r0, -1)
        r_new = residuals(e_new)
        c_new = jnp.sum(r_new * r_new, -1)
        better = c_new < c_old
        e = jnp.where(better[..., None], e_new, e)
        lam = jnp.where(better, lam * 0.3, lam * 4.0).clip(1e-8, 1e4)
        return (e, lam), None

    (e, _), _ = jax.lax.scan(step, (e, lam), None, length=iters)
    return e


@f32_matmuls
def essential_5pt(x1n: jnp.ndarray, x2n: jnp.ndarray):
    """Nistér 5-point essential matrix from 5 *normalized camera*
    correspondences. x1n, x2n: (..., 5, 2) -> (E (..., 24, 3, 3),
    valid (..., 24)).

    Slots 0-9 are the sign-scan root candidates, 10-15 the fixed tan-fan
    z seeds, 16-23 fixed random null-space sphere seeds; every slot is
    LM-polished (null-space sphere, then full epipolar+constraint system in
    R^9) and masked by its final constraint residual, so duplicates and
    non-converged slots are flagged. Valid candidates satisfy
    x2n^T E x1n = 0 for the 5 samples up to numerical precision.
    """
    dt = x1n.dtype
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (..., 5, 9)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    basis = jnp.moveaxis(V[..., :, :4], -1, -2)  # (..., 4, 9) null-space
    XYZW = basis.reshape(basis.shape[:-1] + (3, 3))  # (..., 4, 3, 3)

    # exact cubic-constraint coefficients via monomial structure tensors
    K = _constraint_coeffs(XYZW)  # (..., 10, 20)

    K10 = K[..., :10]
    Ktail = K[..., 10:]
    # Gauss-Jordan: [I | Atail]; guard singular leading blocks
    detK = jnp.linalg.det(K10)
    ok_gj = jnp.abs(detK) > 1e-20
    K10s = jnp.where(ok_gj[..., None, None], K10, jnp.eye(10, dtype=dt))
    Atail = jnp.linalg.solve(K10s, Ktail)  # (..., 10, 10)

    # rows 4..9 lead with x2z, x2, y2z, y2, xyz, xy; pair (m*z, m) rows and
    # form z*row(m) - row(m*z): linear in x, y with z-poly coefficients.
    def combo(rz, r):
        # tail order: xz2 xz x | yz2 yz y | z3 z2 z 1
        p = jnp.stack([r[..., 0], r[..., 1] - rz[..., 0], r[..., 2] - rz[..., 1], -rz[..., 2]], axis=-1)
        q = jnp.stack([r[..., 3], r[..., 4] - rz[..., 3], r[..., 5] - rz[..., 4], -rz[..., 5]], axis=-1)
        s = jnp.stack(
            [r[..., 6], r[..., 7] - rz[..., 6], r[..., 8] - rz[..., 7], r[..., 9] - rz[..., 8], -rz[..., 9]],
            axis=-1,
        )
        return p, q, s  # degrees 3, 3, 4 (coeff counts 4, 4, 5)

    def rowscale(p, q, s):
        # det roots are invariant to row scaling of B(z); normalizing each
        # row keeps the f32 determinant expansion well-conditioned
        m = jnp.maximum(
            jnp.max(jnp.abs(p), -1), jnp.maximum(jnp.max(jnp.abs(q), -1), jnp.max(jnp.abs(s), -1))
        ).clip(1e-30)[..., None]
        return p / m, q / m, s / m

    p1, q1, s1 = rowscale(*combo(Atail[..., 4, :], Atail[..., 5, :]))
    p2, q2, s2 = rowscale(*combo(Atail[..., 6, :], Atail[..., 7, :]))
    p3, q3, s3 = rowscale(*combo(Atail[..., 8, :], Atail[..., 9, :]))

    # n(z) = det [[p1 q1 s1], [p2 q2 s2], [p3 q3 s3]]  (degree 10)
    t1 = _polymul(q2, s3) - _polymul(q3, s2)  # deg 7 (8)
    t2 = _polymul(p2, s3) - _polymul(p3, s2)  # deg 7 (8)
    t3 = _polymul(p2, q3) - _polymul(p3, q2)  # deg 6 (7)
    # all three products are degree 10 (11 coefficients)
    n = _polymul(p1, t1) - _polymul(q1, t2) + _polymul(s1, t3)

    n = jnp.nan_to_num(n, nan=0.0, posinf=0.0, neginf=0.0)
    roots, rvalid = real_roots_deg10(n)

    # fixed extra seeds: when f32 coefficient noise erases a sign flip (close
    # root pairs), a tan-spread fan still lands a seed in the lost root's LM
    # basin; duplicates converge to the same root and are harmless in RANSAC.
    extra = jnp.tan(jnp.linspace(-1.42, 1.42, 6, dtype=dt))
    roots = jnp.concatenate(
        [roots, jnp.broadcast_to(extra, roots.shape[:-1] + (6,))], axis=-1
    )

    # back-substitute x, y per root: [p(z) q(z)] [x y]^T = -s(z), 3 eqs LS
    def polyval(cf, z):
        acc = cf[..., 0:1] * jnp.ones_like(z)
        for i in range(1, cf.shape[-1]):
            acc = acc * z + cf[..., i : i + 1]
        return acc

    P = jnp.stack([polyval(p1, roots), polyval(p2, roots), polyval(p3, roots)], axis=-1)
    Q = jnp.stack([polyval(q1, roots), polyval(q2, roots), polyval(q3, roots)], axis=-1)
    S = jnp.stack([polyval(s1, roots), polyval(s2, roots), polyval(s3, roots)], axis=-1)
    # normal equations for [x, y]
    a11 = jnp.sum(P * P, axis=-1)
    a12 = jnp.sum(P * Q, axis=-1)
    a22 = jnp.sum(Q * Q, axis=-1)
    b1 = -jnp.sum(P * S, axis=-1)
    b2 = -jnp.sum(Q * S, axis=-1)
    det2 = a11 * a22 - a12 * a12
    det2s = jnp.where(jnp.abs(det2) > 1e-30, det2, 1.0)
    x = (b1 * a22 - b2 * a12) / det2s
    y = (b2 * a11 - b1 * a12) / det2s

    # spherical LM polish of q ~ (x, y, z, 1) on the 10 exact constraint
    # equations: recovers the f32 precision the elimination chain loses and
    # handles solutions at the affine chart's infinity (tiny W coefficient).
    q0 = jnp.stack([x, y, roots, jnp.ones_like(roots)], axis=-1)  # (..., 16, 4)
    qr = jnp.broadcast_to(jnp.asarray(_QSEEDS, dt), q0.shape[:-2] + (8, 4))
    q0 = jnp.concatenate([q0, qr], axis=-2)  # (..., 24, 4)
    q = _polish_q(XYZW, q0)
    e9 = jnp.einsum("...rc,...cs->...rs", q, basis)  # (..., 16, 9)
    # final full-system polish: epipolar rows + constraints over E in R^9
    e9 = _polish_e9(A, e9)
    E = e9.reshape(e9.shape[:-1] + (3, 3))
    # validity = the polished candidate actually satisfies the essential
    # constraints (scale-invariant: E is unit norm, constraints are cubic).
    # A sign-scan near-miss that GN pulled onto a root counts; a bracketed
    # interval whose polish diverged does not.
    res = jnp.linalg.norm(_constraints(E), axis=-1)
    # the residual test only means something for unit-scale E: the zero
    # matrix satisfies every homogeneous cubic constraint trivially
    e_norm = jnp.linalg.norm(E.reshape(E.shape[:-2] + (9,)), axis=-1)
    valid = (
        (res < 5e-4)
        & (e_norm > 0.5)
        & ok_gj[..., None]
        & jnp.all(jnp.isfinite(E.reshape(E.shape[:-2] + (9,))), axis=-1)
    )
    del rvalid, det2
    E = jnp.where(valid[..., None, None], E, jnp.eye(3, dtype=dt))
    return E, valid
