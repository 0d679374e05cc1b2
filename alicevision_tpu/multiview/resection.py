"""Absolute-pose (resection) solvers: P3P, N-point DLT refine, Kabsch.

TPU-native counterpart of the reference's resection solvers
(ref: src/aliceVision/multiview/resection/P3PSolver.hpp:19, EPnPSolver.hpp,
Resection6PSolver.hpp). P3P uses Grunert's classical formulation
[Haralick et al., IJCV 1994] but eliminates the algebra numerically:
the two depth-ratio quadratics' resultant — a quartic in v — is evaluated
at five abscissae and interpolated through a fixed Vandermonde solve, then
rooted with the closed-form Ferrari solver. Everything batches under vmap;
up to 4 candidate poses per sample with a validity mask (no early exits).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..numeric import quartic_roots_real

_EPS = 1e-12


def kabsch(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Rigid transform (R, t) minimizing ||R @ src + t - dst||^2.

    src, dst: (..., N, 3). Returns R (..., 3, 3), t (..., 3).
    """
    if mask is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = mask.astype(src.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True).clip(_EPS)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / wsum
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / wsum
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", dc * w[..., None], sc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def p3p(world: jnp.ndarray, bearings: jnp.ndarray):
    """Grunert P3P. world: (..., 3, 3) points, bearings: (..., 3, 3) unit rays
    in the camera frame. Returns (R (..., 4, 3, 3), t (..., 4, 3),
    valid (..., 4)) — candidate poses with x_cam = R x_world + t.
    """
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    P1, P2, P3 = world[..., 0, :], world[..., 1, :], world[..., 2, :]

    cos_a = jnp.sum(f2 * f3, axis=-1)  # angle opposite side a = |P2 P3|
    cos_b = jnp.sum(f1 * f3, axis=-1)
    cos_g = jnp.sum(f1 * f2, axis=-1)
    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)

    # With s2 = u s1, s3 = v s1:
    #  (1) s1^2 (1 + u^2 - 2 u cos_g) = c2
    #  (2) s1^2 (1 + v^2 - 2 v cos_b) = b2
    #  (3) s1^2 (u^2 + v^2 - 2 u v cos_a) = a2
    # (1)/(2): quadratic Q1 in u with v-dependent constant term:
    #   u^2 - 2 cos_g u + [c2/b2 (1 + v^2 - 2 v cos_b) - 1] * (-1) ... sign:
    #   1 + u^2 - 2 u cos_g = (c2/b2)(1 + v^2 - 2 v cos_b)
    # (3)/(2): (u^2 + v^2 - 2 u v cos_a) b2 = a2 (1 + v^2 - 2 v cos_b)
    def quad_coeffs(v):
        # v may carry a trailing candidate dim relative to the side lengths.
        e = (lambda x: x[..., None]) if v.ndim == cos_a.ndim + 1 else (lambda x: x)
        ca, cb, cg = e(cos_a), e(cos_b), e(cos_g)
        A2, B2, C2 = e(a2), e(b2), e(c2)
        k = (C2 / B2.clip(_EPS)) * (1.0 + v * v - 2.0 * v * cb)
        a1q, b1q, c1q = jnp.ones_like(v), -2.0 * cg * jnp.ones_like(v), 1.0 - k
        a2q = jnp.broadcast_to(B2, v.shape)
        b2q = -2.0 * B2 * v * ca
        c2q = B2 * v * v - A2 * (1.0 + v * v - 2.0 * v * cb)
        return (a1q, b1q, c1q), (a2q, b2q, c2q)

    def resultant(v):
        (a1q, b1q, c1q), (a2q, b2q, c2q) = quad_coeffs(v)
        return (a1q * c2q - a2q * c1q) ** 2 - (a1q * b2q - a2q * b1q) * (
            b1q * c2q - b2q * c1q
        )

    # The resultant is a quartic in v: sample at 5 abscissae + interpolate.
    ts = jnp.array([0.0, 1.0, -1.0, 2.0, -2.0], dtype=world.dtype)
    vals = jnp.stack([resultant(jnp.broadcast_to(t, cos_a.shape)) for t in ts], axis=-1)
    V = jnp.stack([ts**i for i in range(5)], axis=-1)  # (5, 5)
    coeffs = jnp.einsum("ij,...j->...i", jnp.linalg.inv(V), vals)  # c0..c4

    v_roots, v_valid = quartic_roots_real(
        coeffs[..., 4], coeffs[..., 3], coeffs[..., 2], coeffs[..., 1], coeffs[..., 0]
    )  # (..., 4)

    # Recover u for each v: the shared root of the two quadratics.
    (a1q, b1q, c1q), (a2q, b2q, c2q) = quad_coeffs(v_roots)
    den = a2q * b1q - a1q * b2q
    u = (a1q * c2q - a2q * c1q) / jnp.where(jnp.abs(den) < _EPS, _EPS, den)

    # Depths.
    s1sq = c2[..., None] / (1.0 + u * u - 2.0 * u * cos_g[..., None]).clip(_EPS)
    s1 = jnp.sqrt(jnp.maximum(s1sq, 0.0))
    s2 = u * s1
    s3 = v_roots * s1
    # Positivity of depths is enforced post-polish (z > 0 below); rejecting on
    # raw f32 roots here would drop candidates that polish to valid poses.
    valid = v_valid

    # Camera-frame points, then rigid fit to world points.
    Xc = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )  # (..., 4 candidates, 3 points, 3)
    Pw = jnp.broadcast_to(world[..., None, :, :], Xc.shape)
    R, t = kabsch(Pw, Xc)  # maps world -> camera

    # Polish each candidate with Gauss-Newton on the minimal set — f32
    # quartic roots are only ~1e-3 accurate; GN restores machine precision.
    fz = bearings[..., 2:].clip(1e-6)
    obs_norm = bearings[..., :2] / fz  # (..., 3, 2)
    obs_b = jnp.broadcast_to(obs_norm[..., None, :, :], Xc.shape[:-1] + (2,))
    R = jnp.where(jnp.isfinite(R), R, jnp.eye(3, dtype=R.dtype))
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    R, t = gauss_newton_pose_refine(R, t, Pw, obs_b, iters=5)

    # Validate: exact solutions reproject the minimal set to ~0 and have
    # positive depths.
    fit = jnp.einsum("...ij,...nj->...ni", R, Pw) + t[..., None, :]
    z = fit[..., 2]
    uv = fit[..., :2] / z[..., None].clip(1e-6)
    rep = jnp.max(jnp.linalg.norm(uv - obs_b, axis=-1), axis=-1)
    valid = valid & (rep < 3e-3) & jnp.all(z > 0, axis=-1) & jnp.isfinite(rep)
    return R, t, valid


def gauss_newton_pose_refine(
    R: jnp.ndarray,
    t: jnp.ndarray,
    world: jnp.ndarray,
    obs_norm: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    iters: int = 5,
):
    """Refine (R, t) by Gauss-Newton on normalized-plane reprojection.

    world: (..., N, 3), obs_norm: (..., N, 2) normalized camera observations.
    Fixed iteration count; the 6x6 normal equations are solved densely.
    Used to polish P3P inside RANSAC refit and single-pose localization
    (ref: sfm/pipeline/localization/SfMLocalizer.hpp refine step).
    """
    import jax

    from ..geometry.rotations import so3_exp

    w = jnp.ones(world.shape[:-1], world.dtype) if mask is None else mask.astype(world.dtype)

    def residuals(Rc, tc):
        Xc = jnp.einsum("...ij,...nj->...ni", Rc, world) + tc[..., None, :]
        z = Xc[..., 2:].clip(1e-6)
        return (Xc[..., :2] / z - obs_norm) * w[..., None]

    def step(carry, _):
        Rc, tc = carry

        def res_flat(dx):
            dR = so3_exp(dx[..., :3])
            Rn = dR @ Rc
            tn = tc + dx[..., 3:]
            return residuals(Rn, tn).reshape(world.shape[:-2] + (-1,))

        zero = jnp.zeros(world.shape[:-2] + (6,), world.dtype)
        # Batched Jacobian: forward-mode jvp against the 6 tangent basis
        # vectors (res_flat already carries the batch dims).
        basis = jnp.eye(6, dtype=world.dtype)
        r0 = res_flat(zero)
        cols = [
            jax.jvp(res_flat, (zero,), (jnp.broadcast_to(b, zero.shape),))[1]
            for b in basis
        ]
        J = jnp.stack(cols, axis=-1)  # (..., 2N, 6)
        JtJ = jnp.einsum("...ni,...nj->...ij", J, J)
        Jtr = jnp.einsum("...ni,...n->...i", J, r0)
        JtJ = JtJ + 1e-8 * jnp.eye(6, dtype=world.dtype)
        dx = -jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
        Rn = so3_exp(dx[..., :3]) @ Rc
        tn = tc + dx[..., 3:]
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t
