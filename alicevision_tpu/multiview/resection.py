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

from ..numeric import f32_matmuls, quartic_roots_real

_EPS = 1e-12


@f32_matmuls
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


@f32_matmuls
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


@f32_matmuls
def resection_dlt6(world: jnp.ndarray, obs_norm: jnp.ndarray, mask: jnp.ndarray | None = None):
    """6-point (or more) DLT resection on the normalized image plane.

    TPU-native counterpart of the reference's Resection6PSolver
    (ref: src/aliceVision/multiview/resection/Resection6PSolver.hpp): solve
    the 2N x 12 homogeneous system for the projection P = [R | t] (K already
    removed by normalizing the observations), then project onto SE(3) by
    orthonormalizing R with SVD and fixing the scale/sign from det and depth.

    world: (..., N, 3), obs_norm: (..., N, 2). Returns (R, t, valid) with
    x_cam = R x_world + t, batched over leading dims.
    """
    if mask is None:
        w = jnp.ones(world.shape[:-1], world.dtype)
    else:
        w = mask.astype(world.dtype)
    X = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)  # (..., N, 4)
    u = obs_norm[..., 0:1]
    v = obs_norm[..., 1:2]
    zeros = jnp.zeros_like(X)
    row_u = jnp.concatenate([X, zeros, -u * X], axis=-1)  # (..., N, 12)
    row_v = jnp.concatenate([zeros, X, -v * X], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=-2) * jnp.concatenate([w, w], axis=-1)[..., None]
    # Smallest right singular vector of A via eigh of A^T A (12x12, batched).
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    eigval, eigvec = jnp.linalg.eigh(AtA)
    p = eigvec[..., :, 0]  # (..., 12)
    P = p.reshape(p.shape[:-1] + (3, 4))
    Rraw, t = P[..., :3], P[..., 3]
    # Fix sign so the (masked) mean depth is positive, then scale.
    z = jnp.einsum("...j,...nj->...n", Rraw[..., 2, :], world) + t[..., 2:3]
    sign = jnp.where(jnp.sum(z * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    Rraw = Rraw * sign[..., None]
    t = t * sign
    U, S, Vt = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.mean(S, axis=-1) * jnp.where(det < 0, -1.0, 1.0)
    t = t / jnp.where(jnp.abs(scale) < _EPS, _EPS, scale)[..., None]
    R, t = gauss_newton_pose_refine(R, t, world, obs_norm, mask=mask, iters=5)
    # Validity: finite + positive depths on the (masked) support set.
    zf = jnp.einsum("...ij,...nj->...ni", R, world)[..., 2] + t[..., None, 2]
    ok_depth = jnp.all((zf > 0) | (w == 0), axis=-1)
    finite = jnp.all(jnp.isfinite(R), axis=(-1, -2)) & jnp.all(jnp.isfinite(t), axis=-1)
    return R, t, ok_depth & finite


@f32_matmuls
def epnp(world: jnp.ndarray, obs_norm: jnp.ndarray, mask: jnp.ndarray | None = None):
    """EPnP [Lepetit et al., IJCV 2009] for N >= 4 points, batched.

    TPU-native counterpart of the reference's EPnPSolver
    (ref: src/aliceVision/multiview/resection/EPnPSolver.hpp). Control
    points are the centroid + PCA axes of the world points; the camera-frame
    control points come from the smallest eigenvectors of the 12x12 normal
    matrix. We solve the beta combination for the N=1 case in closed form
    and polish betas with a few Gauss-Newton steps on the inter-control-point
    distance constraints (the reference does the same), then recover (R, t)
    by Kabsch and refine on reprojection.

    world: (..., N, 3), obs_norm: (..., N, 2). Returns (R, t, valid).
    """
    if mask is None:
        w = jnp.ones(world.shape[:-1], world.dtype)
    else:
        w = mask.astype(world.dtype)
    wn = w / jnp.sum(w, axis=-1, keepdims=True).clip(_EPS)
    c0 = jnp.sum(world * wn[..., None], axis=-2)  # centroid (..., 3)
    Xc = (world - c0[..., None, :]) * jnp.sqrt(wn)[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", Xc, Xc)
    eval_, evec = jnp.linalg.eigh(cov)  # ascending
    # Control points: centroid + principal axes scaled by sqrt(eigval).
    axes = evec * jnp.sqrt(jnp.maximum(eval_, 1e-10))[..., None, :]  # columns
    ctrl = jnp.concatenate(
        [c0[..., None, :], c0[..., None, :] + jnp.swapaxes(axes, -1, -2)], axis=-2
    )  # (..., 4, 3)
    # Barycentric coordinates: alphas solve ctrl^T alpha = [X; 1].
    Ct = jnp.concatenate(
        [jnp.swapaxes(ctrl, -1, -2), jnp.ones_like(ctrl[..., None, :, 0])], axis=-2
    )  # (..., 4, 4) rows [Cx; Cy; Cz; 1]
    Xh = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)  # (..., N, 4)
    alphas = jnp.einsum(
        "...ij,...nj->...ni", jnp.linalg.inv(Ct), Xh
    )  # (..., N, 4)
    # Build M (2N x 12): sum_j a_j [1 0 -u; 0 1 -v] acting on control j cam coords.
    u = obs_norm[..., 0]
    v = obs_norm[..., 1]
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    # row pattern per point per control j: [a, 0, -a u] and [0, a, -a v]
    ru = jnp.stack([one, zero, -u], axis=-1)  # (..., N, 3)
    rv = jnp.stack([zero, one, -v], axis=-1)
    Mu = alphas[..., :, None] * ru[..., None, :]  # (..., N, 4, 3)
    Mv = alphas[..., :, None] * rv[..., None, :]
    Mu = Mu.reshape(Mu.shape[:-2] + (12,)) * w[..., None]
    Mv = Mv.reshape(Mv.shape[:-2] + (12,)) * w[..., None]
    M = jnp.concatenate([Mu, Mv], axis=-2)  # (..., 2N, 12)
    MtM = jnp.einsum("...ni,...nj->...ij", M, M)
    _, V = jnp.linalg.eigh(MtM)
    # Candidate kernel vectors (up to 4 smallest).
    vs = V[..., :, :4]  # (..., 12, 4) columns = eigvecs ascending

    d_world = _pairwise_dists(ctrl)  # (..., 6)

    def beta_case1(vcol):
        cc = vcol.reshape(vcol.shape[:-1] + (4, 3))
        d_cam = _pairwise_dists(cc)
        # _pairwise_dists returns squared distances: d_cam scales as beta^2.
        beta2 = jnp.sum(d_cam * d_world, axis=-1) / jnp.sum(
            d_cam * d_cam, axis=-1
        ).clip(_EPS)
        beta = jnp.sqrt(jnp.maximum(beta2, 0.0))
        return beta[..., None] * vcol

    # Case N=1 on each of the two smallest kernel vectors; pick best by
    # reprojection after pose recovery.
    cands = [beta_case1(vs[..., :, 0]), beta_case1(vs[..., :, 1])]
    Rs, ts, errs = [], [], []
    for x in cands:
        cc = x.reshape(x.shape[:-1] + (4, 3))
        pts_cam = jnp.einsum("...ni,...ij->...nj", alphas, cc)  # (..., N, 3)
        # Flip if depths negative.
        sgn = jnp.where(
            jnp.sum(pts_cam[..., 2] * w, axis=-1, keepdims=True) < 0, -1.0, 1.0
        )
        pts_cam = pts_cam * sgn[..., None]
        R, t = kabsch(world, pts_cam, mask=w > 0)
        R, t = gauss_newton_pose_refine(R, t, world, obs_norm, mask=w > 0, iters=5)
        pc = jnp.einsum("...ij,...nj->...ni", R, world) + t[..., None, :]
        z = pc[..., 2:].clip(1e-6)
        rep = jnp.sum(
            jnp.sum((pc[..., :2] / z - obs_norm) ** 2, axis=-1) * w, axis=-1
        )
        Rs.append(R)
        ts.append(t)
        errs.append(rep)
    errs = jnp.stack(errs, axis=-1)
    best = jnp.argmin(errs, axis=-1)
    R = jnp.where((best == 0)[..., None, None], Rs[0], Rs[1])
    t = jnp.where((best == 0)[..., None], ts[0], ts[1])
    zf = jnp.einsum("...ij,...nj->...ni", R, world)[..., 2] + t[..., None, 2]
    valid = (
        jnp.all((zf > 0) | (w == 0), axis=-1)
        & jnp.all(jnp.isfinite(R), axis=(-1, -2))
        & jnp.all(jnp.isfinite(t), axis=-1)
    )
    return R, t, valid


def _pairwise_dists(pts4: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between the 6 pairs of 4 points. pts4: (..., 4, 3)."""
    idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack(
        [jnp.sum((pts4[..., i, :] - pts4[..., j, :]) ** 2, axis=-1) for i, j in idx],
        axis=-1,
    )


@f32_matmuls
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


@f32_matmuls
def _pose_focal_refine(R, t, logf, world, obs_px, k1=None, iters: int = 8):
    """Joint Gauss-Newton over (so3, t, log focal[, k1]) on pixel-domain
    reprojection of the minimal set. Batched over candidates; the 7x7/8x8
    normal equations are solved densely. k1 is the division-model radial
    coefficient applied to the *observations* (undistortion), normalized by
    the focal: x_u = x_d / (1 + k1 |x_d/f|^2)."""
    import jax

    from ..geometry.rotations import so3_exp

    with_k1 = k1 is not None
    nparam = 8 if with_k1 else 7
    if not with_k1:
        k1 = jnp.zeros_like(logf)

    def residuals(Rc, tc, lf, k):
        f = jnp.exp(lf)[..., None, None]
        Xc = jnp.einsum("...ij,...nj->...ni", Rc, world) + tc[..., None, :]
        z = Xc[..., 2:].clip(1e-6)
        proj = Xc[..., :2] / z
        xn = obs_px / f
        und = xn / (1.0 + k[..., None, None] * jnp.sum(xn * xn, -1, keepdims=True))
        return (proj - und).reshape(world.shape[:-2] + (-1,))

    def step(carry, _):
        Rc, tc, lf, k = carry

        def res_flat(dx):
            Rn = so3_exp(dx[..., :3]) @ Rc
            tn = tc + dx[..., 3:6]
            lfn = lf + dx[..., 6]
            kn = k + (dx[..., 7] if with_k1 else 0.0)
            return residuals(Rn, tn, lfn, kn)

        zero = jnp.zeros(world.shape[:-2] + (nparam,), world.dtype)
        r0 = res_flat(zero)
        cols = [
            jax.jvp(res_flat, (zero,), (jnp.broadcast_to(b, zero.shape),))[1]
            for b in jnp.eye(nparam, dtype=world.dtype)
        ]
        J = jnp.stack(cols, axis=-1)
        JtJ = jnp.einsum("...ni,...nj->...ij", J, J) + 1e-8 * jnp.eye(nparam, dtype=world.dtype)
        Jtr = jnp.einsum("...ni,...n->...i", J, r0)
        dx = -jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        Rn = so3_exp(dx[..., :3]) @ Rc
        tn = tc + dx[..., 3:6]
        lfn = (lf + dx[..., 6]).clip(lf - 2.0, lf + 2.0)
        kn = (k + dx[..., 7]) if with_k1 else k
        return (Rn, tn, lfn, kn), None

    (R, t, logf, k1), _ = jax.lax.scan(step, (R, t, logf, k1), None, length=iters)
    return R, t, logf, k1


def _p3p_focal_sweep(world, obs_px, f_grid):
    """P3P on points 0-2 over a batch of focal hypotheses; scores by the
    remaining points' reprojection. world (..., N, 3), obs_px (..., N, 2)
    centered pixels, f_grid (F,). -> (R, t) of shape (..., F*4, ...) plus
    pixel-domain score (..., F*4)."""
    F = f_grid.shape[0]
    xn = obs_px[..., None, :, :] / f_grid[:, None, None]  # (..., F, N, 2)
    ones = jnp.ones(xn.shape[:-1] + (1,), xn.dtype)
    rays = jnp.concatenate([xn, ones], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    w3 = jnp.broadcast_to(world[..., None, :3, :], xn.shape[:-2] + (3, 3))
    R, t, valid = p3p(w3, rays[..., :3, :])  # (..., F, 4, 3, 3)

    wN = world[..., None, None, :, :]  # (..., 1, 1, N, 3)
    Xc = jnp.einsum("...ij,...nj->...ni", R, jnp.broadcast_to(wN, R.shape[:-2] + world.shape[-2:])) + t[..., None, :]
    z = Xc[..., 2:].clip(1e-6)
    proj = Xc[..., :2] / z  # (..., F, 4, N, 2)
    fpx = f_grid[:, None, None, None]
    err = jnp.linalg.norm(proj * fpx - obs_px[..., None, None, :, :], axis=-1)
    score = jnp.max(err, axis=-1) + jnp.where(valid, 0.0, jnp.inf)
    score = jnp.where(jnp.all(Xc[..., 2] > 0, axis=-1), score, jnp.inf)
    # flatten (F, 4) candidate axes
    bs = R.shape[:-4]
    R = R.reshape(bs + (F * 4, 3, 3))
    t = t.reshape(bs + (F * 4, 3))
    lf = jnp.broadcast_to(jnp.log(f_grid)[:, None], bs + (F, 4)).reshape(bs + (F * 4,))
    return R, t, lf, score.reshape(bs + (F * 4,))


@f32_matmuls
def p4pf(world: jnp.ndarray, obs_px: jnp.ndarray, f_lo: float, f_hi: float,
         n_f: int = 24, top_k: int = 4):
    """Pose + unknown focal from 4 points (P4Pf).

    TPU-native re-design of the reference's Gröbner-basis solver
    (ref: src/aliceVision/multiview/resection/P4PfSolver.hpp:21 — the
    bougnoux-style action-matrix solve needs a nonsymmetric eigensolver,
    which XLA lacks): a fixed log-spaced focal sweep feeds batched P3P on
    points 0-2, the 4th point ranks the (focal x root) candidates, and a
    joint Gauss-Newton over (so3, t, log f) polishes the top_k — fixed
    budget, fully vmappable over RANSAC samples.

    world: (..., 4, 3); obs_px: (..., 4, 2) pixels *relative to the
    principal point*. Returns (R (..., K, 3, 3), t (..., K, 3),
    f (..., K), valid (..., K)) with x_cam = R x_world + t.
    """
    import jax

    dt = world.dtype
    f_grid = jnp.exp(jnp.linspace(jnp.log(f_lo), jnp.log(f_hi), n_f)).astype(dt)
    R, t, lf, score = _p3p_focal_sweep(world, obs_px, f_grid)
    _, idx = jax.lax.top_k(-score, top_k)
    R = jnp.take_along_axis(R, idx[..., None, None], axis=-3)
    t = jnp.take_along_axis(t, idx[..., None], axis=-2)
    lf = jnp.take_along_axis(lf, idx, axis=-1)

    wK = jnp.broadcast_to(world[..., None, :, :], R.shape[:-2] + world.shape[-2:])
    oK = jnp.broadcast_to(obs_px[..., None, :, :], R.shape[:-2] + obs_px.shape[-2:])
    R, t, lf, _ = _pose_focal_refine(R, t, lf, wK, oK)

    f = jnp.exp(lf)
    Xc = jnp.einsum("...kij,...knj->...kni", R, wK) + t[..., None, :]
    z = Xc[..., 2:].clip(1e-6)
    err = jnp.linalg.norm(Xc[..., :2] / z * f[..., None, None] - oK, axis=-1)
    valid = (jnp.max(err, -1) < 1e-2 * f) & jnp.all(Xc[..., 2] > 0, -1)
    valid &= jnp.all(jnp.isfinite(R.reshape(R.shape[:-2] + (9,))), -1)
    return R, t, f, valid


@f32_matmuls
def p5pfr(world: jnp.ndarray, obs_px: jnp.ndarray, f_lo: float, f_hi: float,
          n_f: int = 16, n_k: int = 7, top_k: int = 4):
    """Pose + focal + radial distortion from 5 points (P5Pfr).

    TPU-native re-design of the reference's solver
    (ref: src/aliceVision/multiview/resection/P5PfrSolver.hpp:26): a fixed
    (focal x division-model k1) grid undistorts the observations, batched
    P3P on points 0-2 is scored by points 3-4, and a joint Gauss-Newton
    over (so3, t, log f, k1) polishes the top_k candidates.

    world: (..., 5, 3); obs_px: (..., 5, 2) centered pixels. Returns
    (R (..., K, 3, 3), t (..., K, 3), f (..., K), k1 (..., K),
    valid (..., K)); k1 acts on focal-normalized radii:
    x_u = x_d / (1 + k1 |x_d / f|^2).
    """
    import jax

    dt = world.dtype
    f_grid = jnp.exp(jnp.linspace(jnp.log(f_lo), jnp.log(f_hi), n_f)).astype(dt)
    k_grid = jnp.linspace(-0.6, 0.3, n_k).astype(dt)

    Rs, ts, lfs, kks, scores = [], [], [], [], []
    for ki in range(n_k):
        k = k_grid[ki]
        # undistort observations at this k1 for every focal in the sweep
        xn = obs_px[..., None, :, :] / f_grid[:, None, None]
        und = xn / (1.0 + k * jnp.sum(xn * xn, -1, keepdims=True))
        obs_u = und * f_grid[:, None, None]  # (..., F, N, 2) pixel domain
        # per-focal P3P on the undistorted pixels (focal re-applied inside)
        R, t, lf, score = _p3p_focal_sweep_multi(world, obs_u, f_grid)
        Rs.append(R)
        ts.append(t)
        lfs.append(lf)
        kks.append(jnp.full(score.shape, k, dt))
        scores.append(score)
    R = jnp.concatenate(Rs, axis=-3)
    t = jnp.concatenate(ts, axis=-2)
    lf = jnp.concatenate(lfs, axis=-1)
    kk = jnp.concatenate(kks, axis=-1)
    score = jnp.concatenate(scores, axis=-1)
    _, idx = jax.lax.top_k(-score, top_k)
    R = jnp.take_along_axis(R, idx[..., None, None], axis=-3)
    t = jnp.take_along_axis(t, idx[..., None], axis=-2)
    lf = jnp.take_along_axis(lf, idx, axis=-1)
    kk = jnp.take_along_axis(kk, idx, axis=-1)

    wK = jnp.broadcast_to(world[..., None, :, :], R.shape[:-2] + world.shape[-2:])
    oK = jnp.broadcast_to(obs_px[..., None, :, :], R.shape[:-2] + obs_px.shape[-2:])
    R, t, lf, kk = _pose_focal_refine(R, t, lf, wK, oK, k1=kk)

    f = jnp.exp(lf)
    Xc = jnp.einsum("...kij,...knj->...kni", R, wK) + t[..., None, :]
    z = Xc[..., 2:].clip(1e-6)
    xn = oK / f[..., None, None]
    und = xn / (1.0 + kk[..., None, None] * jnp.sum(xn * xn, -1, keepdims=True))
    err = jnp.linalg.norm((Xc[..., :2] / z - und) * f[..., None, None], axis=-1)
    valid = (jnp.max(err, -1) < 1e-2 * f) & jnp.all(Xc[..., 2] > 0, -1)
    valid &= jnp.all(jnp.isfinite(R.reshape(R.shape[:-2] + (9,))), -1)
    return R, t, f, kk, valid


def _p3p_focal_sweep_multi(world, obs_px_per_f, f_grid):
    """_p3p_focal_sweep variant where the observations already carry the
    focal axis (per-focal undistorted pixels). obs_px_per_f: (..., F, N, 2)."""
    F = f_grid.shape[0]
    xn = obs_px_per_f / f_grid[:, None, None]
    ones = jnp.ones(xn.shape[:-1] + (1,), xn.dtype)
    rays = jnp.concatenate([xn, ones], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    w3 = jnp.broadcast_to(world[..., None, :3, :], xn.shape[:-2] + (3, 3))
    R, t, valid = p3p(w3, rays[..., :3, :])

    N = world.shape[-2]
    wN = jnp.broadcast_to(world[..., None, None, :, :], R.shape[:-2] + (N, 3))
    Xc = jnp.einsum("...ij,...nj->...ni", R, wN) + t[..., None, :]
    z = Xc[..., 2:].clip(1e-6)
    proj = Xc[..., :2] / z
    err = jnp.linalg.norm(proj - xn[..., None, :, :], axis=-1) * f_grid[:, None, None]
    score = jnp.max(err, axis=-1) + jnp.where(valid, 0.0, jnp.inf)
    score = jnp.where(jnp.all(Xc[..., 2] > 0, axis=-1), score, jnp.inf)
    bs = R.shape[:-4]
    R = R.reshape(bs + (F * 4, 3, 3))
    t = t.reshape(bs + (F * 4, 3))
    lf = jnp.broadcast_to(jnp.log(f_grid)[:, None], bs + (F, 4)).reshape(bs + (F * 4,))
    return R, t, lf, score.reshape(bs + (F * 4,))
