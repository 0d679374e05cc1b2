"""Bundle adjustment: Levenberg-Marquardt with explicit Schur complement.

TPU-native replacement for the reference's Ceres-based BA
(ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:38-140 residual
costs, :216-231 DENSE_SCHUR/SPARSE_SCHUR selection;
BundleAdjustmentSymbolicCeres manifolds sfm/bundle/manifolds/se3.hpp).
Instead of a sparse CPU factorization we exploit the TPU's MXU:

  * observations live in a (L, K) landmark-bucketed table (K = max track
    length, padded + masked) — every per-landmark quantity is dense batched
    math;
  * per-observation 2-vector residuals and their pose/point Jacobians come
    from forward-mode autodiff (jax.jvp) — exact, batched, no autodiff tape;
  * landmark blocks V_l (3x3) are eliminated in closed form (batched
    inverse), and the reduced camera system S (6C x 6C) is assembled by
    scatter-adding the (L, K, K) 6x6 pair blocks — a pure MXU/scatter
    workload — then solved densely with Cholesky;
  * the LM trust-region loop is a jit-compiled lax.while_loop with
    accept/reject damping updates (no host round-trips).

Gauge and partial refinement mirror the reference's refine-flag bitmask
(BundleAdjustment.hpp:75-119): per-camera and per-landmark masks zero the
corresponding Jacobian columns, making those parameters CONSTANT.

Robustness: Huber IRLS weights re-evaluated every iteration (the reference
uses a Huber loss on distances, BundleAdjustmentCeres.cpp).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import camera as cam
from ..geometry.rotations import quat_rotate, so3_exp, mat_to_quat, quat_to_mat

_EPS = 1e-12


class BAProblem(NamedTuple):
    """Static-shape BA problem. All index arrays refer to table rows.

    Rig support (ref: rig costs in BundleAdjustmentCeres.cpp:38-140,
    sfmData/Rig.hpp): when sub_q/sub_t/obs_sub are set, the world->camera
    transform of an observation is the chain  x_cam = R_sub x_frame + t_sub
    with x_frame = R(cam_q)(X - cam_c) — cam_q/cam_c are then the shared
    *frame* (rig) poses and each observation selects its rig sub-pose via
    obs_sub. Sub-pose index 0 must be the identity (non-rig observations
    point there). ba_solve refines frame poses + points with sub-poses
    held; refine_rig_subposes polishes the sub-poses (alternating scheme,
    see rig_solve)."""

    cam_q: jnp.ndarray  # (C, 4) world->cam (or world->frame) quaternion
    cam_c: jnp.ndarray  # (C, 3) centers
    points: jnp.ndarray  # (L, 3)
    intr: cam.Intrinsics  # batched (I,)
    obs_cam: jnp.ndarray  # (L, K) int32 camera index (0 if masked)
    obs_intr: jnp.ndarray  # (L, K) int32 intrinsic index
    obs_uv: jnp.ndarray  # (L, K, 2) pixel observations
    obs_mask: jnp.ndarray  # (L, K) bool
    cam_fixed: jnp.ndarray  # (C,) bool — pose held CONSTANT
    point_fixed: jnp.ndarray  # (L,) bool
    sub_q: jnp.ndarray = None  # (S, 4) rig sub-pose rotations (0 = identity)
    sub_t: jnp.ndarray = None  # (S, 3) rig sub-pose translations
    obs_sub: jnp.ndarray = None  # (L, K) int32 sub-pose index


class BAResult(NamedTuple):
    cam_q: jnp.ndarray
    cam_c: jnp.ndarray
    points: jnp.ndarray
    cost_initial: jnp.ndarray
    cost_final: jnp.ndarray
    n_iters: jnp.ndarray


def build_problem(
    cam_q,
    cam_c,
    points,
    intr,
    obs_lm,
    obs_cam,
    obs_intr,
    obs_uv,
    max_track: int = 16,
    cam_fixed=None,
    point_fixed=None,
    obs_sub=None,
    sub_q=None,
    sub_t=None,
) -> BAProblem:
    """Bucket flat observation arrays into the (L, K) table (host-side)."""
    obs_lm = np.asarray(obs_lm)
    L = len(points)
    K = max_track
    # Fully vectorized bucketing: rank of each observation within its
    # landmark group (stable sort + group-offset subtraction) gives the K
    # slot directly — no Python loop over landmarks (O(L) interpreter time
    # would dominate at ETH3D scale).
    order = np.argsort(obs_lm, kind="stable")
    sorted_lm = obs_lm[order]
    bounds = np.searchsorted(sorted_lm, np.arange(L + 1))
    slot = np.arange(len(obs_lm)) - bounds[sorted_lm]
    keep = slot < K
    rows = sorted_lm[keep]
    cols = slot[keep]
    src = order[keep]
    t_cam = np.zeros((L, K), np.int32)
    t_intr = np.zeros((L, K), np.int32)
    t_uv = np.zeros((L, K, 2), np.float32)
    t_mask = np.zeros((L, K), bool)
    t_cam[rows, cols] = np.asarray(obs_cam)[src]
    t_intr[rows, cols] = np.asarray(obs_intr)[src]
    t_uv[rows, cols] = np.asarray(obs_uv)[src]
    t_mask[rows, cols] = True
    t_sub = None
    if obs_sub is not None:
        t_sub = np.zeros((L, K), np.int32)
        t_sub[rows, cols] = np.asarray(obs_sub)[src]
    C = len(cam_c)
    return BAProblem(
        cam_q=jnp.asarray(cam_q, jnp.float32),
        cam_c=jnp.asarray(cam_c, jnp.float32),
        points=jnp.asarray(points, jnp.float32),
        intr=jax.tree_util.tree_map(jnp.asarray, intr),
        obs_cam=jnp.asarray(t_cam),
        obs_intr=jnp.asarray(t_intr),
        obs_uv=jnp.asarray(t_uv),
        obs_mask=jnp.asarray(t_mask),
        cam_fixed=jnp.zeros((C,), bool) if cam_fixed is None else jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros((L,), bool)
        if point_fixed is None
        else jnp.asarray(point_fixed),
        sub_q=None if sub_q is None else jnp.asarray(sub_q, jnp.float32),
        sub_t=None if sub_t is None else jnp.asarray(sub_t, jnp.float32),
        obs_sub=None if t_sub is None else jnp.asarray(t_sub),
    )


# Above this many elements of the dense one-hot (C, K*L) the broadcast /
# accumulation fall back to gather / scatter-add: the one-hot matmul wins by
# ~400x for small tables (a dependent tiny-table gather costs ~4 ms on TPU),
# but its memory is C*K*L floats, which at 1,000 cams / 300k landmarks would
# be ~19 GB. The switch is static at trace time (shapes are static).
_ONEHOT_BUDGET = 48 * 1024 * 1024


# Trace-time switch for SPMD-safe contraction forms. Under pjit with the
# landmark axis sharded, any reshape merging a LOCAL axis into the sharded
# one ((K*L,), (6C, 3L)) forces the partitioner to ALL-GATHER the operand
# (measured 17 MB/iter at 2 shards, ~99% of the distributed BA's
# collective traffic); keeping K/L separate einsum axes lets XLA psum the
# tiny (C, ...) partials instead. On a SINGLE chip the merged-axis
# dot_general forms lower ~3x faster on the MXU (measured 192 vs 64 LM
# it/s), so the solvers pick the form by the `spmd` flag that
# parallel/ba_sharded.make_sharded_ba sets.
_SPMD_FORMS = False


def _bcast_rows(tbl, ocT):
    """Broadcast per-camera rows tbl (C, D) to observations -> (D, K, L)."""
    C, D = tbl.shape
    K, L = ocT.shape
    if C * K * L <= _ONEHOT_BUDGET:
        if _SPMD_FORMS:
            oh = jax.nn.one_hot(ocT, C, dtype=tbl.dtype, axis=0)
            return jnp.einsum("cd,ckl->dkl", tbl, oh, precision="highest")
        oh = jax.nn.one_hot(ocT, C, dtype=tbl.dtype, axis=0).reshape(C, K * L)
        return jax.lax.dot_general(
            tbl.T, oh, (((1,), (0,)), ((), ())), precision="highest"
        ).reshape(D, K, L)
    # transposed-table gather: output lands directly in (D, K, L) plane
    # layout. Gathering tbl[ocT] first would materialize (K, L, D) with the
    # tiny D on the 128-lane axis — measured 2x slower on v5e (4.4 vs
    # 2.2 ms at 1,024 cams / 1.8M obs).
    return tbl.T[:, ocT]


def _accum_cams(planes, ocT, C):
    """Accumulate per-observation planes (D, K, L) into (C, D) rows.

    Values must already carry the observation mask (zero where invalid).

    NOTE a camera-major re-layout of this reduction was built and measured
    in round 4 (sort observations by camera at problem build, then either
    a (C, M)-bucketed row-gather + contiguous sum, a sorted segment_sum,
    or a sorted scatter): ALL variants lost to the plain scatter-add on
    v5e (46 vs 35 ms per PCG matvec at 1,024 cams / 1.8M obs — the 24-byte
    row fetches are exactly as random as the scattered writes, and skewed
    per-camera counts pad the buckets 46%). The scatter stays; the large-
    scene win came from CG warm starts instead (see _schur_solve_pcg)."""
    D, K, L = planes.shape
    if C * K * L <= _ONEHOT_BUDGET:
        if _SPMD_FORMS:
            oh = jax.nn.one_hot(ocT, C, dtype=planes.dtype, axis=0)
            return jnp.einsum("ckl,dkl->cd", oh, planes, precision="highest")
        oh = jax.nn.one_hot(ocT, C, dtype=planes.dtype, axis=0).reshape(
            C, K * L
        )
        return jax.lax.dot_general(
            oh, planes.reshape(D, K * L),
            (((1,), (1,)), ((), ())), precision="highest",
        )
    return (
        jnp.zeros((C, D), planes.dtype)
        .at[ocT.reshape(-1)]
        .add(planes.reshape(D, K * L).T)
    )


def _apply_subpose(problem: BAProblem, ux, uy, uz, sub_q=None, sub_t=None):
    """x_cam components from x_frame via the per-obs rig sub-pose.

    Returns (xc, yc, zc, Rs) with Rs the 9 broadcast rotation planes (None
    for the non-rig fast path)."""
    if problem.sub_q is None:
        return ux, uy, uz, None
    sq = problem.sub_q if sub_q is None else sub_q
    st = problem.sub_t if sub_t is None else sub_t
    S = sq.shape[0]
    tblS = jnp.concatenate([quat_to_mat(sq).reshape(S, 9), st], axis=1)
    gs = _bcast_rows(tblS, problem.obs_sub.T)  # (12, K, L)
    Rs = [gs[i] for i in range(9)]
    xc = Rs[0] * ux + Rs[1] * uy + Rs[2] * uz + gs[9]
    yc = Rs[3] * ux + Rs[4] * uy + Rs[5] * uz + gs[10]
    zc = Rs[6] * ux + Rs[7] * uy + Rs[8] * uz + gs[11]
    return xc, yc, zc, Rs


def _intr_apply(intr: cam.Intrinsics, dtheta) -> cam.Intrinsics:
    """Apply packed intrinsic deltas (I, 4 + DISTO_PARAMS):
    [d_fx, d_fy, d_cx, d_cy, d_disto...]."""
    return intr._replace(
        scale=intr.scale + dtheta[:, 0:2],
        offset=intr.offset + dtheta[:, 2:4],
        disto=intr.disto + dtheta[:, 4:],
    )


def _residuals(problem: BAProblem, cam_q, cam_c, points, sub_q=None, sub_t=None,
               intr=None):
    """r (2, K, L) only — the cheap path for cost evaluation (same
    observation-minor layout as _residuals_and_jacobians)."""
    ocT = problem.obs_cam.T  # (K, L)
    L, K = problem.obs_cam.shape
    C = cam_q.shape[0]
    tblC = jnp.concatenate([quat_to_mat(cam_q).reshape(C, 9), cam_c], axis=1)
    g = _bcast_rows(tblC, ocT)
    R = [g[i] for i in range(9)]
    vx = points[:, 0][None] - g[9]
    vy = points[:, 1][None] - g[10]
    vz = points[:, 2][None] - g[11]
    ux = R[0] * vx + R[1] * vy + R[2] * vz
    uy = R[3] * vx + R[4] * vy + R[5] * vz
    uz = R[6] * vx + R[7] * vy + R[8] * vz
    xc, yc, zc, _ = _apply_subpose(problem, ux, uy, uz, sub_q, sub_t)
    u = jnp.stack([xc, yc, zc], -1)  # (K, L, 3)
    intr_cur = problem.intr if intr is None else intr
    intr_rows = jax.tree_util.tree_map(lambda a: a[problem.obs_intr.T], intr_cur)
    pix = cam.project_cam(intr_rows, u)
    uvT = jnp.moveaxis(problem.obs_uv, -1, 0)  # (2, L, K)
    return jnp.stack([pix[..., 0] - uvT[0].T, pix[..., 1] - uvT[1].T])


def _residuals_and_jacobians(problem: BAProblem, cam_q, cam_c, points,
                             dtheta=None, intr_param_idx=None):
    """r (2,K,L), J_c (2,6,K,L), J_l (2,3,K,L) — analytic chain rule in
    *observation-minor* layout. With `dtheta` (I, 4+DISTO_PARAMS) and a
    static `intr_param_idx` tuple, additionally returns J_t
    (2, I*len(idx), K, L): the shared-intrinsics Jacobian columns for the
    JOINT refinement (BundleAdjustment.hpp REFINE_INTRINSICS_* — the
    reference refines intrinsics inside the same Ceres problem).

    Only the intrinsic projection pix(x_cam) is differentiated with
    forward-mode autodiff (3 tangent basis vectors of a cheap elementwise
    2D function); the geometric part uses the closed-form factors
      d x_cam / d rot  = -[x_cam]_x   (left-multiplied so3 tangent)
      d x_cam / d c    = -R,   d x_cam / d X = R
    matching the reference's hand-written Jacobians
    (sfm/bundle/costfunctions/projection.hpp:14-30).

    Layout: every per-observation quantity is a small stack of (K, L)
    planes, never an (L, K, 2, 3)-style tensor — TPU tiles pad the two
    minor axes to (8, 128), so a trailing 3 burns 42x the vector lanes.
    The component form is 7x faster wall-clock for identical math.
    """
    L, K = problem.obs_cam.shape
    C = cam_q.shape[0]
    ocT = problem.obs_cam.T  # (K, L)
    # Broadcast per-camera values to observations — one-hot matmul for small
    # tables (a (C,)-table gather by a (K, L) index array costs ~4 ms on TPU
    # when the table changes every LM iteration), gather for large ones
    # (see _ONEHOT_BUDGET).
    tblC = jnp.concatenate([quat_to_mat(cam_q).reshape(C, 9), cam_c], axis=1)
    g = _bcast_rows(tblC, ocT)
    R = [g[i] for i in range(9)]  # R[3*i+j] = R_ij per observation
    vx = points[:, 0][None] - g[9]  # (K, L)
    vy = points[:, 1][None] - g[10]
    vz = points[:, 2][None] - g[11]
    ux = R[0] * vx + R[1] * vy + R[2] * vz
    uy = R[3] * vx + R[4] * vy + R[5] * vz
    uz = R[6] * vx + R[7] * vy + R[8] * vz
    # rig chain: linearize the projection at x_cam = R_sub x_frame + t_sub,
    # then fold R_sub into A so the geometric factors below stay written in
    # terms of x_frame (J_rot = -A_eff [x_frame]x, J_pt = A_eff R_frame).
    xc, yc, zc, Rs = _apply_subpose(problem, ux, uy, uz)
    u = jnp.stack([xc, yc, zc], -1)  # (K, L, 3) — boundary for project_cam

    oiT = problem.obs_intr.T
    if dtheta is None:
        intr_rows = jax.tree_util.tree_map(
            lambda a: a[oiT], problem.intr
        )
        pix, lin = jax.linearize(
            lambda xcam: cam.project_cam(intr_rows, xcam), u
        )
        eye3 = jnp.eye(3, dtype=u.dtype)
        Acols = [
            lin(jnp.broadcast_to(e, u.shape)) for e in eye3
        ]  # 3 x (K, L, 2)
        Jt_cols = None
    else:
        intr_cur = _intr_apply(problem.intr, dtheta)
        I = problem.intr.scale.shape[0]
        n_p = dtheta.shape[1]

        def fproj(xcam, dp):
            rows = jax.tree_util.tree_map(
                lambda a: a[oiT], _intr_apply(intr_cur, dp)
            )
            return cam.project_cam(rows, xcam)

        zero_dp = jnp.zeros((I, n_p), u.dtype)
        pix, lin2 = jax.linearize(fproj, u, zero_dp)
        eye3 = jnp.eye(3, dtype=u.dtype)
        zero_u = jnp.zeros_like(u)
        Acols = [
            lin2(jnp.broadcast_to(e, u.shape), zero_dp) for e in eye3
        ]
        lin = None
        Jt_cols = []
        for gi in range(I):
            for p in intr_param_idx:
                e = zero_dp.at[gi, p].set(1.0)
                Jt_cols.append(lin2(zero_u, e))  # (K, L, 2)
    A = [[Acols[i][..., r] for i in range(3)] for r in range(2)]  # A[r][i]
    if Rs is not None:  # A_eff = A @ R_sub
        A = [
            [
                A[r_][0] * Rs[0] + A[r_][1] * Rs[3] + A[r_][2] * Rs[6],
                A[r_][0] * Rs[1] + A[r_][1] * Rs[4] + A[r_][2] * Rs[7],
                A[r_][0] * Rs[2] + A[r_][1] * Rs[5] + A[r_][2] * Rs[8],
            ]
            for r_ in range(2)
        ]

    uvT = jnp.moveaxis(problem.obs_uv, -1, 0)  # (2, L, K)
    r_out = jnp.stack(
        [pix[..., 0] - uvT[0].T, pix[..., 1] - uvT[1].T]
    )  # (2, K, L)

    rot_rows, pt_rows = [], []
    for r_ in range(2):
        a0, a1, a2 = A[r_]
        # J_rot = -A [u]_x ; J_pt = A R
        rot_rows.append(
            jnp.stack(
                [-(a1 * uz - a2 * uy), -(-a0 * uz + a2 * ux), -(a0 * uy - a1 * ux)]
            )
        )
        pt_rows.append(
            jnp.stack(
                [
                    a0 * R[0] + a1 * R[3] + a2 * R[6],
                    a0 * R[1] + a1 * R[4] + a2 * R[7],
                    a0 * R[2] + a1 * R[5] + a2 * R[8],
                ]
            )
        )
    J_pt = jnp.stack(pt_rows)  # (2, 3, K, L)
    Jc = jnp.concatenate(
        [jnp.stack(rot_rows), -J_pt], axis=1
    )  # (2, 6, K, L); d x_cam/d c = -R
    if Jt_cols is None:
        return r_out, Jc, J_pt
    # (2, P, K, L): P = I * len(intr_param_idx) shared-intrinsic columns
    Jt = jnp.stack(
        [jnp.moveaxis(col, -1, 0) for col in Jt_cols], axis=1
    )
    return r_out, Jc, J_pt, Jt


def _quat_premul_mat(dq_mat, q):
    """Apply rotation-matrix increment to quaternion: R_new = dR R(q)."""
    return mat_to_quat(dq_mat @ quat_to_mat(q))


def _huber_weights(r, delta):
    """IRLS sqrt-weights for the Huber loss on the residual norm."""
    n = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(n <= delta, 1.0, jnp.sqrt(delta / n.clip(_EPS)))
    return w


def _sym3_inv(A):
    """Closed-form inverse of batched symmetric 3x3 matrices (adjugate /
    det). XLA's generic batched `linalg.inv` lowers to LU and costs ~16 ms
    for 10k blocks on v5e; this is pure elementwise VPU math (<1 ms)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    i00 = co_a * inv_det
    i01 = co_b * inv_det
    i02 = co_c * inv_det
    i11 = (a * f - c * c) * inv_det
    i12 = (b * c - a * e) * inv_det
    i22 = (a * d - b * b) * inv_det
    row0 = jnp.stack([i00, i01, i02], -1)
    row1 = jnp.stack([i01, i11, i12], -1)
    row2 = jnp.stack([i02, i12, i22], -1)
    return jnp.stack([row0, row1, row2], -2)


def _chol3(A):
    """Closed-form Cholesky of batched SPD 3x3 matrices (lower factor)."""
    z = jnp.zeros_like(A[..., 0, 0])
    l11 = jnp.sqrt(jnp.maximum(A[..., 0, 0], _EPS))
    l21 = A[..., 1, 0] / l11
    l31 = A[..., 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, _EPS))
    l32 = (A[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, _EPS))
    row0 = jnp.stack([l11, z, z], -1)
    row1 = jnp.stack([l21, l22, z], -1)
    row2 = jnp.stack([l31, l32, l33], -1)
    return jnp.stack([row0, row1, row2], -2)


def _sym3_inv_c(a, b, c, d, e, f):
    """Closed-form inverse of symmetric 3x3 given the six unique components
    (upper triangle: a=00, b=01, c=02, d=11, e=12, f=22) as same-shape
    arrays. Returns the six components of the inverse."""
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    return (
        co_a * inv_det,
        co_b * inv_det,
        co_c * inv_det,
        (a * f - c * c) * inv_det,
        (b * c - a * e) * inv_det,
        (a * d - b * b) * inv_det,
    )


def _chol3_c(a, b, c, d, e, f):
    """Closed-form lower Cholesky of SPD 3x3 from the six unique components
    (a=00, b=01, c=02, d=11, e=12, f=22). Returns (l11, l21, l31, l22,
    l32, l33) as same-shape arrays."""
    l11 = jnp.sqrt(jnp.maximum(a, _EPS))
    l21 = b / l11
    l31 = c / l11
    l22 = jnp.sqrt(jnp.maximum(d - l21 * l21, _EPS))
    l32 = (e - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(f - l31 * l31 - l32 * l32, _EPS))
    return l11, l21, l31, l22, l32, l33


class _SchurParts(NamedTuple):
    """Shared Schur-elimination pieces, observation-minor layout."""

    ocT: jnp.ndarray  # (K, L) camera index per observation
    g_c: jnp.ndarray  # (C, 6) camera gradient
    b: jnp.ndarray  # (C, 6) reduced RHS
    U_d: jnp.ndarray  # (C, 6, 6) damped camera diagonal blocks
    Vi: tuple  # 6 components of V^-1, each (L,)
    Vh: tuple  # (l11,l21,l31,l22,l32,l33) of chol(V^-1), each (L,)
    W: list  # 6x3 lists of (K, L) planes
    Y: list  # 6x3 lists of (K, L) planes, Y = W chol(V^-1)
    g_l: list  # 3 x (L,) landmark gradient


def _schur_prelude(problem, r, Jc, Jl, lam) -> _SchurParts:
    """Eliminate the landmark blocks and build everything both reduced-camera
    solvers share.

    All per-landmark block algebra (V, W, the chol(V^-1) elimination) is
    componentwise VPU math over (K, L) planes — the K=8 sublane / L-lane
    tiling is exact, where an (L,K,3,3) layout would pad every trailing 3 to
    128 lanes. Per-camera reductions go through _accum_cams (MXU one-hot
    contraction for small tables, scatter-add for large ones).
    """
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    mT = problem.obs_mask.T.astype(r.dtype)  # (K, L)
    ocT = problem.obs_cam.T  # (K, L)

    # Zero Jacobians of fixed parameters (makes them CONSTANT) + mask.
    live_cam = (~problem.cam_fixed).astype(r.dtype)[ocT] * mT  # (K, L)
    live_pt = (~problem.point_fixed).astype(r.dtype)[None] * mT  # (K, L)
    Jc = Jc * live_cam
    Jl = Jl * live_pt
    r = r * mT

    # Per-landmark blocks, summed over the K observations (sublane axis).
    # V (3x3 sym): six unique components, each (L,).
    def dotk(x, y):  # sum over r(2) and k -> (L,)
        return jnp.sum(x[0] * y[0] + x[1] * y[1], axis=0)

    Jl_c = [[Jl[r_, i] for i in range(3)] for r_ in range(2)]  # (K, L) planes
    JlT = lambda i: (Jl_c[0][i], Jl_c[1][i])
    V = {}
    for i in range(3):
        for j in range(i, 3):
            V[(i, j)] = dotk(JlT(i), JlT(j))
    g_l = [-jnp.sum(Jl[:, i] * r, axis=(0, 1)) for i in range(3)]  # 3 x (L,)

    # U: 21 unique components of J_c^T J_c per camera; g_c.
    iu = [(i, j) for i in range(6) for j in range(i, 6)]
    JJ = jnp.stack(
        [Jc[0, i] * Jc[0, j] + Jc[1, i] * Jc[1, j] for i, j in iu]
    )  # (21, K, L)
    Ucomp = _accum_cams(JJ, ocT, C)  # (C, 21)
    Jr = jnp.stack([Jc[0, i] * r[0] + Jc[1, i] * r[1] for i in range(6)])
    g_c = -_accum_cams(Jr, ocT, C)  # (C, 6)
    U = jnp.zeros((C, 6, 6), r.dtype)
    for n, (i, j) in enumerate(iu):
        U = U.at[:, i, j].set(Ucomp[:, n])
        if i != j:
            U = U.at[:, j, i].set(Ucomp[:, n])

    # LM damping (multiplicative on the diagonal, Marquardt style).
    dampV = 1.0 + lam
    Vd = {
        (i, j): V[(i, j)] * (dampV if i == j else 1.0) + (1e-9 if i == j else 0.0)
        for (i, j) in V
    }
    eyeU = jnp.eye(6, dtype=r.dtype)
    U_d = U + lam * (U * eyeU) + 1e-9 * eyeU

    Vi = _sym3_inv_c(
        Vd[(0, 0)], Vd[(0, 1)], Vd[(0, 2)], Vd[(1, 1)], Vd[(1, 2)], Vd[(2, 2)]
    )
    l11, l21, l31, l22, l32, l33 = _chol3_c(*Vi)  # V^-1 = Vh Vh^T (lower)

    # W (6x3 per obs): W[i][h] = sum_r Jc[r,i] * Jl[r,h]  (K, L) planes.
    W = [
        [Jc[0, i] * Jl[0, h] + Jc[1, i] * Jl[1, h] for h in range(3)]
        for i in range(6)
    ]
    # Y = W Vh (lower-triangular): Y[i][h] = sum_{j>=h} W[i][j] Vh[j][h]
    Y = [
        [
            W[i][0] * l11 + W[i][1] * l21 + W[i][2] * l31,
            W[i][1] * l22 + W[i][2] * l32,
            W[i][2] * l33,
        ]
        for i in range(6)
    ]

    # RHS: b = g_c - sum_lk accum(Y (Vh^T g_l)).
    gls = [
        l11 * g_l[0] + l21 * g_l[1] + l31 * g_l[2],
        l22 * g_l[1] + l32 * g_l[2],
        l33 * g_l[2],
    ]  # (L,) each — Vh^T g_l
    corr = jnp.stack(
        [
            Y[i][0] * gls[0][None] + Y[i][1] * gls[1][None] + Y[i][2] * gls[2][None]
            for i in range(6)
        ]
    )  # (6, K, L)
    b = g_c - _accum_cams(corr, ocT, C)

    return _SchurParts(
        ocT=ocT,
        g_c=g_c,
        b=b,
        U_d=U_d,
        Vi=Vi,
        Vh=(l11, l21, l31, l22, l32, l33),
        W=W,
        Y=Y,
        g_l=g_l,
    )


def _back_substitute(parts: _SchurParts, dx_cam):
    """dx_l = V^-1 (g_l - sum_k W^T dx_cam) given the camera step."""
    # NB small tables: dx_cam.T[i][ocT] gathers cost ~4 ms (tiny-table
    # gather after a dependent solve defeats the TPU gather lowering); the
    # one-hot matmul is ~10 us for identical math. _bcast_rows switches.
    dxc = _bcast_rows(dx_cam, parts.ocT)  # (6, K, L)
    W, Vi, g_l = parts.W, parts.Vi, parts.g_l
    t = [
        jnp.sum(sum(W[i][h] * dxc[i] for i in range(6)), axis=0)
        for h in range(3)
    ]  # 3 x (L,)
    rhs = [g_l[h] - t[h] for h in range(3)]
    ia, ib, ic, id_, ie, if_ = Vi
    return jnp.stack(
        [
            ia * rhs[0] + ib * rhs[1] + ic * rhs[2],
            ib * rhs[0] + id_ * rhs[1] + ie * rhs[2],
            ic * rhs[0] + ie * rhs[1] + if_ * rhs[2],
        ],
        axis=-1,
    )  # (L, 3)


def _schur_solve(problem, r, Jc, Jl, lam):
    """One damped Schur step via DENSE solve: (dx_cam (C,6), dx_pt (L,3)).

    The off-diagonal Schur term uses the factorization
    W V^-1 W^T = (W Vh)(W Vh)^T with Vh = chol(V^-1), so S_off = -B B^T is
    one (6C, 3KL)-contraction — symmetric PSD by construction. Suitable up
    to a few hundred cameras (ref: DENSE_SCHUR below 100 poses,
    BundleAdjustmentCeres.cpp:216-231); above that B is ~6C*3L floats and
    _schur_solve_pcg avoids materializing it.
    """
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    parts = _schur_prelude(problem, r, Jc, Jl, lam)

    # S_off = -B B^T with B[(c,i), (h,l)] = sum_k onehot * Y[i][h].
    Y18 = jnp.stack(
        [parts.Y[i][h] for i in range(6) for h in range(3)]
    )  # (18,K,L)
    oh_kl = jax.nn.one_hot(parts.ocT, C, dtype=r.dtype, axis=0)  # (C, K, L)
    # output order cihl keeps L as its own MINOR axis. SPMD form: contract
    # L via einsum so XLA psums the tiny (C,6,C,6) partials (a reshape
    # merging (3, L) would all-gather the whole 6C x 3L factor — see
    # _SPMD_FORMS); single-chip form: the merged-axis dot_general, ~3x
    # faster on the MXU.
    B = jnp.einsum("ckl,dkl->cdl", oh_kl, Y18, precision="highest")
    if _SPMD_FORMS:
        B6 = B.reshape(C, 6, 3, L)  # split of the LOCAL 18-axis only
        S_off = -jnp.einsum(
            "cihl,ejhl->ciej", B6, B6, precision="highest"
        ).reshape(C * 6, C * 6)
    else:
        Bm = B.reshape(C * 6, 3 * L)
        S_off = -jax.lax.dot_general(
            Bm, Bm, (((1,), (1,)), ((), ())), precision="highest"
        )
    D = jnp.einsum("cd,cij->cidj", jnp.eye(C, dtype=r.dtype), parts.U_d)
    S_mat = S_off + D.reshape(C * 6, C * 6)

    # Dense solve of the reduced camera system (6C x 6C).
    dx_cam = jax.scipy.linalg.solve(
        S_mat + 1e-8 * jnp.eye(C * 6, dtype=r.dtype),
        parts.b.reshape(C * 6),
        assume_a="pos",
    ).reshape(C, 6)

    dx_pt = _back_substitute(parts, dx_cam)
    return dx_cam, dx_pt


def _schur_solve_joint(problem, r, Jc, Jl, Jt, lam, colmask=None):
    """Damped Schur step of the JOINT pose/point/shared-intrinsics system:
    returns (dx_cam (C,6), dx_pt (L,3), dtheta (P,)).

    The reduced system gains P extra rows/cols (P <= ~10 shared intrinsic
    parameters): S = [[S_cc, S_ct], [S_ct^T, S_tt]] with every block
    eliminated against the landmark blocks exactly like S_cc — the TPU
    dense analog of Ceres keeping intrinsics inside the Schur problem
    (BundleAdjustmentCeres.cpp REFINE_INTRINSICS)."""
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    parts = _schur_prelude(problem, r, Jc, Jl, lam)
    mT = problem.obs_mask.T.astype(r.dtype)
    P = Jt.shape[1]
    Jt = Jt * mT  # (2, P, K, L)
    if colmask is not None:
        # traced per-parameter gate: a zeroed column + identity diagonal
        # row below makes the masked parameter's step exactly 0 — the
        # refine_pp / coarse-to-fine-disto policy becomes DATA, so every
        # joint solve shares ONE compiled program (three static variants
        # previously cost one relay compile + cache load each)
        Jt = Jt * colmask[None, :, None, None]
    live_cam = (~problem.cam_fixed).astype(r.dtype)[parts.ocT] * mT
    live_pt = (~problem.point_fixed).astype(r.dtype)[None] * mT
    Jc_m = Jc * live_cam
    Jl_m = Jl * live_pt
    r_m = r * mT

    # per-landmark intrinsics-point coupling W_t (P, 3, L)
    wth = [
        [
            jnp.sum(Jt[0, p] * Jl_m[0, h] + Jt[1, p] * Jl_m[1, h], axis=0)
            for h in range(3)
        ]
        for p in range(P)
    ]
    # U_t (P, P), g_t (P,)
    U_t = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.sum(Jt[0, p] * Jt[0, q] + Jt[1, p] * Jt[1, q])
                    for q in range(P)
                ]
            )
            for p in range(P)
        ]
    )
    g_t = -jnp.stack(
        [jnp.sum(Jt[0, p] * r_m[0] + Jt[1, p] * r_m[1]) for p in range(P)]
    )
    # W_ct (C, 6, P) camera-intrinsics coupling
    planes = jnp.stack(
        [
            Jc_m[0, i] * Jt[0, p] + Jc_m[1, i] * Jt[1, p]
            for i in range(6)
            for p in range(P)
        ]
    )  # (6P, K, L)
    W_ct = _accum_cams(planes, parts.ocT, C).reshape(C, 6, P)

    # eliminate landmarks: Y_t = W_t chol(V^-1)
    l11, l21, l31, l22, l32, l33 = parts.Vh
    Y_t = jnp.stack(
        [
            jnp.stack(
                [
                    wth[p][0] * l11 + wth[p][1] * l21 + wth[p][2] * l31,
                    wth[p][1] * l22 + wth[p][2] * l32,
                    wth[p][2] * l33,
                ]
            )
            for p in range(P)
        ]
    )  # (P, 3, L)
    Y_tm = Y_t.reshape(P, 3 * L)

    # B (6C, 3L) exactly as the dense camera solve builds it
    Y18 = jnp.stack(
        [parts.Y[i][h] for i in range(6) for h in range(3)]
    )  # (18, K, L)
    oh_kl = jax.nn.one_hot(parts.ocT, C, dtype=r.dtype, axis=0)
    B = jnp.einsum("ckl,dkl->cdl", oh_kl, Y18, precision="highest")
    Bm = B.reshape(C * 6, 3 * L)

    S_cc = -jax.lax.dot_general(
        Bm, Bm, (((1,), (1,)), ((), ())), precision="highest"
    )
    D = jnp.einsum("cd,cij->cidj", jnp.eye(C, dtype=r.dtype), parts.U_d)
    S_cc = S_cc + D.reshape(C * 6, C * 6)
    S_ct = W_ct.reshape(C * 6, P) - Bm @ Y_tm.T
    U_td = U_t + lam * (U_t * jnp.eye(P, dtype=r.dtype)) + 1e-9 * jnp.eye(
        P, dtype=r.dtype
    )
    S_tt = U_td - Y_tm @ Y_tm.T
    if colmask is not None:
        S_tt = S_tt + jnp.diag(1.0 - colmask)

    gls = [
        l11 * parts.g_l[0] + l21 * parts.g_l[1] + l31 * parts.g_l[2],
        l22 * parts.g_l[1] + l32 * parts.g_l[2],
        l33 * parts.g_l[2],
    ]
    b_t = g_t - Y_tm @ jnp.stack(gls).reshape(3 * L)

    S_full = jnp.block([[S_cc, S_ct], [S_ct.T, S_tt]])
    b_full = jnp.concatenate([parts.b.reshape(C * 6), b_t])
    dx = jax.scipy.linalg.solve(
        S_full + 1e-8 * jnp.eye(C * 6 + P, dtype=r.dtype),
        b_full,
        assume_a="pos",
    )
    dx_cam = dx[: C * 6].reshape(C, 6)
    dtheta = dx[C * 6 :]

    # back-substitution with the intrinsics correction:
    # dx_l = V^-1 (g_l - W_cl^T dx_cam - W_tl^T dtheta)
    dxc = _bcast_rows(dx_cam, parts.ocT)
    W, Vi, g_l = parts.W, parts.Vi, parts.g_l
    t = [
        jnp.sum(sum(W[i][h] * dxc[i] for i in range(6)), axis=0)
        + sum(wth[p][h] * dtheta[p] for p in range(P))
        for h in range(3)
    ]
    rhs = [g_l[h] - t[h] for h in range(3)]
    ia, ib, ic, id_, ie, if_ = Vi
    dx_pt = jnp.stack(
        [
            ia * rhs[0] + ib * rhs[1] + ic * rhs[2],
            ib * rhs[0] + id_ * rhs[1] + ie * rhs[2],
            ic * rhs[0] + ie * rhs[1] + if_ * rhs[2],
        ],
        axis=-1,
    )  # (L, 3)
    return dx_cam, dx_pt, dtheta


def _s_operator(parts: _SchurParts, C: int, dtype):
    """(S_apply, M_apply) — the matrix-free reduced-camera operator and
    its SCHUR_JACOBI preconditioner. Shared by the PCG solve and the
    memory-light covariance column solves.

    In the large-table regime the per-matvec camera transport runs as
    one-hot f32 MATMULS instead of gather + scatter-add: XLA lowers the
    0/1 dot without materializing the (K·L, C) one-hot, measured 4.1 vs
    13.8 ms per accumulation at 1,024 cams / 1.8M obs on v5e (the round-4
    camera-major re-layouts all LOST to the scatter — see _accum_cams —
    but the one-hot dot is the lowering that finally beats it). The dot's
    tree reduction + default-precision operand rounding puts ~1.5e-4
    relative noise on S·x, harmless INSIDE the preconditioned CG (tol
    1e-2, and LM gates steps on the exactly-evaluated cost); the prelude,
    RHS b, and back-substitution keep the exact scatter path."""
    Y, U_d, ocT = parts.Y, parts.U_d, parts.ocT

    # SCHUR_JACOBI preconditioner: exact diagonal blocks of S.
    iu = [(i, j) for i in range(6) for j in range(i, 6)]
    YY = jnp.stack(
        [sum(Y[i][h] * Y[j][h] for h in range(3)) for i, j in iu]
    )  # (21, K, L)
    YYc = _accum_cams(YY, ocT, C)  # (C, 21)
    Sd = U_d
    for n, (i, j) in enumerate(iu):
        Sd = Sd.at[:, i, j].add(-YYc[:, n])
        if i != j:
            Sd = Sd.at[:, j, i].add(-YYc[:, n])
    Sd = Sd + 1e-8 * jnp.eye(6, dtype=dtype)
    Minv = jnp.linalg.inv(Sd)  # (C, 6, 6) batched tiny inverses

    K, L = ocT.shape
    # the fast path's reshape MERGES the local K axis into L — under SPMD
    # that is exactly the all-gather-forcing pattern DESIGN §2 bans, so the
    # sharded trace keeps the (K, L)-separate gather/scatter forms
    fast = (C * K * L > _ONEHOT_BUDGET) and not _SPMD_FORMS
    if fast:
        idx_flat = ocT.reshape(-1)

        def bcast(x):  # (C, D) -> (D, K, L)
            oh = jax.nn.one_hot(idx_flat, C, dtype=x.dtype)  # (KL, C)
            return jax.lax.dot_general(
                x.T, oh, (((1,), (1,)), ((), ()))
            ).reshape(x.shape[1], K, L)

        def accum(planes):  # (D, K, L) -> (C, D)
            oh = jax.nn.one_hot(idx_flat, C, dtype=planes.dtype)
            D = planes.shape[0]
            return jax.lax.dot_general(
                planes.reshape(D, K * L), oh, (((1,), (0,)), ((), ()))
            ).T
    else:
        bcast = lambda x: _bcast_rows(x, ocT)  # noqa: E731
        accum = lambda planes: _accum_cams(planes, ocT, C)  # noqa: E731

    def S_apply(x):  # x: (C, 6)
        ux = jnp.einsum("cij,cj->ci", U_d, x, precision="highest")
        xo = bcast(x)  # (6, K, L)
        # th[h] = sum_{k,i} Y[i][h] * x_obs[i]  per landmark
        th = [
            jnp.sum(sum(Y[i][h] * xo[i] for i in range(6)), axis=0)
            for h in range(3)
        ]  # 3 x (L,)
        corr = jnp.stack(
            [
                Y[i][0] * th[0][None]
                + Y[i][1] * th[1][None]
                + Y[i][2] * th[2][None]
                for i in range(6)
            ]
        )  # (6, K, L)
        return ux - accum(corr)

    def M_apply(v):
        return jnp.einsum("cij,cj->ci", Minv, v, precision="highest")

    return S_apply, M_apply


def _schur_solve_pcg(problem, r, Jc, Jl, lam, cg_iters: int = 100,
                     cg_tol: float = 1e-2, loop: str = "while",
                     x_warm=None):
    """Matrix-free PCG on the reduced camera system S dx = b.

    Never materializes S (6C x 6C) or the (6C, 3L) elimination factor B —
    each matvec streams the observation table twice (broadcast + scatter),
    so memory stays O(K*L) planes regardless of camera count. This is the
    large-scene analog of the reference's ITERATIVE_SCHUR / SPARSE_SCHUR
    switch (BundleAdjustmentCeres.cpp:216-231), with the SCHUR_JACOBI
    block-diagonal preconditioner: because a landmark observes each camera
    at most once, diag_c(S) = U_d[c] - sum_{l,k: cam=c} Y_lk Y_lk^T exactly
    (no cross-observation pairs hit the same diagonal block).
    """
    L, K = problem.obs_mask.shape
    C = problem.cam_q.shape[0]
    parts = _schur_prelude(problem, r, Jc, Jl, lam)
    S_apply, M_apply = _s_operator(parts, C, r.dtype)

    b = parts.b
    bnorm2 = jnp.sum(b * b)
    tol2 = (cg_tol * cg_tol) * bnorm2 + 1e-30

    def cond(state):
        _, res, _, _, it = state
        return (jnp.sum(res * res) > tol2) & (it < cg_iters)

    def body(state):
        x, res, z, p, it = state
        Sp = S_apply(p)
        rz = jnp.sum(res * z)
        alpha = rz / jnp.sum(p * Sp).clip(_EPS)
        x = x + alpha * p
        res_n = res - alpha * Sp
        z_n = M_apply(res_n)
        beta = jnp.sum(res_n * z_n) / rz.clip(_EPS)
        return (x, res_n, z_n, p * beta + z_n, it + 1)

    if x_warm is None:
        x0 = jnp.zeros_like(b)
        res0 = b
    else:
        # Warm start from the previous LM iteration's accepted step: the
        # reduced systems of consecutive LM iterations share most of their
        # spectrum (same graph, slowly-moving linearization), so the prior
        # solution is a far better seed than 0 — one extra matvec for the
        # initial residual buys several CG iterations.
        x0 = x_warm
        res0 = b - S_apply(x_warm)
    z0 = M_apply(res0)
    state0 = (x0, res0, z0, z0, jnp.int32(0))
    if loop == "while":
        dx_cam, *_ = jax.lax.while_loop(cond, body, state0)
    else:
        # fixed-trip fori with convergence masking (no HLO While cond on
        # the host-round-trip axon tunnel; see ba_solve loop="unrolled")
        def fbody(_, state):
            active = cond(state)
            new = body(state)
            return jax.tree_util.tree_map(
                lambda a, b_: jnp.where(active, b_, a), state, new
            )

        dx_cam, *_ = jax.lax.fori_loop(0, cg_iters, fbody, state0)

    dx_pt = _back_substitute(parts, dx_cam)
    return dx_cam, dx_pt


def _cost(problem, cam_q, cam_c, points, huber_delta):
    r = _residuals(problem, cam_q, cam_c, points)  # (2, K, L)
    n = jnp.sqrt(r[0] * r[0] + r[1] * r[1])
    rho = jnp.where(
        n <= huber_delta, 0.5 * n * n, huber_delta * (n - 0.5 * huber_delta)
    )
    return jnp.sum(jnp.where(problem.obs_mask.T, rho, 0.0))


# Cameras above which ba_solve(solver="auto") switches from the dense
# reduced-camera solve to matrix-free PCG. The reference flips DENSE_SCHUR
# -> SPARSE_SCHUR at 100 poses (BundleAdjustmentCeres.cpp:216-231); our
# dense MXU solve stays profitable somewhat longer.
_DENSE_SCHUR_MAX_CAMS = 192


def ba_solve(
    problem: BAProblem,
    max_iters: int = 30,
    huber_delta_px: float = 4.0,
    lam0: float = 1e-4,
    lam_up: float = 4.0,
    lam_down: float = 0.25,
    rtol: float = 1e-6,
    solver: str = "auto",
    cg_iters: int = 100,
    cg_tol: float = 1e-2,
    loop: str = "while",
) -> BAResult:
    """Run the LM loop fully under jit. Shapes are static; iteration count is
    bounded by max_iters with converged iterations becoming no-ops.

    solver: "dense" (explicit 6Cx6C Cholesky), "pcg" (matrix-free
    preconditioned CG — O(K*L) memory, for large scenes), or "auto" (pick by
    camera count / elimination-factor size, static at trace time).
    loop: "while" (early exit via lax.while_loop) or "unrolled" (exactly
    max_iters straight-line iterations — use on runtimes where HLO While
    costs a host round-trip per iteration)."""

    C = problem.cam_q.shape[0]
    L = problem.points.shape[0]
    if solver == "auto":
        # B is (6C, 3L) f32 in the dense path; cap it at ~1.5 GB.
        b_bytes = 6 * C * 3 * L * 4
        solver = (
            "dense"
            if C <= _DENSE_SCHUR_MAX_CAMS and b_bytes <= (3 << 29)
            else "pcg"
        )
    if solver == "dense":
        schur = lambda *a, x_warm=None: _schur_solve(*a)
    elif solver == "pcg":
        cg_loop = "while" if loop == "while" else "fori"
        schur = lambda *a, x_warm=None: _schur_solve_pcg(
            *a, cg_iters=cg_iters, cg_tol=cg_tol, loop=cg_loop,
            x_warm=x_warm,
        )
    else:
        raise ValueError(f"unknown solver {solver!r}")

    huber = jnp.float32(huber_delta_px)
    cost0 = _cost(problem, problem.cam_q, problem.cam_c, problem.points, huber)

    def body(state):
        q, c, X, lam, cost, it, done, dxp = state
        r, Jc, Jl = _residuals_and_jacobians(problem, q, c, X)  # obs-minor
        n = jnp.sqrt(r[0] * r[0] + r[1] * r[1])  # (K, L)
        w = jnp.where(n <= huber, 1.0, jnp.sqrt(huber / n.clip(_EPS)))
        w = w * problem.obs_mask.T
        rw = r * w
        Jcw = Jc * w
        Jlw = Jl * w
        dx_cam, dx_pt = schur(problem, rw, Jcw, Jlw, lam, x_warm=dxp)

        dq = so3_exp(dx_cam[:, 0:3])
        q_new = _quat_premul_mat(dq, q)
        c_new = c + dx_cam[:, 3:6]
        X_new = X + dx_pt

        new_cost = _cost(problem, q_new, c_new, X_new, huber)
        ok = jnp.isfinite(new_cost) & (new_cost < cost)

        q = jnp.where(ok, q_new, q)
        c = jnp.where(ok, c_new, c)
        X = jnp.where(ok, X_new, X)
        lam = jnp.where(ok, lam * lam_down, lam * lam_up)
        lam = jnp.clip(lam, 1e-12, 1e8)
        improved = jnp.where(ok, (cost - new_cost) / cost.clip(_EPS), 1.0)
        done = done | (ok & (improved < rtol))
        cost = jnp.where(ok, new_cost, cost)
        return (q, c, X, lam, cost, it + 1, done, dx_cam)

    def cond(state):
        q, c, X, lam, cost, it, done, dxp = state
        return (it < max_iters) & (~done)

    state0 = (
        problem.cam_q,
        problem.cam_c,
        problem.points,
        jnp.float32(lam0),
        cost0,
        jnp.int32(0),
        jnp.bool_(False),
        jnp.zeros((C, 6), problem.cam_c.dtype),
    )
    if loop == "while":
        q, c, X, lam, cost, it, *_ = jax.lax.while_loop(cond, body, state0)
    elif loop == "unrolled":
        # Trace-time unroll: exactly max_iters LM iterations as ONE straight-
        # line device program — no HLO While. The axon TPU tunnel evaluates
        # While conditions with a host round-trip (measured: seconds per
        # iteration, while the same math unrolled runs at device speed), so
        # benches and latency-critical paths use this mode. Accept/reject
        # masking already makes converged iterations no-ops.
        state = state0
        for _ in range(max_iters):
            state = body(state)
        q, c, X, lam, cost, it, *_ = state
    else:
        raise ValueError(f"unknown loop mode {loop!r}")
    return BAResult(
        cam_q=q, cam_c=c, points=X, cost_initial=cost0, cost_final=cost, n_iters=it
    )


class JointBAResult(NamedTuple):
    cam_q: jnp.ndarray
    cam_c: jnp.ndarray
    points: jnp.ndarray
    intr: cam.Intrinsics
    cost_initial: jnp.ndarray
    cost_final: jnp.ndarray
    n_iters: jnp.ndarray


def ba_solve_joint(
    problem: BAProblem,
    max_iters: int = 20,
    huber_delta_px: float = 4.0,
    lam0: float = 1e-4,
    lam_up: float = 4.0,
    lam_down: float = 0.25,
    rtol: float = 1e-6,
    refine_focal: bool = True,
    refine_pp: bool = True,
    refine_disto: bool = True,
    disto_max_order: int | None = None,
    loop: str = "while",
    param_mask=None,
) -> JointBAResult:
    """LM over poses + points + SHARED intrinsics in one Schur problem.

    This is the reference's semantics — Ceres refines intrinsics inside
    every BA (BundleAdjustment.hpp REFINE_INTRINSICS_*). The alternating
    refine_intrinsics pass stalls when poses absorb distortion (the
    focal/depth 'dolly-zoom' coupling); the joint system does not. Dense
    reduced solve only (the intrinsics block adds <= 10 rows).

    param_mask: optional TRACED (4 + DISTO_PARAMS,) float gate over the
    packed parameter slots [fx, fy, cx, cy, disto...] — a masked slot's
    step is exactly 0. Lets callers vary the refine_pp / coarse-to-fine
    distortion policy per call without a recompile (the static
    refine_*/disto_max_order flags shape the program structurally)."""
    idx = []
    if refine_focal:
        idx += [0, 1]
    if refine_pp:
        idx += [2, 3]
    if refine_disto:
        n_d = cam.DISTO_PARAMS if disto_max_order is None else min(
            disto_max_order, cam.DISTO_PARAMS
        )
        idx += [4 + i for i in range(n_d)]
    intr_param_idx = tuple(idx)
    if not intr_param_idx:
        raise ValueError("nothing selected to refine — use ba_solve")
    I = problem.intr.scale.shape[0]
    n_p = 4 + cam.DISTO_PARAMS
    P = I * len(intr_param_idx)
    # scatter map from the packed P-vector back to (I, n_p)
    rows = np.repeat(np.arange(I), len(intr_param_idx))
    cols = np.tile(np.array(intr_param_idx), I)
    colmask = (
        None if param_mask is None
        else jnp.asarray(param_mask)[jnp.asarray(cols)]
    )

    huber = jnp.float32(huber_delta_px)
    zero_dt = jnp.zeros((I, n_p), jnp.float32)
    cost0 = _cost(problem, problem.cam_q, problem.cam_c, problem.points, huber)

    def body(state):
        q, c, X, dt, lam, cost, it, done = state
        r, Jc, Jl, Jt = _residuals_and_jacobians(
            problem, q, c, X, dtheta=dt, intr_param_idx=intr_param_idx
        )
        n = jnp.sqrt(r[0] * r[0] + r[1] * r[1])
        w = jnp.where(n <= huber, 1.0, jnp.sqrt(huber / n.clip(_EPS)))
        w = w * problem.obs_mask.T
        dx_cam, dx_pt, dth = _schur_solve_joint(
            problem, r * w, Jc * w, Jl * w, Jt * w, lam, colmask=colmask
        )
        dq = so3_exp(dx_cam[:, 0:3])
        q_new = _quat_premul_mat(dq, q)
        c_new = c + dx_cam[:, 3:6]
        X_new = X + dx_pt
        dt_new = dt.at[rows, cols].add(dth)

        def cost_with(dt_):
            rr = _residuals(
                problem, q_new, c_new, X_new,
                intr=_intr_apply(problem.intr, dt_),
            )
            nn = jnp.sqrt(rr[0] * rr[0] + rr[1] * rr[1])
            rho = jnp.where(
                nn <= huber, 0.5 * nn * nn, huber * (nn - 0.5 * huber)
            )
            return jnp.sum(jnp.where(problem.obs_mask.T, rho, 0.0))

        new_cost = cost_with(dt_new)
        ok = jnp.isfinite(new_cost) & (new_cost < cost)
        q = jnp.where(ok, q_new, q)
        c = jnp.where(ok, c_new, c)
        X = jnp.where(ok, X_new, X)
        dt = jnp.where(ok, dt_new, dt)
        lam = jnp.where(ok, lam * lam_down, lam * lam_up)
        lam = jnp.clip(lam, 1e-12, 1e8)
        improved = jnp.where(ok, (cost - new_cost) / cost.clip(_EPS), 1.0)
        done = done | (ok & (improved < rtol))
        cost = jnp.where(ok, new_cost, cost)
        return (q, c, X, dt, lam, cost, it + 1, done)

    def cond(state):
        *_, it, done = state
        return (it < max_iters) & (~done)

    state0 = (
        problem.cam_q, problem.cam_c, problem.points, zero_dt,
        jnp.float32(lam0), cost0, jnp.int32(0), jnp.bool_(False),
    )
    if loop == "while":
        q, c, X, dt, lam, cost, it, _ = jax.lax.while_loop(
            cond, body, state0
        )
    else:
        state = state0
        for _ in range(max_iters):
            state = body(state)
        q, c, X, dt, lam, cost, it, _ = state
    return JointBAResult(
        cam_q=q, cam_c=c, points=X, intr=_intr_apply(problem.intr, dt),
        cost_initial=cost0, cost_final=cost, n_iters=it,
    )


def refine_intrinsics(
    problem: BAProblem,
    cam_q,
    cam_c,
    points,
    refine_focal: bool = True,
    refine_pp: bool = True,
    refine_disto: bool = True,
    iters: int = 10,
    disto_max_order: int | None = None,
) -> cam.Intrinsics:
    """Gauss-Newton refinement of the intrinsic table with poses/points held.

    The reference jointly refines intrinsics inside Ceres
    (BundleAdjustment.hpp REFINE_INTRINSICS_* flags); here intrinsic blocks
    are polished in an alternating pass — each intrinsic has few parameters
    shared by many observations, so a dedicated small GN converges in a few
    steps and keeps the Schur camera system at 6 params/cam.

    Returns the refined Intrinsics pytree.
    """
    intr = problem.intr
    I = intr.scale.shape[0]
    # parameter packing: [d_fx, d_fy, d_cx, d_cy, d_disto(6)] per intrinsic
    n_p = 4 + cam.DISTO_PARAMS
    sel = np.zeros(n_p, np.float32)
    if refine_focal:
        sel[0:2] = 1
    if refine_pp:
        sel[2:4] = 1
    if refine_disto:
        if disto_max_order is None:
            sel[4:] = 1
        else:
            # coarse-to-fine: with thin support only the low-order radial
            # terms are observable — high-order coefficients overfit the
            # central cloud and CORRUPT undistortion at the image edges
            sel[4 : 4 + max(disto_max_order, 0)] = 1
    sel = jnp.asarray(sel)

    Rm = quat_to_mat(cam_q)[problem.obs_cam]
    c = cam_c[problem.obs_cam]
    X = jnp.broadcast_to(points[:, None, :], c.shape)
    x_cam = jnp.einsum("lkij,lkj->lki", Rm, X - c, precision="highest")
    m = problem.obs_mask.astype(x_cam.dtype)

    def apply_delta(dp):
        # dp: (I, n_p) masked by sel
        dp = dp * sel[None, :]
        return intr._replace(
            scale=intr.scale + dp[:, 0:2],
            offset=intr.offset + dp[:, 2:4],
            disto=intr.disto + dp[:, 4:],
        )

    def residuals(dp):
        it = apply_delta(dp)
        rows = jax.tree_util.tree_map(lambda a: a[problem.obs_intr], it)
        pix = cam.project_cam(rows, x_cam)
        return ((pix - problem.obs_uv) * m[..., None]).reshape(-1)

    dp = jnp.zeros((I, n_p))

    def gn(dp, _):
        r, lin = jax.linearize(residuals, dp)
        basis = jnp.eye(I * n_p).reshape(I * n_p, I, n_p)
        J = jax.vmap(lin)(basis)  # (P_total, n_res)
        JtJ = J @ J.T + 1e-6 * jnp.eye(I * n_p)
        g = J @ r
        step = -jnp.linalg.solve(JtJ, g).reshape(I, n_p)
        new = dp + step
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r * r)
        return jnp.where(better, new, dp), None

    dp, _ = jax.lax.scan(gn, dp, None, length=iters)
    return apply_delta(dp)


def pose_covariances_pcg(
    problem: BAProblem, cam_q, cam_c, points,
    cam_indices=None, cg_iters: int = 200,
) -> jnp.ndarray:
    """Memory-light covariance: diag blocks of S^-1 via matrix-free PCG
    column solves (6 per requested camera) — O(K*L) memory regardless of
    camera count, where the dense path's (C, C, 6, 6) is a wall past a
    few thousand cameras. Returns (len(cam_indices), 6, 6)."""
    C = cam_q.shape[0]
    L, K = problem.obs_mask.shape
    if cam_indices is None:
        cam_indices = jnp.arange(C)
    cam_indices = jnp.asarray(cam_indices)

    r, Jc, Jl = _residuals_and_jacobians(problem, cam_q, cam_c, points)
    mT = problem.obs_mask.T.astype(r.dtype)
    parts = _schur_prelude(problem, r, Jc, Jl, jnp.float32(0.0))
    S_apply, M_apply = _s_operator(parts, C, r.dtype)

    def solve_col(ci, j):
        e = jnp.zeros((C, 6), r.dtype).at[ci, j].set(1.0)

        def body(_, state):
            x, res, z, p = state
            Sp = S_apply(p) + 1e-6 * p
            rz = jnp.sum(res * z)
            alpha = rz / jnp.sum(p * Sp).clip(_EPS)
            x = x + alpha * p
            res_n = res - alpha * Sp
            z_n = M_apply(res_n)
            beta = jnp.sum(res_n * z_n) / rz.clip(_EPS)
            return (x, res_n, z_n, p * beta + z_n)

        z0 = M_apply(e)
        x, *_ = jax.lax.fori_loop(
            0, cg_iters, body, (jnp.zeros_like(e), e, z0, z0)
        )
        return x[ci]  # (6,) the diagonal block's column j at camera ci

    def per_cam(ci):
        return jnp.stack(
            [solve_col(ci, j) for j in range(6)], axis=-1
        )  # (6, 6)

    blocks = jax.lax.map(per_cam, cam_indices)
    n_obs = jnp.sum(problem.obs_mask)
    dof = jnp.maximum(2.0 * n_obs - 6.0 * C - 3.0 * L, 1.0)
    sigma2 = jnp.sum((r * mT) ** 2) / dof
    return sigma2 * 0.5 * (blocks + jnp.swapaxes(blocks, -1, -2))


def pose_covariances(problem: BAProblem, cam_q, cam_c, points) -> jnp.ndarray:
    """Per-camera 6x6 pose covariance from the (undamped) reduced camera
    system: diag blocks of S^-1 scaled by the residual variance.

    TPU-native counterpart of the reference's uncertainty computation
    (ref: src/software/utils/main_computeUncertainty.cpp on UncertaintyTE —
    covariance via Schur-complement inverse). Returns (C, 6, 6). Dense
    (C, C, 6, 6) assembly — use `pose_covariances_pcg` past ~2000 cameras.
    """
    r, Jc, Jl = _residuals_and_jacobians(problem, cam_q, cam_c, points)
    # this cold path keeps the original landmark-major block algebra: adapt
    # from the hot path's observation-minor layout
    r = jnp.transpose(r, (2, 1, 0))  # (L, K, 2)
    Jc = jnp.transpose(Jc, (3, 2, 0, 1))  # (L, K, 2, 6)
    Jl = jnp.transpose(Jl, (3, 2, 0, 1))  # (L, K, 2, 3)
    m = problem.obs_mask
    C = cam_q.shape[0]
    L, K = m.shape

    Jc = Jc * (~problem.cam_fixed)[problem.obs_cam][..., None, None]
    Jl = Jl * (~problem.point_fixed)[:, None, None, None]
    Jc = Jc * m.astype(r.dtype)[..., None, None]
    Jl = Jl * m.astype(r.dtype)[..., None, None]

    V = jnp.einsum("lkri,lkrj->lij", Jl, Jl) + 1e-8 * jnp.eye(3)
    W = jnp.einsum("lkri,lkrj->lkij", Jc, Jl)
    Uc_blk = jnp.einsum("lkri,lkrj->lkij", Jc, Jc)
    flat_cam = problem.obs_cam.reshape(-1)
    U = jnp.zeros((C, 6, 6), r.dtype).at[flat_cam].add(Uc_blk.reshape(-1, 6, 6))

    V_inv = _sym3_inv(V)
    Y = jnp.einsum("lkij,ljh->lkih", W, V_inv)
    pair = jnp.einsum("lkih,lmjh->lkmij", Y, W)
    ci = jnp.broadcast_to(problem.obs_cam[:, :, None], (L, K, K)).reshape(-1)
    cj = jnp.broadcast_to(problem.obs_cam[:, None, :], (L, K, K)).reshape(-1)
    S = jnp.zeros((C, C, 6, 6), r.dtype).at[ci, cj].add(-pair.reshape(-1, 6, 6))
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U)
    S_mat = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    # fixed cameras have empty rows — regularize so the inverse exists.
    # NOTE: with no cam_fixed gauge (7-dof similarity nullspace) the result
    # is only defined up to that regularization — fix >= 1 pose for
    # meaningful absolute covariances (as UncertaintyTE does).
    S_mat = S_mat + 1e-6 * jnp.eye(C * 6, dtype=r.dtype)
    S_inv = jnp.linalg.inv(S_mat)
    S_inv = 0.5 * (S_inv + S_inv.T)  # enforce symmetry lost to f32

    # residual variance (2 dof per obs, 6C + 3L params)
    n_obs = jnp.sum(m)
    dof = jnp.maximum(2.0 * n_obs - 6.0 * C - 3.0 * L, 1.0)
    sigma2 = jnp.sum((r * m[..., None]) ** 2) / dof
    blocks = S_inv.reshape(C, 6, C, 6)
    return sigma2 * jnp.stack([blocks[i, :, i, :] for i in range(C)])


def refine_rig_subposes(
    problem: BAProblem,
    cam_q,
    cam_c,
    points,
    iters: int = 8,
    huber_delta_px: float = 4.0,
) -> tuple:
    """Gauss-Newton refinement of the rig sub-poses with frames/points held.

    Each sub-pose has 6 parameters shared by many observations, so a small
    dedicated GN converges in a few steps and keeps the main Schur system at
    6 params per frame (the alternating half of rig_solve; ref: rig costs in
    BundleAdjustmentCeres.cpp:38-140 refine sub-poses jointly — alternation
    reaches the same optimum for the heavily-overdetermined rig problem).
    Sub-pose 0 is the identity and is never moved. Returns (sub_q, sub_t).
    """
    if problem.sub_q is None:
        raise ValueError("problem has no rig sub-poses")
    S = problem.sub_q.shape[0]
    huber = jnp.float32(huber_delta_px)
    mT = problem.obs_mask.T
    live = jnp.concatenate(
        [jnp.zeros((1,), problem.sub_t.dtype), jnp.ones((S - 1,), problem.sub_t.dtype)]
    )  # freeze identity sub-pose 0

    def params_to_subs(dp):  # dp (S, 6) tangent
        dp = dp * live[:, None]
        dq = so3_exp(dp[:, :3])
        return _quat_premul_mat(dq, problem.sub_q), problem.sub_t + dp[:, 3:]

    def residuals(dp):
        sq, st = params_to_subs(dp)
        r = _residuals(problem, cam_q, cam_c, points, sub_q=sq, sub_t=st)
        n = jnp.sqrt(r[0] * r[0] + r[1] * r[1])
        w = jnp.where(n <= huber, 1.0, jnp.sqrt(huber / n.clip(_EPS))) * mT
        return (r * w).reshape(-1)

    dp = jnp.zeros((S, 6), problem.sub_t.dtype)

    def gn(dp, _):
        r, lin = jax.linearize(residuals, dp)
        basis = jnp.eye(S * 6, dtype=dp.dtype).reshape(S * 6, S, 6)
        J = jax.vmap(lin)(basis)  # (6S, n_res)
        JtJ = J @ J.T + 1e-6 * jnp.eye(S * 6, dtype=dp.dtype)
        g = J @ r
        step = -jnp.linalg.solve(JtJ, g).reshape(S, 6)
        new = dp + step
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r * r)
        return jnp.where(better, new, dp), None

    dp, _ = jax.lax.scan(gn, dp, None, length=iters)
    return params_to_subs(dp)


def rig_solve(
    problem: BAProblem,
    rounds: int = 10,
    max_iters: int = 15,
    solver: str = "auto",
) -> tuple:
    """Alternating rig bundle adjustment: frame poses + points via the Schur
    LM (sub-poses held), then sub-pose GN (frames/points held), repeated.

    The alternation converges linearly (~0.5x residual per round, measured)
    because sub-pose translation couples with the frame centers; rig
    calibration is a cold path, so rounds=10 (sub-millimeter at unit
    baseline) is the default trade.

    Returns (BAResult, sub_q, sub_t). The BAResult carries the final frame
    poses/points evaluated against the final sub-poses."""
    if problem.sub_q is None:
        raise ValueError("problem has no rig sub-poses")
    res = None
    for _ in range(rounds):
        res = ba_solve(problem, max_iters=max_iters, solver=solver)
        problem = problem._replace(
            cam_q=res.cam_q, cam_c=res.cam_c, points=res.points
        )
        sq, st = refine_rig_subposes(problem, res.cam_q, res.cam_c, res.points)
        problem = problem._replace(sub_q=sq, sub_t=st)
    res = ba_solve(problem, max_iters=max_iters, solver=solver)
    return res, problem.sub_q, problem.sub_t


def rms_reprojection_error(problem: BAProblem, cam_q, cam_c, points) -> jnp.ndarray:
    r = _residuals(problem, cam_q, cam_c, points)  # (2, K, L)
    sq = r[0] * r[0] + r[1] * r[1]
    m = problem.obs_mask.T
    return jnp.sqrt(jnp.sum(jnp.where(m, sq, 0.0)) / jnp.sum(m).clip(1))
