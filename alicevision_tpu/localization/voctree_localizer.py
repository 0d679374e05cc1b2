"""Retrieval-based localization + rig localization.

TPU-native counterpart of the reference's VoctreeLocalizer
(ref: src/aliceVision/localization/VoctreeLocalizer.hpp:34-153 — vocabulary
tree retrieval of similar database views, 2D-3D matching against the
landmarks those views observe, P3P ACRANSAC, pose refine) and rig
resection (ref: localization/rigResection.cpp — non-central PnP over the
rig's cameras with known sub-poses).

Design: retrieval is one bow-vector quantization + one tf-idf matmul; the
2D-3D matching is a brute-force MXU matmul restricted to the retrieved
views' observations; the rig resection generates frame-pose hypotheses
with per-camera P3P and scores them over ALL cameras' correspondences
(consensus across the rig replaces OpenGV's GP3P minimal solver), then a
jitted 6-parameter GN polishes the frame pose on the inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import robust
from ..geometry.rotations import so3_exp
from ..matching.descriptor_matching import match_bruteforce
from ..matching.voctree import (
    VocTree,
    VocTreeDatabase,
    bow_vector,
    build_database,
    build_voctree,
)
from .localizer import LocalizationResult


class VoctreeLocalizer:
    """Scene database: vocabulary tree over landmark observation
    descriptors + per-view inverted index of (landmark, descriptor)."""

    def __init__(
        self,
        points: np.ndarray,  # (L, 3)
        obs_landmark: np.ndarray,  # (O,)
        obs_view: np.ndarray,  # (O,)
        obs_desc: np.ndarray,  # (O, D) descriptor of each observation
        branching: int = 8,
        depth: int = 2,
        seed: int = 0,
        max_train: int = 20000,
    ):
        self.points = np.asarray(points)
        self.obs_landmark = np.asarray(obs_landmark)
        self.obs_view = np.asarray(obs_view)
        self.obs_desc = np.asarray(obs_desc, np.float32)
        self.view_ids = np.unique(self.obs_view)

        key = jax.random.PRNGKey(seed)
        train = self.obs_desc
        if len(train) > max_train:
            sel = np.random.RandomState(seed).choice(
                len(train), max_train, replace=False
            )
            train = train[sel]
        self.tree: VocTree = build_voctree(
            key, jnp.asarray(train), n_children=branching, n_levels=depth
        )
        bows = []
        self._view_obs = {}
        for v in self.view_ids:
            rows = np.nonzero(self.obs_view == v)[0]
            self._view_obs[int(v)] = rows
            d = jnp.asarray(self.obs_desc[rows])
            bows.append(bow_vector(self.tree, d, jnp.ones(len(rows), bool)))
        self.db: VocTreeDatabase = build_database(self.tree, jnp.stack(bows))

    def retrieve(self, query_desc: np.ndarray, top_k: int = 4) -> np.ndarray:
        """Most similar database views for a query image (view ids)."""
        bow = bow_vector(
            self.tree,
            jnp.asarray(query_desc, jnp.float32),
            jnp.ones(len(query_desc), bool),
        )
        tf = bow / jnp.sum(bow).clip(1.0)
        v = tf * self.db.idf
        v = v / jnp.linalg.norm(v).clip(1e-12)
        sim = self.db.tfidf @ v
        k = min(top_k, len(self.view_ids))
        _, idx = jax.lax.top_k(sim, k)
        return self.view_ids[np.asarray(idx)]

    def localize(
        self,
        key: jax.Array,
        query_desc: np.ndarray,
        query_norm: np.ndarray,  # (N, 2) undistorted normalized coords
        focal_px: float,
        im_size: tuple,
        top_k: int = 4,
        ratio: float = 0.85,
        min_inliers: int = 12,
        n_hyps: int = 256,
        max_error_px: float = 4.0,
    ) -> LocalizationResult:
        views = self.retrieve(query_desc, top_k)
        rows = np.concatenate([self._view_obs[int(v)] for v in views])
        cand_desc = self.obs_desc[rows]
        cand_lm = self.obs_landmark[rows]

        m = match_bruteforce(
            jnp.asarray(query_desc, jnp.float32),
            jnp.asarray(cand_desc),
            jnp.ones(len(query_desc), bool),
            jnp.ones(len(cand_desc), bool),
            ratio=ratio,
            cross_check=False,
        )
        idx2 = np.asarray(m.idx2)
        sel = np.nonzero(idx2 >= 0)[0]
        if len(sel) < min_inliers:
            return LocalizationResult(np.eye(3), np.zeros(3), 0, False)
        # de-duplicate: several query features may hit obs of the same
        # landmark; keep one (query, landmark) pair each
        lm = cand_lm[idx2[sel]]
        _, first = np.unique(
            np.stack([sel, lm]), axis=1, return_index=True
        )
        keep = np.unique(first)
        world = self.points[lm[keep]]
        obs = np.asarray(query_norm)[sel[keep]]

        n = len(world)
        cap = 1 << int(np.ceil(np.log2(max(n, 32))))
        world_p = np.pad(world, ((0, cap - n), (0, 0)))
        obs_p = np.pad(obs, ((0, cap - n), (0, 0)))
        valid = np.zeros(cap, bool)
        valid[:n] = True
        rp = robust.robust_resection_p3p(
            key,
            jnp.asarray(world_p, jnp.float32),
            jnp.asarray(obs_p, jnp.float32),
            focal_px,
            im_size,
            valid=jnp.asarray(valid),
            n_hyps=n_hyps,
            max_error_px=max_error_px,
        )
        ni = int(rp.n_inliers)
        if ni < min_inliers:
            return LocalizationResult(np.eye(3), np.zeros(3), ni, False)
        R = np.asarray(rp.R)
        return LocalizationResult(R, -R.T @ np.asarray(rp.t), ni, True)


class RigLocalizationResult(NamedTuple):
    R_frame: np.ndarray  # (3, 3) world->frame
    c_frame: np.ndarray  # (3,)
    n_inliers: int
    success: bool


def _frame_from_view(R_v, c_v, R_s, t_s):
    """Invert the rig chain: R_f = R_s^T R_v, c_f = c_v + R_f^T R_s^T t_s."""
    R_f = R_s.T @ R_v
    return R_f, c_v + R_f.T @ (R_s.T @ t_s)


@jax.jit
def _rig_residuals(params, R0, c0, world, obs, sub_R, sub_t, sub_idx, valid):
    """Reprojection residuals of all rig correspondences at frame pose
    exp(params[:3]) R0, c0 + params[3:]. Normalized-plane units."""
    dR = so3_exp(params[:3][None])[0]
    R_f = dR @ R0
    c_f = c0 + params[3:]
    Rs = sub_R[sub_idx]
    ts = sub_t[sub_idx]
    xf = jnp.einsum("ij,nj->ni", R_f, world - c_f)
    xc = jnp.einsum("nij,nj->ni", Rs, xf) + ts
    z = jnp.where(jnp.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
    pix = xc[:, :2] / z[:, None]
    r = (pix - obs) * valid[:, None]
    return r, z


def rig_resection(
    key: jax.Array,
    world_per_cam: list,  # [(N_k, 3)] 3D matches of camera k
    obs_per_cam: list,  # [(N_k, 2)] normalized undistorted obs
    sub_R: np.ndarray,  # (S, 3, 3) known rig sub-poses
    sub_t: np.ndarray,  # (S, 3)
    focal_px: float,
    im_size: tuple,
    min_inliers: int = 12,
    n_hyps: int = 256,
    max_error_px: float = 4.0,
    gn_iters: int = 10,
) -> RigLocalizationResult:
    """Localize the rig FRAME from per-camera 2D-3D correspondences with
    known sub-poses (rigResection.cpp analog; consensus over the whole rig
    replaces the non-central GP3P minimal solver)."""
    S = len(world_per_cam)
    sub_R = np.asarray(sub_R)
    sub_t = np.asarray(sub_t)

    # flatten all correspondences once (for cross-camera scoring / GN)
    world = np.concatenate([np.asarray(w) for w in world_per_cam])
    obs = np.concatenate([np.asarray(o) for o in obs_per_cam])
    sub_idx = np.concatenate(
        [np.full(len(world_per_cam[k]), k) for k in range(S)]
    )
    n = len(world)
    if n < min_inliers:
        return RigLocalizationResult(np.eye(3), np.zeros(3), 0, False)
    thr = max_error_px / focal_px

    # frame-pose hypotheses from per-camera robust P3P
    cands = []
    for k in range(S):
        wk = np.asarray(world_per_cam[k])
        ok = np.asarray(obs_per_cam[k])
        if len(wk) < 4:
            continue
        cap = 1 << int(np.ceil(np.log2(max(len(wk), 32))))
        valid = np.zeros(cap, bool)
        valid[: len(wk)] = True
        key, sub = jax.random.split(key)
        rp = robust.robust_resection_p3p(
            sub,
            jnp.asarray(np.pad(wk, ((0, cap - len(wk)), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(ok, ((0, cap - len(ok)), (0, 0))), jnp.float32),
            focal_px,
            im_size,
            valid=jnp.asarray(valid),
            n_hyps=n_hyps // max(S, 1),
            max_error_px=max_error_px,
        )
        if int(rp.n_inliers) >= 4:
            R_v = np.asarray(rp.R)
            c_v = -R_v.T @ np.asarray(rp.t)
            cands.append(_frame_from_view(R_v, c_v, sub_R[k], sub_t[k]))
    if not cands:
        return RigLocalizationResult(np.eye(3), np.zeros(3), 0, False)

    # score every frame candidate over ALL cameras' correspondences
    w_j = jnp.asarray(world, jnp.float32)
    o_j = jnp.asarray(obs, jnp.float32)
    si = jnp.asarray(sub_idx)
    sR = jnp.asarray(sub_R, jnp.float32)
    st = jnp.asarray(sub_t, jnp.float32)
    ones = jnp.ones(n, jnp.float32)
    best = None
    for R_f, c_f in cands:
        r, z = _rig_residuals(
            jnp.zeros(6, jnp.float32),
            jnp.asarray(R_f, jnp.float32),
            jnp.asarray(c_f, jnp.float32),
            w_j, o_j, sR, st, si, ones,
        )
        err = np.asarray(jnp.linalg.norm(r, axis=-1))
        inl = (err < thr) & (np.asarray(z) > 0)
        if best is None or inl.sum() > best[0]:
            best = (int(inl.sum()), R_f, c_f, inl)
    ni, R_f, c_f, inl = best
    if ni < min_inliers:
        return RigLocalizationResult(np.eye(3), np.zeros(3), ni, False)

    # GN polish of the 6-dof frame pose on the inliers
    vmask = jnp.asarray(inl, jnp.float32)
    R0 = jnp.asarray(R_f, jnp.float32)
    c0 = jnp.asarray(c_f, jnp.float32)

    def res_fn(p):
        r, _ = _rig_residuals(p, R0, c0, w_j, o_j, sR, st, si, vmask)
        return r.reshape(-1)

    p = jnp.zeros(6, jnp.float32)
    for _ in range(gn_iters):
        r, lin = jax.linearize(res_fn, p)
        J = jax.vmap(lin)(jnp.eye(6, dtype=jnp.float32))  # (6, 2n)
        JtJ = J @ J.T + 1e-9 * jnp.eye(6)
        g = J @ r
        step = -jnp.linalg.solve(JtJ, g)
        p_new = p + step
        if float(jnp.sum(res_fn(p_new) ** 2)) < float(jnp.sum(r * r)):
            p = p_new
    dR = np.asarray(so3_exp(p[:3][None]))[0]
    R_out = dR @ np.asarray(R_f)
    c_out = np.asarray(c_f) + np.asarray(p[3:])

    # recount inliers at the polished pose
    r, z = _rig_residuals(
        jnp.zeros(6, jnp.float32),
        jnp.asarray(R_out, jnp.float32),
        jnp.asarray(c_out, jnp.float32),
        w_j, o_j, sR, st, si, ones,
    )
    err = np.asarray(jnp.linalg.norm(r, axis=-1))
    ni = int(((err < thr) & (np.asarray(z) > 0)).sum())
    return RigLocalizationResult(R_out, c_out, ni, True)
