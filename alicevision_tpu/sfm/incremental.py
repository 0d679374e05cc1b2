"""Incremental structure-from-motion engine.

TPU-native re-design of the reference's sequential reconstruction engine
(ref: src/aliceVision/sfm/pipeline/sequential/ReconstructionEngine_sequentialSfM.cpp
:174-231 process, :254 tracks fusion, :407-520 incremental loop;
params .hpp:41-110). The control flow (which view next, when to BA) stays on
the host; every numeric step is a batched jit kernel:

  * initial pair: AC-RANSAC essential + cheirality on the pair's common
    tracks (makeInitialPair3D, .hpp:231);
  * resection: robust P3P + Gauss-Newton refit (ACRANSAC localizer, .hpp:71);
  * triangulation: masked N-view DLT over the (T, K) track table with
    reprojection / angle / depth gates (sfmTriangulation.cpp);
  * bundle adjustment: the Schur LM solver over the *full fixed-capacity*
    problem with growing validity masks — one XLA compile for the whole
    reconstruction, no shape-driven retraces.

Operating point mirrors the reference defaults: BA after every added group,
outlier removal at 4px, min triangulation angle 3 deg
(ReconstructionEngine_sequentialSfM.hpp:60-99).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import camera as cam
from .. import geometry as geo
from .. import robust
from .. import multiview as mv
from ..tracks.builder import Tracks
from . import ba as ba_mod


@dataclasses.dataclass
class IncrementalConfig:
    max_reproj_px: float = 4.0  # outlier gate (hpp:96 maxReprojectionError)
    min_angle_deg: float = 3.0  # triangulation angle gate (hpp:88)
    min_angle_init_deg: float = 5.0  # initial pair baseline gate (hpp:86)
    # The reference's localizerEstimatorError defaults to INFINITY and lets
    # AC-RANSAC adapt the threshold (ReconstructionEngine_sequentialSfM.hpp
    # :70) — a finite cap here would reject resections whose residuals are
    # inflated by not-yet-refined intrinsics (e.g. unmodelled distortion).
    resection_max_error_px: float = 1e6
    n_ransac_hyps: int = 256
    group_add: int = 30  # BA group size after warmup (hpp:60)
    ba_max_outliers: int = 50  # re-BA while outliers >= this (hpp:96)
    max_track_obs: int = 16  # K bucket for triangulation/BA tables
    ba_max_iters: int = 20
    min_track_inliers_resection: int = 12
    min_pts_init: int = 50
    seed: int = 0
    # Local BA (ref: useLocalBundleAdjustment + graph distance limit,
    # ReconstructionEngine_sequentialSfM.hpp): above this many posed views,
    # cameras beyond local_ba_distance covisibility hops from the newly
    # added views are held constant during BA.
    local_ba_min_views: int = 50
    local_ba_distance: int = 1
    # LO-RANSAC per-track triangulation (ref: sfm/pipeline/expanding/
    # SfmTriangulation.cpp via NViewsTriangulationLORansac.hpp:48) — view
    # pairs voted by the whole track, masked N-view refit on the inliers.
    # Costs one extra batched pass; worthwhile when matches carry outliers.
    robust_triangulation: bool = False
    # Pyramid-coverage scoring (ref: computeCandidateImageScore,
    # ReconstructionEngine_sequentialSfM.cpp:1453-1473; params .hpp:75-76):
    # score = sum over levels of (#distinct occupied grid cells) * 2^(D-1-l)
    # with grid width base^(l+1). Rewards spatial spread, not raw counts.
    pyramid_base: int = 2
    pyramid_depth: int = 5
    # Refine the shared intrinsics (focal/pp/disto) whenever the posed-view
    # count doubles (ref refines intrinsics inside every Ceres BA,
    # BundleAdjustment.hpp REFINE_INTRINSICS_*; doubling cadence bounds the
    # extra cost while still correcting early focal error).
    refine_intrinsics: bool = True
    # Initial pair: try the top-N candidate pairs and keep the best
    # angle x coverage score (ref: best-pair selection at .cpp:1414-1424)
    # instead of first-success.
    init_pair_candidates: int = 10


class IncrementalResult:
    def __init__(self, n_views):
        self.pose_R = np.zeros((n_views, 3, 3))
        self.pose_c = np.zeros((n_views, 3))
        self.posed = np.zeros(n_views, bool)
        self.points = None  # (T, 3)
        self.point_valid = None  # (T,)
        self.history: list = []


class IncrementalSfM:
    """Drives the reconstruction from tracks + per-view features."""

    def __init__(
        self,
        tracks: Tracks,
        features_xy: dict,
        intr_table: cam.Intrinsics,
        view_intrinsic: np.ndarray,
        image_sizes: np.ndarray,
        config: IncrementalConfig = IncrementalConfig(),
    ):
        self.cfg = config
        self.tracks = tracks
        self.view_intrinsic = np.asarray(view_intrinsic, np.int32)
        self.image_sizes = np.asarray(image_sizes)
        self.intr_np = jax.tree_util.tree_map(np.asarray, intr_table)
        self.n_views = len(view_intrinsic)
        self.T = tracks.n_tracks
        self.key = jax.random.PRNGKey(config.seed)

        # Flat observation SoA + pixel coords.
        self.obs_track = tracks.track_ids
        self.obs_view = tracks.views
        O = len(self.obs_track)
        self.obs_uv = np.zeros((O, 2), np.float32)
        for v, xy in features_xy.items():
            sel = self.obs_view == v
            self.obs_uv[sel] = np.asarray(xy)[tracks.features[sel]]

        # Undistorted normalized coords per observation (for E/P3P).
        intr_rows = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[self.view_intrinsic[self.obs_view]], intr_table
        )
        p = cam.ima2cam(intr_rows, jnp.asarray(self.obs_uv))
        self.obs_norm = np.asarray(
            cam.remove_distortion(intr_rows.disto_kind, intr_rows.disto, p)
        )

        # (T, K) bucketed table of observation indices — vectorized ranking
        # (stable sort + group-offset subtraction; a Python loop over tracks
        # is minutes of interpreter time at ETH3D scale).
        K = config.max_track_obs
        order = np.argsort(self.obs_track, kind="stable")
        sorted_t = self.obs_track[order]
        bounds = np.searchsorted(sorted_t, np.arange(self.T + 1))
        slot = np.arange(O) - bounds[sorted_t]
        keep = slot < K
        self.tbl_obs = np.zeros((self.T, K), np.int64)
        self.tbl_mask = np.zeros((self.T, K), bool)
        self.tbl_obs[sorted_t[keep], slot[keep]] = order[keep]
        self.tbl_mask[sorted_t[keep], slot[keep]] = True
        self.tbl_view = np.where(self.tbl_mask, self.obs_view[self.tbl_obs], 0)

        # per-view list of observations (for resection/scoring) — one sort,
        # then split (O(V * O) nonzero scans would dominate at scale).
        vorder = np.argsort(self.obs_view, kind="stable")
        vbounds = np.searchsorted(self.obs_view[vorder], np.arange(self.n_views + 1))
        self.view_obs = [
            vorder[vbounds[v] : vbounds[v + 1]] for v in range(self.n_views)
        ]

        # Per-observation pyramid cell index at each level (for the
        # coverage score): cell = col + width * row on a width x width grid
        # over the image, width = base^(level+1).
        D = config.pyramid_depth
        wh = self.image_sizes[self.obs_view].astype(np.float64)  # (O, 2)
        self.pyr_cells = np.zeros((O, D), np.int32)
        self.pyr_ncells = np.zeros(D, np.int64)
        for lvl in range(D):
            width = config.pyramid_base ** (lvl + 1)
            cx = np.clip((self.obs_uv[:, 0] * width / wh[:, 0]).astype(np.int64), 0, width - 1)
            cy = np.clip((self.obs_uv[:, 1] * width / wh[:, 1]).astype(np.int64), 0, width - 1)
            self.pyr_cells[:, lvl] = cx + width * cy
            self.pyr_ncells[lvl] = width * width
        self.pyr_weights = 2.0 ** (D - 1 - np.arange(D))

        # state
        self.res = IncrementalResult(self.n_views)
        self.res.points = np.zeros((self.T, 3))
        self.res.point_valid = np.zeros(self.T, bool)
        self.obs_inlier = np.ones(O, bool)

        self._focal_mean = float(np.mean(self.intr_np.scale))
        self._im_wh = (
            float(np.max(self.image_sizes[:, 0])),
            float(np.max(self.image_sizes[:, 1])),
        )

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ------------------------------------------------------------------
    # Initial pair
    # ------------------------------------------------------------------
    def candidate_pairs(self, top: int = 20):
        """Pairs ranked by number of common tracks (vectorized over the
        (T, K) table: K*(K-1)/2 slot pairs, encoded keys, one unique)."""
        K = self.cfg.max_track_obs
        keys = []
        V = self.n_views
        for i in range(K):
            for j in range(i + 1, K):
                m = self.tbl_mask[:, i] & self.tbl_mask[:, j]
                if not m.any():
                    continue
                vi = self.tbl_view[m, i].astype(np.int64)
                vj = self.tbl_view[m, j].astype(np.int64)
                lo = np.minimum(vi, vj)
                hi = np.maximum(vi, vj)
                keys.append(lo * V + hi)
        if not keys:
            return []
        uniq, counts = np.unique(np.concatenate(keys), return_counts=True)
        order = np.argsort(-counts)[:top]
        return [(int(k // V), int(k % V)) for k in uniq[order]]

    def _pair_coverage_score(self, view, obs_idx):
        """Pyramid coverage score of a view restricted to given observation
        rows (ref: computeCandidateImageScore .cpp:1453-1473)."""
        cells = self.pyr_cells[obs_idx]  # (n, D)
        score = 0.0
        for lvl in range(self.cfg.pyramid_depth):
            score += len(np.unique(cells[:, lvl])) * self.pyr_weights[lvl]
        return score

    def _pair_obs(self, vi, vj):
        """Common tracks and their normalized obs in the two views."""
        oi = self.view_obs[vi]
        oj = self.view_obs[vj]
        ti = self.obs_track[oi]
        tj = self.obs_track[oj]
        common, ii, jj = np.intersect1d(ti, tj, return_indices=True)
        return common, oi[ii], oj[jj]

    def _evaluate_initial_pairs(self, cand_pairs):
        """Robust relative pose + baseline/coverage score for a LIST of
        candidate pairs in ONE padded batched dispatch (ref: pair scoring
        at .cpp:1414-1424 — score = angle_score * min(coverage_i,
        coverage_j), negative outside the reasonable-angle window).

        Returns list of (score, commit_payload), best-first commit data for
        every pair that passes the hard gates."""
        cfg = self.cfg
        pair_data = []  # (vi, vj, common, oi, oj)
        for vi, vj in cand_pairs:
            common, oi, oj = self._pair_obs(vi, vj)
            if len(common) >= cfg.min_pts_init:
                pair_data.append((vi, vj, common, oi, oj))
        if not pair_data:
            return []
        # Shared capacity across candidates; B padded to the configured
        # candidate count so repeated runs hit one compile.
        B = max(len(pair_data), self.cfg.init_pair_candidates)
        cap = 1 << int(
            np.ceil(np.log2(max(max(len(d[2]) for d in pair_data), 64)))
        )
        x1 = np.zeros((B, cap, 2), np.float32)
        x2 = np.zeros((B, cap, 2), np.float32)
        valid = np.zeros((B, cap), bool)
        for g, (vi, vj, common, oi, oj) in enumerate(pair_data):
            n = len(common)
            x1[g, :n] = self.obs_norm[oi]
            x2[g, :n] = self.obs_norm[oj]
            valid[g, :n] = True
        keys = jax.random.split(self._next_key(), B)
        # packed single-buffer fetch — six per-leaf fetches through the
        # relay cost a fixed round trip each (see _ba_solve_fetch)
        buf = np.asarray(_init_pair_eval_packed(
            keys,
            jnp.asarray(x1),
            jnp.asarray(x2),
            jnp.asarray(valid),
            jnp.float32(self._focal_mean),
            self._im_wh,
            cfg.n_ransac_hyps,
            cfg.resection_max_error_px,
        ))
        N = cap
        R_b = buf[:, :9].reshape(-1, 3, 3)
        c2_b = buf[:, 9:12]
        X_b = buf[:, 12:12 + 3 * N].reshape(-1, N, 3)
        good_b = buf[:, 12 + 3 * N:12 + 4 * N] > 0.5
        med_b = buf[:, -2]
        ngood_b = buf[:, -1]
        out = []
        for g, (vi, vj, common, oi, oj) in enumerate(pair_data):
            n = len(common)
            good = good_b[g, :n]
            if int(ngood_b[g]) < cfg.min_pts_init:
                continue
            med_ang = float(med_b[g])
            if not np.isfinite(med_ang) or med_ang < cfg.min_angle_init_deg:
                continue
            coverage = min(
                self._pair_coverage_score(vi, oi[good]),
                self._pair_coverage_score(vj, oj[good]),
            )
            # reasonable-angle window: reward mid-range baselines, keep
            # ordering for extreme ones (ref uses [min_angle; 40 deg]).
            angle_score = med_ang if med_ang <= 40.0 else max(80.0 - med_ang, 1.0)
            score = angle_score * coverage
            payload = (
                vi, vj, R_b[g], c2_b[g], common[good], X_b[g, :n][good]
            )
            out.append((score, payload))
        return out

    def _evaluate_initial_pair(self, vi: int, vj: int):
        evs = self._evaluate_initial_pairs([(vi, vj)])
        return evs[0] if evs else None

    def _commit_initial_pair(self, vi, vj, R, c2, track_ids, X):
        self.res.pose_R[vi] = np.eye(3)
        self.res.pose_c[vi] = 0.0
        self.res.pose_R[vj] = R
        self.res.pose_c[vj] = c2
        self.res.posed[[vi, vj]] = True
        self.res.points[track_ids] = X
        self.res.point_valid[track_ids] = True
        self.res.history.append(("init", vi, vj, len(track_ids)))

    def try_initial_pair(self, vi: int, vj: int) -> bool:
        ev = self._evaluate_initial_pair(vi, vj)
        if ev is None:
            return False
        self._commit_initial_pair(*ev[1])
        return True

    def initialize(self) -> bool:
        """Rank the top candidate pairs by angle x coverage and commit the
        best, rather than the first that passes the gates. All candidates
        are evaluated in one batched dispatch."""
        evs = self._evaluate_initial_pairs(
            self.candidate_pairs(top=self.cfg.init_pair_candidates)
        )
        if not evs:
            return False
        best = max(evs, key=lambda ev: ev[0])
        self._commit_initial_pair(*best[1])
        return True

    # ------------------------------------------------------------------
    # Resection
    # ------------------------------------------------------------------
    def view_scores(self):
        """Per unposed view: pyramid-coverage score over observations of
        valid tracks (findNextBestViews image score,
        ref .cpp:1453-1473 computeCandidateImageScore + weights :233-251).
        Vectorized: one unique() over encoded (view, level, cell) keys."""
        D = self.cfg.pyramid_depth
        usable = (
            self.res.point_valid[self.obs_track]
            & ~self.res.posed[self.obs_view]
            & self.obs_inlier
        )
        idx = np.nonzero(usable)[0]
        scores = np.zeros(self.n_views, np.float64)
        if len(idx) == 0:
            return scores
        views = self.obs_view[idx].astype(np.int64)
        max_cells = int(self.pyr_ncells.max())
        for lvl in range(D):
            keys = views * max_cells + self.pyr_cells[idx, lvl]
            uniq = np.unique(keys)
            np.add.at(scores, uniq // max_cells, self.pyr_weights[lvl])
        # require a minimal usable-track count regardless of coverage
        counts = np.bincount(views, minlength=self.n_views)
        scores[counts < self.cfg.min_track_inliers_resection] = 0.0
        return scores

    def view_usable_counts(self):
        """Per unposed view: number of observations of valid tracks."""
        usable = (
            self.res.point_valid[self.obs_track]
            & ~self.res.posed[self.obs_view]
            & self.obs_inlier
        )
        return np.bincount(
            self.obs_view[usable], minlength=self.n_views
        ).astype(np.int64)

    def resect_views(self, views) -> list:
        """Robust-P3P resect a GROUP of views in one padded batched
        dispatch (the reference resects its findNextBestViews group in an
        OpenMP loop, ReconstructionEngine_sequentialSfM.cpp:407-520; here
        the whole group is one vmapped AC-RANSAC + GN program — one relay
        round trip instead of one per view). Returns the successfully
        posed views."""
        cfg = self.cfg
        cand = []
        for v in views:
            obs_idx = self.view_obs[int(v)]
            tr = self.obs_track[obs_idx]
            usable = self.res.point_valid[tr]
            if usable.sum() >= cfg.min_track_inliers_resection:
                cand.append(
                    (
                        int(v),
                        self.res.points[tr[usable]],
                        self.obs_norm[obs_idx[usable]],
                    )
                )
        if not cand:
            return []
        # Batch width policy: on relay-attached backends every resection
        # group pads to a FIXED width of 8 so the whole reconstruction
        # hits one XLA program per capacity bucket (padding a 1-view group
        # costs microseconds on-chip; a second compile/executable-load
        # costs seconds through the relay). On the CPU backend compiles
        # are cheap and padded lanes are REAL work (measured +20% on the
        # 10-image CPU e2e), so pad only to the power-of-two bucket.
        # CHUNK=8 bounds the (B, n_hyps*4, cap) residual tensor.
        posed = []
        CHUNK = 8
        fixed_width = jax.default_backend() not in ("cpu",)
        for s in range(0, len(cand), CHUNK):
            chunk = cand[s : s + CHUNK]
            B = (
                CHUNK
                if fixed_width
                else 1 << int(np.ceil(np.log2(len(chunk))))
            )
            cap = 1 << int(
                np.ceil(np.log2(max(max(len(c[1]) for c in chunk), 32)))
            )
            world = np.zeros((B, cap, 3), np.float32)
            obs = np.zeros((B, cap, 2), np.float32)
            valid = np.zeros((B, cap), bool)
            for g, (v, w, o) in enumerate(chunk):
                n = len(w)
                world[g, :n] = w
                obs[g, :n] = o
                valid[g, :n] = True
            keys = jax.random.split(self._next_key(), B)
            # one packed fetch per chunk (see _ba_solve_fetch)
            buf = np.asarray(_resect_packed(
                keys,
                jnp.asarray(world),
                jnp.asarray(obs),
                jnp.float32(self._focal_mean),
                self._im_wh,
                jnp.asarray(valid),
                cfg.n_ransac_hyps,
                cfg.resection_max_error_px,
            ))
            R_b = buf[:, :9].reshape(-1, 3, 3)
            t_b = buf[:, 9:12]
            ninl_b = buf[:, 12]
            for g, (v, _, _) in enumerate(chunk):
                if int(ninl_b[g]) < cfg.min_track_inliers_resection:
                    continue
                R = R_b[g]
                self.res.pose_R[v] = R
                self.res.pose_c[v] = -R.T @ t_b[g]
                self.res.posed[v] = True
                self.res.history.append(("resect", v, int(ninl_b[g])))
                posed.append(v)
        return posed

    def resect_view(self, v: int) -> bool:
        return bool(self.resect_views([v]))

    # ------------------------------------------------------------------
    # Triangulation of all tracks observable from posed views
    # ------------------------------------------------------------------
    def triangulate_all(self):
        cfg = self.cfg
        K = cfg.max_track_obs
        posed = self.res.posed
        m = self.tbl_mask & posed[self.tbl_view] & self.obs_inlier[self.tbl_obs]
        enough = m.sum(1) >= 2

        # Projection matrices per view (normalized camera: K = I).
        P = np.zeros((self.n_views, 3, 4), np.float32)
        P[:, :3, :3] = self.res.pose_R
        P[:, :, 3] = -np.einsum("vij,vj->vi", self.res.pose_R, self.res.pose_c)

        Pb = P[self.tbl_view]  # (T, K, 3, 4)
        uv = self.obs_norm[self.tbl_obs]  # (T, K, 2)
        gate = _triangulate_gated_robust if cfg.robust_triangulation else _triangulate_gated
        X = np.asarray(
            gate(
                jnp.asarray(Pb),
                jnp.asarray(uv, jnp.float32),
                jnp.asarray(m),
                jnp.asarray(self.res.pose_c[self.tbl_view], jnp.float32),
                cfg.max_reproj_px / self._focal_mean,
                np.radians(cfg.min_angle_deg),
            )
        )
        ok = np.isfinite(X).all(axis=1) & enough
        self.res.points[ok] = X[ok]
        self.res.point_valid = ok

    def triangulate_tracks(self, track_ids):
        """Incremental triangulation: only the given tracks, padded to a
        power-of-two bucket so repeated calls hit a handful of XLA traces.

        The reference's triangulate() also touches only tracks seeing the
        newly resected views (ReconstructionEngine_sequentialSfM.cpp) —
        re-triangulating the full table per group is O(T*V) total work.
        """
        cfg = self.cfg
        track_ids = np.asarray(track_ids, np.int64)
        if len(track_ids) == 0:
            return
        S = len(track_ids)
        cap = 1 << int(np.ceil(np.log2(max(S, 64))))
        sel = np.zeros(cap, np.int64)
        sel[:S] = track_ids
        m = (
            self.tbl_mask[sel]
            & self.res.posed[self.tbl_view[sel]]
            & self.obs_inlier[self.tbl_obs[sel]]
        )
        m[S:] = False
        enough = m.sum(1) >= 2

        P = np.zeros((self.n_views, 3, 4), np.float32)
        P[:, :3, :3] = self.res.pose_R
        P[:, :, 3] = -np.einsum("vij,vj->vi", self.res.pose_R, self.res.pose_c)
        tv = self.tbl_view[sel]
        gate = _triangulate_gated_robust if cfg.robust_triangulation else _triangulate_gated
        X = np.asarray(
            gate(
                jnp.asarray(P[tv]),
                jnp.asarray(self.obs_norm[self.tbl_obs[sel]], jnp.float32),
                jnp.asarray(m),
                jnp.asarray(self.res.pose_c[tv], jnp.float32),
                cfg.max_reproj_px / self._focal_mean,
                np.radians(cfg.min_angle_deg),
            )
        )
        ok = (np.isfinite(X).all(axis=1) & enough)[:S]
        good_ids = track_ids[ok]
        self.res.points[good_ids] = X[:S][ok]
        self.res.point_valid[track_ids] = ok

    # ------------------------------------------------------------------
    # Bundle adjustment over the full masked problem
    # ------------------------------------------------------------------
    def _obs_table_mask(self):
        return (
            self.tbl_mask
            & self.res.posed[self.tbl_view]
            & self.res.point_valid[:, None]
            & self.obs_inlier[self.tbl_obs]
        )

    def _make_problem(self, m, cam_fixed) -> ba_mod.BAProblem:
        # dtype test on the HOST copies (intr_np): probing np.asarray(a)
        # on already-uploaded device leaves cost one relay fetch per leaf
        # per BA call (measured 1.2 s over a 6-image reconstruction)
        return ba_mod.BAProblem(
            cam_q=geo.mat_to_quat(jnp.asarray(self.res.pose_R, jnp.float32)),
            cam_c=jnp.asarray(self.res.pose_c, jnp.float32),
            points=jnp.asarray(self.res.points, jnp.float32),
            intr=jax.tree_util.tree_map(
                lambda a: jnp.asarray(
                    a, jnp.float32
                    if np.issubdtype(np.asarray(a).dtype, np.floating)
                    else None
                ),
                self.intr_np,
            ),
            obs_cam=jnp.asarray(self.tbl_view),
            obs_intr=jnp.asarray(self.view_intrinsic[self.tbl_view]),
            obs_uv=jnp.asarray(self.obs_uv[self.tbl_obs], jnp.float32),
            obs_mask=jnp.asarray(m),
            cam_fixed=jnp.asarray(cam_fixed),
            point_fixed=jnp.asarray(~self.res.point_valid),
        )

    def bundle_adjust(self, fix_gauge: int = 2, new_views=None):
        cfg = self.cfg
        posed_idx = np.nonzero(self.res.posed)[0]
        m = self._obs_table_mask()

        cam_fixed = ~self.res.posed.copy()
        cam_fixed[posed_idx[:fix_gauge]] = True
        # Local BA on large scenes: hold cameras far from the new views.
        if (
            new_views
            and len(posed_idx) > cfg.local_ba_min_views
        ):
            from .local_ba import covisibility_from_table, local_ba_fixed_mask

            edges = covisibility_from_table(self.tbl_view, m)
            lba_fixed = local_ba_fixed_mask(
                self.n_views, edges, new_views, self.res.posed,
                dist_refine=cfg.local_ba_distance,
            )
            cam_fixed |= lba_fixed

        problem = self._make_problem(m, cam_fixed)
        R, c, new_pts, cost0, cost1, iters = _ba_solve_fetch(
            problem, self.n_views, self.T
        )
        self.res.pose_R = R
        self.res.pose_c = c
        self.res.points = np.where(
            self.res.point_valid[:, None], new_pts, self.res.points
        )
        self.res.history.append(("ba", cost0, cost1, iters))

    def remove_outliers(self):
        """Flag observations with reprojection error above the gate
        (ref: sfmFilters.cpp removeOutliers)."""
        cfg = self.cfg
        P = np.zeros((self.n_views, 3, 4))
        P[:, :3, :3] = self.res.pose_R
        P[:, :, 3] = -np.einsum("vij,vj->vi", self.res.pose_R, self.res.pose_c)
        tr = self.obs_track
        Xh = np.concatenate([self.res.points, np.ones((self.T, 1))], axis=1)
        proj = np.einsum("oij,oj->oi", P[self.obs_view], Xh[tr])
        z = proj[:, 2]
        uvn = proj[:, :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[:, None]
        err = np.linalg.norm(uvn - self.obs_norm, axis=-1) * self._focal_mean
        bad = (err > cfg.max_reproj_px) | (z <= 0)
        relevant = self.res.posed[self.obs_view] & self.res.point_valid[tr]
        flagged = bad & relevant & self.obs_inlier
        self.obs_inlier = self.obs_inlier & ~flagged
        # drop tracks that lost support
        m = (
            self.tbl_mask
            & self.res.posed[self.tbl_view]
            & self.obs_inlier[self.tbl_obs]
        )
        self.res.point_valid &= m.sum(1) >= 2
        self._last_outlier_tracks = np.unique(tr[flagged])
        return int(flagged.sum())

    # ------------------------------------------------------------------
    def refine_intrinsics_now(self):
        """JOINTLY refine poses + points + the shared intrinsic table and
        refresh the cached normalized observations (obs_norm feeds
        resection and triangulation, so it must track the intrinsics).

        Ref: the reference refines intrinsics inside every Ceres BA
        (BundleAdjustment.hpp REFINE_INTRINSICS_*). The joint Schur system
        (ba_solve_joint) is essential: an alternating intrinsics-only GN
        stalls once the poses have absorbed unmodelled distortion (the
        focal/depth dolly-zoom coupling — measured on the hard rendered
        scene: alternating leaves k1 at -0.07 of -0.25, joint recovers
        -0.249)."""
        m = self._obs_table_mask()
        posed_idx = np.nonzero(self.res.posed)[0]
        cam_fixed = ~self.res.posed.copy()
        cam_fixed[posed_idx[:2]] = True  # gauge
        problem = self._make_problem(m, cam_fixed=cam_fixed)
        n_posed = int(self.res.posed.sum())
        # coarse-to-fine distortion: high-order radial terms are only
        # observable once the scene carries enough spatially-spread
        # observations — fitting k2/k3 to a small central cloud corrupts
        # edge undistortion (and thereby resection)
        n_obs_live = int(m.sum())  # m is the HOST mask — no device fetch
        order = 1 if n_obs_live < 3000 else (2 if n_obs_live < 10000 else None)
        import alicevision_tpu.camera as _cam

        if jax.default_backend() in ("cpu",):
            # CPU: compiles are cheap and the joint Schur's P^2 coupling
            # planes are REAL work — keep the parameter block structurally
            # small per phase (measured: the full-width masked block costs
            # ~4x the plane products on host)
            buf = _ba_solve_joint_structural_packed_impl(
                problem, n_posed >= 8, order, _ba_loop_mode()
            )
        else:
            # relay backends: refine_pp / disto order are TRACED mask data,
            # so every joint solve of a reconstruction shares one XLA
            # program (three static variants previously cost one relay
            # compile + executable load each)
            mask = np.ones(4 + _cam.DISTO_PARAMS, np.float32)
            if n_posed < 8:
                mask[2:4] = 0.0
            if order is not None:
                mask[4 + order :] = 0.0
            buf = _ba_solve_joint_packed_impl(
                problem, jnp.asarray(mask), _ba_loop_mode()
            )
        R, c, new_pts, self.intr_np = _unpack_joint(
            buf, self.n_views, self.T, self.intr_np
        )
        self.res.pose_R = R
        self.res.pose_c = c
        self.res.points = np.where(
            self.res.point_valid[:, None], new_pts, self.res.points
        )
        self._recompute_obs_norm()
        self.res.history.append(
            ("refine_intrinsics", float(np.mean(self.intr_np.scale)))
        )

    def _recompute_obs_norm(self):
        intr_rows = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[self.view_intrinsic[self.obs_view]],
            self.intr_np,
        )
        p = cam.ima2cam(intr_rows, jnp.asarray(self.obs_uv))
        self.obs_norm = np.asarray(
            cam.remove_distortion(intr_rows.disto_kind, intr_rows.disto, p)
        )
        self._focal_mean = float(np.mean(self.intr_np.scale))

    # ------------------------------------------------------------------
    def seed_from_sfmdata(self, sc, view_map=None):
        """Pre-populate the engine from an existing reconstruction — the
        reference's SfM-augmentation mode
        (ReconstructionEngine_sequentialSfM.cpp:183-223: process() detects
        a seeded scene and extends it instead of picking an initial pair).

        sc: SfMData whose landmark_ids are TRACK indices of this engine's
        track set (to_sfmdata writes them that way, so save -> reload ->
        seed round-trips). view_map maps sc view index -> engine view index
        (identity by default)."""
        vm = (lambda v: v) if view_map is None else view_map
        for v in np.asarray(sc.valid_views()):
            ev = vm(int(v))
            p = int(sc.view_pose[int(v)])
            self.res.pose_R[ev] = sc.pose_R[p]
            self.res.pose_c[ev] = sc.pose_c[p]
            self.res.posed[ev] = True
        ids = np.asarray(sc.landmark_ids)
        keep = (ids >= 0) & (ids < self.T)
        self.res.points[ids[keep]] = np.asarray(sc.points)[keep]
        self.res.point_valid[ids[keep]] = True
        self.res.history.append(
            ("seed", int(self.res.posed.sum()), int(keep.sum()))
        )

    def process(self, max_iterations: int = 1000) -> IncrementalResult:
        if self.res.posed.sum() < 2:  # else: seeded scene — resume/augment
            if not self.initialize():
                raise RuntimeError("no valid initial pair found")
        self.triangulate_all()
        self.bundle_adjust()
        self.remove_outliers()
        self.triangulate_all()
        next_refine_at = 4

        it = 0
        while it < max_iterations:
            it += 1
            scores = self.view_scores()
            best = scores.max()
            if best <= 0:
                break
            # group: views within 75% of the best score, up to group_add
            n_posed = int(self.res.posed.sum())
            group_cap = 1 if n_posed < 4 else self.cfg.group_add
            cands = np.argsort(-scores)
            group = [v for v in cands if scores[v] >= 0.75 * best][:group_cap]
            new_views = self.resect_views(group)
            if not new_views:
                break
            # incremental: only tracks seeing the new views can change
            new_obs = np.concatenate([self.view_obs[v] for v in new_views])
            self.triangulate_tracks(np.unique(self.obs_track[new_obs]))
            n_posed = int(self.res.posed.sum())
            # The reference refines intrinsics (incl. distortion) inside
            # EVERY Ceres BA (BundleAdjustment.hpp REFINE_INTRINSICS_*);
            # early groups are where wrong focal/disto poisons resection,
            # so refine every group until the scene is established, then
            # back off to the doubling cadence to bound the cost.
            if self.cfg.refine_intrinsics and (
                n_posed <= 4 * self.cfg.group_add or n_posed >= next_refine_at
            ):
                self.refine_intrinsics_now()
                next_refine_at = max(next_refine_at * 2, n_posed + 1)
            self.bundle_adjust(new_views=new_views)
            for _ in range(5):
                n_bad = self.remove_outliers()
                # the reference re-runs BA only while the outlier count
                # stays ABOVE bundleAdjustmentMaxOutliers (hpp:96, default
                # 50) — a handful of stragglers waits for the next group's
                # BA instead of buying another full solve
                if n_bad < self.cfg.ba_max_outliers:
                    break
                self.triangulate_tracks(self._last_outlier_tracks)
                self.bundle_adjust(new_views=new_views)
        return self.res

    # ------------------------------------------------------------------
    def to_sfmdata(self, view_ids=None):
        """Export the reconstruction as an SfMData scene."""
        from ..sfmdata import SfMData

        sc = SfMData.empty()
        I = len(np.atleast_1d(self.intr_np.cam_kind))
        for i in range(I):
            sc.add_intrinsic(
                1000 + i,
                int(np.atleast_2d(self.intr_np.size)[i, 0]),
                int(np.atleast_2d(self.intr_np.size)[i, 1]),
                float(np.atleast_2d(self.intr_np.scale)[i, 0]),
                cam_kind=int(np.atleast_1d(self.intr_np.cam_kind)[i]),
                disto_kind=int(np.atleast_1d(self.intr_np.disto_kind)[i]),
                disto_params=tuple(np.atleast_2d(self.intr_np.disto)[i]),
                offset=tuple(np.atleast_2d(self.intr_np.offset)[i]),
                focal_y_px=float(np.atleast_2d(self.intr_np.scale)[i, 1]),
            )
        ids = view_ids if view_ids is not None else np.arange(self.n_views)
        for v in range(self.n_views):
            vi = sc.add_view(
                int(ids[v]),
                int(self.view_intrinsic[v]),
                int(self.image_sizes[v, 0]),
                int(self.image_sizes[v, 1]),
            )
            if self.res.posed[v]:
                sc.set_pose(vi, self.res.pose_R[v], self.res.pose_c[v])
        valid_t = np.nonzero(self.res.point_valid)[0]
        remap = -np.ones(self.T, np.int64)
        remap[valid_t] = np.arange(len(valid_t))
        keep_obs = (
            self.res.point_valid[self.obs_track]
            & self.res.posed[self.obs_view]
            & self.obs_inlier
        )
        sc.set_structure(
            self.res.points[valid_t],
            remap[self.obs_track[keep_obs]],
            self.obs_view[keep_obs],
            self.obs_uv[keep_obs],
            landmark_ids=valid_t.astype(np.int64),
        )
        return sc


# ---------------------------------------------------------------------------
# jitted helpers
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px"))
def _init_pair_eval_packed(keys, x1, x2, valid, focal_mean, im_size, n_hyps,
                           max_error_px):
    """_init_pair_eval_batch with all six outputs flattened into ONE
    (B, 12 + 4N + 2) f32 buffer — one device->host fetch per call."""
    R, c2, X, good, med, ngood = _init_pair_eval_batch(
        keys, x1, x2, valid, focal_mean, im_size, n_hyps, max_error_px
    )
    G = good.shape[0]
    return jnp.concatenate([
        R.reshape(G, 9), c2, X.reshape(G, -1), good.astype(jnp.float32),
        med[:, None], ngood.astype(jnp.float32)[:, None],
    ], axis=1)


@partial(jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px"))
def _resect_packed(keys, world, obs, focal_mean, im_size, valid, n_hyps,
                   max_error_px):
    """robust_resection_p3p_batch with (R, t, n_inliers) flattened into
    ONE (B, 13) f32 buffer — one device->host fetch per chunk."""
    rp = robust.robust_resection_p3p_batch(
        keys, world, obs, focal_mean, im_size, valid,
        n_hyps=n_hyps, max_error_px=max_error_px,
    )
    G = rp.t.shape[0]
    return jnp.concatenate([
        rp.R.reshape(G, 9), rp.t,
        rp.n_inliers.astype(jnp.float32)[:, None],
    ], axis=1)


@partial(jax.jit, static_argnames=("im_size", "n_hyps", "max_error_px"))
def _init_pair_eval_batch(keys, x1, x2, valid, focal_mean, im_size, n_hyps,
                          max_error_px):
    """One dispatch for all initial-pair candidates: robust relative pose,
    two-view triangulation, cheirality/angle gating and the masked median
    triangulation angle per pair (makeInitialPair3D evaluation,
    ReconstructionEngine_sequentialSfM.cpp:1414-1424)."""

    def one(k, a, b, v):
        R, t, rm = robust.robust_relative_pose(
            k, a, b, focal_mean, im_size, valid=v,
            n_hyps=n_hyps, max_error_px=max_error_px,
        )
        P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P2 = jnp.concatenate([R, t[:, None]], axis=1)
        X = mv.triangulate_dlt(P1[None], P2[None], a, b)
        c2 = -R.T @ t
        d1 = X
        d2 = X - c2
        cosang = jnp.sum(d1 * d2, -1) / (
            jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1) + 1e-12
        )
        ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
        good = rm.inliers & (X[:, 2] > 0) & (ang > 0.5) & v
        n_good = jnp.sum(good)
        ang_sorted = jnp.sort(jnp.where(good, ang, jnp.inf))
        med = ang_sorted[jnp.clip((n_good - 1) // 2, 0, ang.shape[0] - 1)]
        return R, c2, X, good, med, n_good

    return jax.vmap(one)(keys, x1, x2, valid)


@jax.jit
def _triangulate_gated(Pb, uv, mask, centers, max_err_norm, min_angle_rad):
    """Masked N-view DLT + reprojection/angle/depth gates.

    Pb: (T, K, 3, 4) in normalized camera units; uv: (T, K, 2);
    centers: (T, K, 3). Returns (T, 3) with NaN rows where gates fail.
    """
    X = mv.triangulate_nview(Pb, uv, mask)

    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = jnp.einsum("tkij,tj->tki", Pb, Xh)
    z = proj[..., 2]
    uvp = proj[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[..., None]
    err = jnp.linalg.norm(uvp - uv, axis=-1)
    ok_err = jnp.where(mask, (err < max_err_norm) & (z > 0), True)

    # max pairwise triangulation angle across observing views
    d = X[:, None, :] - centers  # (T, K, 3)
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-12)
    cosang = jnp.einsum("tki,tmi->tkm", dn, dn)
    pair_m = mask[:, :, None] & mask[:, None, :]
    ang = jnp.where(pair_m, jnp.arccos(jnp.clip(cosang, -1.0, 1.0)), 0.0)
    max_ang = jnp.max(ang, axis=(1, 2))

    good = jnp.all(ok_err, axis=1) & (max_ang > min_angle_rad)
    return jnp.where(good[:, None], X, jnp.nan)


@jax.jit
def _triangulate_gated_robust(Pb, uv, mask, centers, max_err_norm, min_angle_rad):
    """LO-RANSAC variant of the gated triangulation: view-pair hypotheses
    voted by the whole track, masked refit on inliers, then the same
    reprojection/angle gates restricted to the inlier views
    (ref: multiview/triangulation/NViewsTriangulationLORansac.hpp:48)."""
    X, inl, valid = mv.triangulate_nview_robust(
        Pb, uv, mask=mask, threshold_px=max_err_norm
    )
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = jnp.einsum("tkij,tj->tki", Pb, Xh)
    z = proj[..., 2]
    uvp = proj[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[..., None]
    err = jnp.linalg.norm(uvp - uv, axis=-1)
    ok_err = jnp.where(inl, (err < max_err_norm) & (z > 0), True)

    d = X[:, None, :] - centers
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-12)
    cosang = jnp.einsum("tki,tmi->tkm", dn, dn)
    pair_m = inl[:, :, None] & inl[:, None, :]
    ang = jnp.where(pair_m, jnp.arccos(jnp.clip(cosang, -1.0, 1.0)), 0.0)
    max_ang = jnp.max(ang, axis=(1, 2))

    good = valid & jnp.all(ok_err, axis=1) & (max_ang > min_angle_rad)
    return jnp.where(good[:, None], X, jnp.nan)


def _ba_loop_mode() -> str:
    """AV_BA_LOOP=unrolled trades one straight-line compile for the HLO
    While that costs a host round-trip per iteration on relay-attached
    TPU runtimes (see ba_solve loop='unrolled').

    Default is auto-detected: on a relay-style backend (anything that is
    not the in-process cpu/gpu/tpu runtime, e.g. the axon tunnel) the
    unrolled program avoids per-iteration host round trips; on local
    backends the HLO While compiles faster and runs the same."""
    import os

    mode = os.environ.get("AV_BA_LOOP")
    if mode:
        return mode
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover — backend probing must never fail
        return "while"
    return "while" if backend in ("cpu", "gpu", "tpu", "cuda", "rocm") else "unrolled"


# Packed-result solves: every np.asarray of a device array pays one fixed
# relay round trip, so fetching a BA result leaf-by-leaf (R, c, points,
# 3 scalars) cost ~6 round trips PER BA CALL — a large share of the
# incremental loop's wall on the relay-attached chip. The solve and the
# flattening compile as ONE program whose single f32 buffer is fetched
# once; the host unpacks by the statically-known (C, T[, I]) sizes.


@partial(jax.jit, static_argnums=(1,))
def _ba_solve_packed_impl(problem, loop):
    res = ba_mod.ba_solve(problem, max_iters=25, loop=loop)
    return jnp.concatenate([
        geo.quat_to_mat(res.cam_q).reshape(-1),
        res.cam_c.reshape(-1),
        res.points.reshape(-1),
        jnp.stack([res.cost_initial, res.cost_final,
                   res.n_iters.astype(res.cam_c.dtype)]),
    ]).astype(jnp.float32)


def _ba_solve_fetch(problem, C, T):
    """Run the plain BA and fetch (R, c, points, cost0, cost1, iters) in
    one transfer."""
    buf = np.asarray(_ba_solve_packed_impl(problem, _ba_loop_mode()),
                     np.float64)
    i = 9 * C
    R = buf[:i].reshape(C, 3, 3)
    c = buf[i:i + 3 * C].reshape(C, 3)
    i += 3 * C
    pts = buf[i:i + 3 * T].reshape(T, 3)
    i += 3 * T
    return R, c, pts, float(buf[i]), float(buf[i + 1]), int(buf[i + 2])


@partial(jax.jit, static_argnums=(2,))
def _ba_solve_joint_packed_impl(problem, param_mask, loop):
    res = ba_mod.ba_solve_joint(
        problem, max_iters=15, param_mask=param_mask, loop=loop,
    )
    return jnp.concatenate([
        geo.quat_to_mat(res.cam_q).reshape(-1),
        res.cam_c.reshape(-1),
        res.points.reshape(-1),
        res.intr.scale.reshape(-1),
        res.intr.offset.reshape(-1),
        res.intr.disto.reshape(-1),
    ]).astype(jnp.float32)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _ba_solve_joint_structural_packed_impl(problem, refine_pp,
                                           disto_max_order, loop):
    res = ba_mod.ba_solve_joint(
        problem, max_iters=15, refine_pp=refine_pp,
        disto_max_order=disto_max_order, loop=loop,
    )
    return jnp.concatenate([
        geo.quat_to_mat(res.cam_q).reshape(-1),
        res.cam_c.reshape(-1),
        res.points.reshape(-1),
        res.intr.scale.reshape(-1),
        res.intr.offset.reshape(-1),
        res.intr.disto.reshape(-1),
    ]).astype(jnp.float32)


def _unpack_joint(buf, C, T, intr_np):
    """Split the packed joint-BA buffer; int intrinsic leaves (kinds,
    size) are not refined and keep their host copies."""
    buf = np.asarray(buf, np.float64)
    i = 9 * C
    R = buf[:i].reshape(C, 3, 3)
    c = buf[i:i + 3 * C].reshape(C, 3)
    i += 3 * C
    pts = buf[i:i + 3 * T].reshape(T, 3)
    i += 3 * T
    nI = np.atleast_1d(intr_np.cam_kind).shape[0]
    scale = buf[i:i + 2 * nI].reshape(
        np.asarray(intr_np.scale).shape).astype(np.float32)
    i += 2 * nI
    offset = buf[i:i + 2 * nI].reshape(
        np.asarray(intr_np.offset).shape).astype(np.float32)
    i += 2 * nI
    disto = buf[i:].reshape(
        np.asarray(intr_np.disto).shape).astype(np.float32)
    new_intr = intr_np._replace(scale=scale, offset=offset, disto=disto)
    return R, c, pts, new_intr



