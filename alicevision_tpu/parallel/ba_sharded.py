"""Distributed Schur-complement BA: landmark blocks sharded across the mesh.

The north-star distributed design (BASELINE.md): each device owns a shard of
landmark blocks (and their observation rows), computes its partial
contributions to the reduced camera system S and RHS b, and the global
6C x 6C system is assembled with psum over the "landmark" mesh axis. The
camera state is replicated; the dense solve is replicated (C is small
relative to L); landmark back-substitution is local to each shard. This is
the TPU-native replacement for Ceres SPARSE_SCHUR
(ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231) with ICI
collectives instead of a shared-memory factorization.

Implementation: jit with explicit NamedShardings on the landmark-major
arrays + with_sharding_constraint; XLA inserts the psum when the sharded
scatter feeds the replicated solve. The same `ba_solve` numerical core is
reused — sharding is purely a layout annotation, which is the point of the
design (single source of truth for the math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sfm import ba as ba_mod


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def pad_problem_for_mesh(problem: ba_mod.BAProblem, n_shards: int) -> ba_mod.BAProblem:
    """Pad the landmark dimension so it divides the mesh axis."""
    L = problem.points.shape[0]
    Lp = _round_up(max(L, n_shards), n_shards)
    if Lp == L:
        return problem
    pad = Lp - L

    def padL(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    return problem._replace(
        points=padL(problem.points),
        obs_cam=padL(problem.obs_cam),
        obs_intr=padL(problem.obs_intr),
        obs_uv=padL(problem.obs_uv),
        obs_mask=padL(problem.obs_mask),
        point_fixed=jnp.pad(problem.point_fixed, (0, pad), constant_values=True),
        obs_sub=None if problem.obs_sub is None else padL(problem.obs_sub),
    )


def shard_problem(problem: ba_mod.BAProblem, mesh: Mesh) -> ba_mod.BAProblem:
    """Place landmark-major arrays sharded over the "landmark" axis and
    everything else replicated."""
    n_lm = mesh.shape["landmark"]
    problem = pad_problem_for_mesh(problem, n_lm)
    lm = NamedSharding(mesh, P(("view", "landmark")))  # use all devices
    rep = NamedSharding(mesh, P())

    def put(a, sh):
        return jax.device_put(a, sh)

    return ba_mod.BAProblem(
        cam_q=put(problem.cam_q, rep),
        cam_c=put(problem.cam_c, rep),
        points=put(problem.points, lm),
        intr=jax.tree_util.tree_map(lambda a: put(a, rep), problem.intr),
        obs_cam=put(problem.obs_cam, lm),
        obs_intr=put(problem.obs_intr, lm),
        obs_uv=put(problem.obs_uv, lm),
        obs_mask=put(problem.obs_mask, lm),
        cam_fixed=put(problem.cam_fixed, rep),
        point_fixed=put(problem.point_fixed, lm),
    )


def make_sharded_ba(mesh: Mesh, max_iters: int = 25):
    """jit-compiled distributed ba_solve bound to a mesh."""
    lm = NamedSharding(mesh, P(("view", "landmark")))
    rep = NamedSharding(mesh, P())
    in_shardings = ba_mod.BAProblem(
        cam_q=rep,
        cam_c=rep,
        points=lm,
        intr=ba_mod.cam.Intrinsics(rep, rep, rep, rep, rep, rep),
        obs_cam=lm,
        obs_intr=lm,
        obs_uv=lm,
        obs_mask=lm,
        cam_fixed=rep,
        point_fixed=lm,
    )
    out_shardings = ba_mod.BAResult(
        cam_q=rep, cam_c=rep, points=lm, cost_initial=rep, cost_final=rep, n_iters=rep
    )
    def _solve(p):
        # trace-time switch: use the SPMD-safe contraction forms (no
        # reshape across the sharded landmark axis — see ba._SPMD_FORMS)
        ba_mod._SPMD_FORMS = True
        try:
            return ba_mod.ba_solve(p, max_iters=max_iters)
        finally:
            ba_mod._SPMD_FORMS = False

    fn = jax.jit(
        _solve,
        in_shardings=(in_shardings,),
        out_shardings=out_shardings,
    )
    return fn


def solve_sharded(problem: ba_mod.BAProblem, mesh: Mesh, max_iters: int = 25):
    problem = shard_problem(problem, mesh)
    fn = make_sharded_ba(mesh, max_iters)
    return fn(problem)
