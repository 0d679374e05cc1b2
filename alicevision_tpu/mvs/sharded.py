"""Multi-chip depth-map estimation: per-view sharding + tiled large images.

TPU-native counterpart of the reference's depth-map scale-out
(ref: src/aliceVision/depthMap/computeOnMultiGPUs.cpp:15-67 one-thread-per-
GPU fan-out; mvsUtils/TileParams.hpp + mapIO.hpp:28-127 tiled EXRs with
weighted merge). Here:

  * a batch of reference views is vmapped through the SGM pipeline and the
    batch axis is sharded over the mesh's "view" axis — XLA places one
    view-group per chip, the direct analog of the reference's per-GPU
    camera chunks (BASELINE.md config 4);
  * large images run as overlapping tiles with the same Hann-weighted merge
    contract as the reference's addTileMapWeighted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .plane_sweep import SgmParams, retrieve_best_depth, sgm_aggregate


def batched_sgm(
    ref_imgs: jnp.ndarray,  # (B, H, W)
    t_imgs: jnp.ndarray,  # (B, T, H, W)
    K_ref: jnp.ndarray,  # (B, 3, 3)
    K_t: jnp.ndarray,  # (B, T, 3, 3)
    R_rel: jnp.ndarray,  # (B, T, 3, 3)
    t_rel: jnp.ndarray,  # (B, T, 3)
    depths: jnp.ndarray,  # (B, D) per-view plane lists
    params: SgmParams = SgmParams(),
    tc_depth_ranges: jnp.ndarray | None = None,  # (B, T, 2) optional
):
    """vmap of the full SGM pipeline over a batch of reference views."""

    def one(ref, ts, Kr, Kt, Rr, tr, ds, tc):
        # under vmap the host-side rectifiability gate is unavailable:
        # "auto" falls back to the gather sweep; pass method="rectified"
        # (after gating the batch on the host) for the fast path.
        from .rectified import similarity_volume_auto

        cost = similarity_volume_auto(
            ref, ts, Kr, Kt, Rr, tr, ds, params, tc_depth_ranges=tc
        )
        agg = sgm_aggregate(cost, ref, params)
        return retrieve_best_depth(agg, ds)

    if tc_depth_ranges is None:
        return jax.vmap(
            lambda *a: one(*a, None)
        )(ref_imgs, t_imgs, K_ref, K_t, R_rel, t_rel, depths)
    return jax.vmap(one)(
        ref_imgs, t_imgs, K_ref, K_t, R_rel, t_rel, depths, tc_depth_ranges
    )


def make_sharded_sgm(mesh: Mesh, params: SgmParams = SgmParams()):
    """jit-compiled batched SGM with the view batch sharded over the mesh.

    The returned callable takes the same arrays as batched_sgm with B a
    multiple of the mesh's total device count."""
    shard = NamedSharding(mesh, P(("view", "landmark")))

    fn = jax.jit(
        partial(batched_sgm, params=params),
        in_shardings=(shard,) * 7,
        out_shardings=(shard, shard),
    )
    return fn


def make_sharded_consistency_filter(
    mesh: Mesh,
    k: int = 4,
    min_consistent: int = 3,
    rel_tol: float = 0.01,
):
    """Cross-view depth-map FUSION sharded over chips (BASELINE config 5's
    "depth fusion with psum collectives") via a RING-HALO exchange.

    Each chip holds a contiguous block of the (V, H, W) depth stack in
    capture order; filtering a view needs only its ±k ring neighbours'
    maps (the reference bounds its consistency set the same way:
    src/aliceVision/fuseCut/Fuser.hpp:21-34 checks each view against its
    chosen neighbour cameras, never all V). The collective is therefore a
    ring `ppermute` of the k boundary maps in each direction — bytes per
    shard = 2·k·H·W·4, INDEPENDENT of V and of the shard count — instead
    of the full (V−V/S)·H·W·4 all-gather, whose per-shard bytes grow with
    V while per-shard FLOPs shrink (measured 0.42 projected ICI efficiency
    at 8 shards in BENCH_r04; the halo design projects ≥0.8 at 8 shards on
    V=32, bench_comms).

    Output is bit-identical to the single-device bounded filter
    `fusion.consistency_filter_ring(depths, K, R, c, k)` — parity asserted
    in `__graft_entry__.dryrun_multichip` and tests/test_sharded_mvs.py.

    ref: depthMap/computeOnMultiGPUs.cpp:15-67 (the reference fans out
    ESTIMATION per GPU and fuses over files; the TPU design replaces the
    file round trip with the ICI neighbour exchange)."""
    import jax.lax as lax

    from .fusion import (
        _ring_offsets,
        _sample_nearest,
        backproject_depth_map,
        project_points,
    )

    axes = tuple(mesh.axis_names)
    S = mesh.size
    fwd = [(i, (i + 1) % S) for i in range(S)]
    bwd = [(i, (i - 1) % S) for i in range(S)]

    def local(depths_l, K, R, c):
        Vs, H, W = depths_l.shape
        V = Vs * S
        offs_list = _ring_offsets(V, k)
        k_eff = max(off for off in offs_list) if offs_list else 0
        if k_eff == 0:
            counts = jnp.zeros((Vs, H, W), jnp.int32)
            valid = (depths_l > 0) & (1 >= min_consistent)
            return jnp.where(valid, depths_l, -1.0), counts

        # halo exchange: the k_eff boundary maps ride the ring each way.
        # When a shard holds fewer than k_eff views the permute chains
        # whole blocks (ceil(k_eff/Vs) hops).
        if S == 1:  # single shard: the halo is a local wraparound slice
            left = depths_l[-k_eff:]
            right = depths_l[:k_eff]
        elif k_eff <= Vs:
            left = lax.ppermute(depths_l[-k_eff:], axes, fwd)
            right = lax.ppermute(depths_l[:k_eff], axes, bwd)
        else:
            m = -(-k_eff // Vs)
            blk, parts = depths_l, []
            for _ in range(m):
                blk = lax.ppermute(blk, axes, fwd)
                parts.insert(0, blk)
            left = jnp.concatenate(parts, 0)[-k_eff:]
            blk, parts = depths_l, []
            for _ in range(m):
                blk = lax.ppermute(blk, axes, bwd)
                parts.append(blk)
            right = jnp.concatenate(parts, 0)[:k_eff]
        ext = jnp.concatenate([left, depths_l, right], 0)  # (Vs+2k, H, W)

        gbase = lax.axis_index(axes) * Vs
        offs = jnp.asarray(offs_list, jnp.int32)

        def per_view(i):
            r = gbase + i
            Xw = backproject_depth_map(depths_l[i], K[r], R[r], c[r])

            def check(off):
                o = jnp.mod(r + off, V)
                d_map = ext[i + k_eff + off]
                uv, z_proj = project_points(Xw, K[o], R[o], c[o])
                d_other, inside = _sample_nearest(d_map, uv, -1.0)
                return (
                    inside
                    & (d_other > 0)
                    & (jnp.abs(d_other - z_proj) < rel_tol * z_proj)
                    & (z_proj > 0)
                )

            counts = jnp.sum(jax.vmap(check)(offs), axis=0)
            valid = (depths_l[i] > 0) & (counts + 1 >= min_consistent)
            return jnp.where(valid, depths_l[i], -1.0), counts

        return jax.vmap(per_view)(jnp.arange(Vs))

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(), P(), P()),
        out_specs=(P(axes), P(axes)),
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Tiling (large images)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("params",))
def _tile_sgm_jit(crop, t_imgs, Kc, K_t, R_rel, t_rel, depths, params):
    """Module-level jitted per-tile SGM (shared across calls/views so the
    compiled executable is traced and loaded ONCE per tile shape)."""
    from .plane_sweep import sgm_depth_map

    # d_min/d_max are unused when an explicit plane list is given
    return sgm_depth_map(
        crop, t_imgs, Kc, K_t, R_rel, t_rel, 1.0, 2.0, params, depths=depths
    )


_batched_sgm_jit = jax.jit(batched_sgm, static_argnames=("params",))


def make_tiles(H: int, W: int, tile: int = 512, overlap: int = 64,
               clamp: bool = False):
    """Tile ROIs covering (H, W) with the given overlap
    (mvsUtils::TileParams contract).

    With `clamp=True` the last tile of each axis is shifted to END at the
    image boundary instead of being cropped, so every tile has the same
    (tile, tile) shape when the image is at least tile-sized — the
    uniform batch the vmapped tile sweep needs (the reference batches
    same-size tiles to fill the device the same way,
    ref: depthMap/DepthMapEstimator.cpp:238-270)."""
    step = tile - overlap
    ys = list(range(0, max(H - overlap, 1), step))
    xs = list(range(0, max(W - overlap, 1), step))
    if clamp:
        ys = sorted({min(y, max(H - tile, 0)) for y in ys})
        xs = sorted({min(x, max(W - tile, 0)) for x in xs})
    return [
        (y0, min(y0 + tile, H), x0, min(x0 + tile, W))
        for y0 in ys
        for x0 in xs
    ]


def merge_tiles(
    tiles: list,  # [(roi, map (h, w))]
    H: int,
    W: int,
) -> np.ndarray:
    """Hann-weighted tile merge (mapIO addTileMapWeighted semantics)."""
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)
    for (y0, y1, x0, x1), m in tiles:
        h, w = y1 - y0, x1 - x0
        wy = np.hanning(h + 2)[1:-1] if h > 1 else np.ones(1)
        wx = np.hanning(w + 2)[1:-1] if w > 1 else np.ones(1)
        wgt = np.outer(wy, wx) + 1e-6
        valid = m > 0
        acc[y0:y1, x0:x1] += np.where(valid, m * wgt, 0.0)
        wacc[y0:y1, x0:x1] += np.where(valid, wgt, 0.0)
    out = np.where(wacc > 1e-9, acc / np.maximum(wacc, 1e-9), -1.0)
    return out.astype(np.float32)


@partial(jax.jit, static_argnames=("rois", "hw"))
def _merge_tiles_jit(tile_stack, rois, hw):
    """Device-side Hann merge of same-shape tiles (addTileMapWeighted
    semantics, f32): keeps the whole tiled sweep on the chip so ONE merged
    map rides the relay instead of one fetch per tile — and the merged map
    is what the fusion stage consumes anyway."""
    H, W = hw
    acc = jnp.zeros((H, W), jnp.float32)
    wacc = jnp.zeros((H, W), jnp.float32)
    for i, (y0, y1, x0, x1) in enumerate(rois):
        m = tile_stack[i]
        h, w = y1 - y0, x1 - x0
        wy = np.hanning(h + 2)[1:-1] if h > 1 else np.ones(1)
        wx = np.hanning(w + 2)[1:-1] if w > 1 else np.ones(1)
        wgt = jnp.asarray((np.outer(wy, wx) + 1e-6).astype(np.float32))
        valid = m > 0
        acc = acc.at[y0:y1, x0:x1].add(jnp.where(valid, m * wgt, 0.0))
        wacc = wacc.at[y0:y1, x0:x1].add(jnp.where(valid, wgt, 0.0))
    return jnp.where(wacc > 1e-9, acc / jnp.maximum(wacc, 1e-9), -1.0)


def sgm_depth_map_tiled(
    ref_img: np.ndarray,
    t_imgs: np.ndarray,
    K_ref: np.ndarray,
    K_t: np.ndarray,
    R_rel: np.ndarray,
    t_rel: np.ndarray,
    d_min: float,
    d_max: float,
    params: SgmParams = SgmParams(),
    tile: int = 512,
    overlap: int = 64,
    tile_batch: int = 1,
):
    """Tiled SGM for images too large for one VMEM-friendly volume.

    Each tile gets a cropped reference (principal point shifted) while
    T-cams stay full — the homography warp indexes them globally.

    Tiles are CLAMPED to uniform (tile, tile) shape (the last tile of each
    axis ends at the boundary), so a 1920x1088 view needs 4 tiles instead
    of 6 cropped ones and EVERY tile runs the same compiled program — one
    jit, N executions (the reference batches same-size tiles to fill the
    device the same way, ref: depthMap/DepthMapEstimator.cpp:238-270).
    The per-pair rectifiability gate runs ONCE on the host (poses are
    tile-invariant), so the whole per-tile sweep composes under one jit —
    eager per-tile composition on the axon relay measured ~18 s/tile for
    a 1.0 s/tile program.

    `tile_batch` > 1 additionally vmaps several tiles into one dispatch —
    MEASURED NEGATIVE at the 1024^2 x D128 x T4 point on v5e: B=4
    exhausts HBM outright and B=2 pages (13.7 s per tile-pair vs 1.0
    s/tile unbatched — the batched (B, D, H, W) volumes plus aggregation
    temps overflow the 16 GB HBM). Keep 1 for >=768^2 tiles; small tiles
    can batch."""
    from .plane_sweep import inverse_depth_planes, sgm_depth_map
    from .rectified import rectification_ok

    H, W = ref_img.shape
    rois = make_tiles(H, W, tile, overlap, clamp=True)
    shapes = {(y1 - y0, x1 - x0) for (y0, y1, x0, x1) in rois}

    ok = all(
        rectification_ok(np.asarray(R_rel)[t], np.asarray(t_rel)[t])
        for t in range(np.asarray(R_rel).shape[0])
    )
    params_b = params._replace(method="rectified" if ok else "gather")
    depths = np.asarray(
        inverse_depth_planes(d_min, d_max, params.n_depths), np.float32
    )
    t_j = jnp.asarray(t_imgs, jnp.float32)
    Kt_j = jnp.asarray(K_t, jnp.float32)
    R_j = jnp.asarray(R_rel, jnp.float32)
    tr_j = jnp.asarray(t_rel, jnp.float32)
    d_j = jnp.asarray(depths)

    if len(shapes) > 1 or len(rois) == 1 or tile_batch <= 1:
        # one compiled per-tile program (module-level jit: a fresh wrapper
        # per call would re-trace and RE-LOAD the executable every view —
        # measured 8.6 vs 1.25 s/tile on the axon relay), executed per ROI
        tiles_dev = []
        for (y0, y1, x0, x1) in rois:
            K_crop = np.asarray(K_ref, np.float32).copy()
            K_crop[0, 2] -= x0
            K_crop[1, 2] -= y0
            depth, _ = _tile_sgm_jit(
                jnp.asarray(ref_img[y0:y1, x0:x1], jnp.float32),
                t_j,
                jnp.asarray(K_crop),
                Kt_j, R_j, tr_j, d_j,
                params_b,
            )
            tiles_dev.append(depth)
        if len(shapes) == 1 and len(rois) > 1:
            # uniform tiles: Hann-merge ON DEVICE, one map fetch total
            merged = _merge_tiles_jit(
                jnp.stack(tiles_dev), tuple(rois), (H, W)
            )
            return np.asarray(merged)
        return merge_tiles(
            [(roi, np.asarray(d)) for roi, d in zip(rois, tiles_dev)], H, W
        )

    # uniform tiles -> vmapped batched dispatches (small tiles only)
    batched = partial(_batched_sgm_jit, params=params_b)
    out_tiles = []
    for s in range(0, len(rois), max(1, tile_batch)):
        chunk = rois[s : s + max(1, tile_batch)]
        B = len(chunk)
        crops = np.stack(
            [ref_img[y0:y1, x0:x1] for (y0, y1, x0, x1) in chunk]
        ).astype(np.float32)
        Kc = np.tile(np.asarray(K_ref, np.float32), (B, 1, 1))
        for i, (y0, y1, x0, x1) in enumerate(chunk):
            Kc[i, 0, 2] -= x0
            Kc[i, 1, 2] -= y0
        depth_b, _ = batched(
            jnp.asarray(crops),
            jnp.broadcast_to(t_j[None], (B,) + t_j.shape),
            jnp.asarray(Kc),
            jnp.broadcast_to(Kt_j[None], (B,) + Kt_j.shape),
            jnp.broadcast_to(R_j[None], (B,) + R_j.shape),
            jnp.broadcast_to(tr_j[None], (B,) + tr_j.shape),
            jnp.broadcast_to(d_j[None], (B, len(depths))),
        )
        depth_np = np.asarray(depth_b)
        for i, roi in enumerate(chunk):
            out_tiles.append((roi, depth_np[i]))
    return merge_tiles(out_tiles, H, W)
