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
):
    """vmap of the full SGM pipeline over a batch of reference views."""

    def one(ref, ts, Kr, Kt, Rr, tr, ds):
        # under vmap the host-side rectifiability gate is unavailable:
        # "auto" falls back to the gather sweep; pass method="rectified"
        # (after gating the batch on the host) for the fast path.
        from .rectified import similarity_volume_auto

        cost = similarity_volume_auto(ref, ts, Kr, Kt, Rr, tr, ds, params)
        agg = sgm_aggregate(cost, ref, params)
        return retrieve_best_depth(agg, ds)

    return jax.vmap(one)(ref_imgs, t_imgs, K_ref, K_t, R_rel, t_rel, depths)


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


def make_tiles(H: int, W: int, tile: int = 512, overlap: int = 64):
    """Tile ROIs covering (H, W) with the given overlap
    (mvsUtils::TileParams contract)."""
    step = tile - overlap
    rois = []
    for y0 in range(0, max(H - overlap, 1), step):
        for x0 in range(0, max(W - overlap, 1), step):
            rois.append((y0, min(y0 + tile, H), x0, min(x0 + tile, W)))
    return rois


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
):
    """Tiled SGM for images too large for one VMEM-friendly volume.

    Each tile gets a cropped reference (principal point shifted) while
    T-cams stay full — the homography warp indexes them globally.
    """
    from .plane_sweep import sgm_depth_map

    H, W = ref_img.shape
    rois = make_tiles(H, W, tile, overlap)
    out_tiles = []
    for (y0, y1, x0, x1) in rois:
        K_crop = K_ref.copy()
        K_crop[0, 2] -= x0
        K_crop[1, 2] -= y0
        depth, sim = sgm_depth_map(
            jnp.asarray(ref_img[y0:y1, x0:x1]),
            jnp.asarray(t_imgs),
            jnp.asarray(K_crop, jnp.float32),
            jnp.asarray(K_t, jnp.float32),
            jnp.asarray(R_rel, jnp.float32),
            jnp.asarray(t_rel, jnp.float32),
            d_min,
            d_max,
            params,
        )
        out_tiles.append(((y0, y1, x0, x1), np.asarray(depth)))
    return merge_tiles(out_tiles, H, W)
