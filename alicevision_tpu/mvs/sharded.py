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


def make_sharded_consistency_filter(mesh: Mesh):
    """Cross-view depth-map FUSION sharded over chips (BASELINE config 5's
    "depth fusion with psum collectives").

    Each chip holds its shard of the (V, H, W) depth stack; filtering a
    view needs its NEIGHBOURS' maps, which live on other chips — so the
    collective is the whole point: XLA inserts ONE tiled all-gather of the
    depth stack per call, after which every chip checks its local views
    against the gathered neighbourhood. Same function as the single-device
    `consistency_filter` — sharding is layout-only, exactly like the BA
    (DESIGN.md section 2).

    ref: src/aliceVision/fuseCut/Fuser.hpp:21-34 (cross-view consistency),
    depthMap/computeOnMultiGPUs.cpp:15-67 (the reference fans out
    ESTIMATION per GPU but fuses single-process over files — the TPU
    design replaces the file round trip with the ICI all-gather)."""
    from .fusion import consistency_filter

    shard = NamedSharding(mesh, P(("view", "landmark")))
    repl = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda depths, K, R, c: consistency_filter(depths, K, R, c),
        in_shardings=(shard, repl, repl, repl),
        out_shardings=(shard, shard),
    )
    return fn


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
