"""Sharded per-view SGM on the virtual mesh + tiled large-image SGM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alicevision_tpu.mvs import plane_sweep as ps
from alicevision_tpu.mvs import sharded as sh
from alicevision_tpu.parallel.mesh import make_mesh


def _plane_case(z0=4.0, H=64, W=96):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mvs import _render_plane_scene

    return _render_plane_scene(z0=z0, H=H, W=W, fx=100.0, baseline=0.4)


def test_batched_sgm_sharded_over_views():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _plane_case()
    B = 8  # one view-group per virtual device
    depths = np.asarray(ps.inverse_depth_planes(2.0, 8.0, 32))

    batch = lambda a: jnp.asarray(np.stack([a] * B))
    mesh = make_mesh(n_view=8, n_landmark=1)
    fn = sh.make_sharded_sgm(mesh, ps.SgmParams(n_depths=32))
    depth, sim = fn(
        batch(ref),
        batch(np.stack(t_imgs)) if isinstance(t_imgs, list) else batch(t_imgs),
        batch(K.astype(np.float32)),
        batch(np.stack(K_t).astype(np.float32)),
        batch(np.stack(R_rel).astype(np.float32)),
        batch(np.stack(t_rel).astype(np.float32)),
        batch(depths.astype(np.float32)),
    )
    d = np.asarray(depth)
    assert d.shape[0] == B
    inner = d[:, 8:-8, 30:-8]
    assert np.abs(np.median(inner) - z0) / z0 < 0.05
    # all batch entries identical inputs -> identical outputs across shards
    np.testing.assert_allclose(d[0], d[5], atol=1e-5)


def test_tile_merge_contract():
    H = W = 100
    rois = sh.make_tiles(H, W, tile=60, overlap=20)
    assert all(y1 <= H and x1 <= W for y0, y1, x0, x1 in rois)
    # constant maps merge to the constant
    tiles = [(roi, np.full((roi[1] - roi[0], roi[3] - roi[2]), 5.0, np.float32))
             for roi in rois]
    merged = sh.merge_tiles(tiles, H, W)
    np.testing.assert_allclose(merged, 5.0, atol=1e-5)
    # invalid (-1) regions stay invalid
    tiles2 = [(roi, np.full((roi[1] - roi[0], roi[3] - roi[2]), -1.0, np.float32))
              for roi in rois]
    merged2 = sh.merge_tiles(tiles2, H, W)
    assert (merged2 == -1.0).all()


def test_tiled_sgm_matches_full():
    K, ref, t_imgs, K_t, R_rel, t_rel, z0 = _plane_case(H=96, W=128)
    params = ps.SgmParams(n_depths=32)
    full_d, _ = ps.sgm_depth_map(
        jnp.asarray(ref), jnp.asarray(np.stack(t_imgs)),
        jnp.asarray(K, jnp.float32), jnp.asarray(np.stack(K_t), jnp.float32),
        jnp.asarray(np.stack(R_rel), jnp.float32),
        jnp.asarray(np.stack(t_rel), jnp.float32),
        2.0, 8.0, params,
    )
    tiled_d = sh.sgm_depth_map_tiled(
        ref, np.stack(t_imgs), K, np.stack(K_t), np.stack(R_rel),
        np.stack(t_rel), 2.0, 8.0, params, tile=80, overlap=24,
    )
    inner = np.s_[12:-12, 34:-12]
    rel = np.abs(tiled_d[inner] - np.asarray(full_d)[inner]) / z0
    assert np.median(rel) < 0.02, np.median(rel)


def test_sharded_consistency_filter_parity():
    """Multi-chip depth fusion (BASELINE config 5 second half): the
    view-sharded ring-halo filter must equal the single-device BOUNDED
    filter exactly — the ppermute halo exchange is layout, not math
    (ref: fuseCut/Fuser.hpp:21-34 bounds the consistency set the same
    way)."""
    import jax
    import jax.numpy as jnp

    from alicevision_tpu.mvs.fusion import consistency_filter_ring
    from alicevision_tpu.mvs.sharded import make_sharded_consistency_filter
    from alicevision_tpu.parallel.mesh import make_mesh

    V, H, W = 8, 48, 64
    rng = np.random.RandomState(3)
    # consistent geometry: a fronto plane at depth 5 seen by near-identical
    # cameras, plus per-view outlier patches the filter must reject
    depths = np.full((V, H, W), 5.0, np.float32)
    for v in range(V):
        y, x = rng.randint(0, H - 8), rng.randint(0, W - 8)
        depths[v, y : y + 8, x : x + 8] = 2.0 + v * 0.3  # inconsistent
    K = np.tile(
        np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32),
        (V, 1, 1),
    )
    ang = np.linspace(0, 0.08, V)
    R = np.stack([
        np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
        for a in ang
    ])
    c = np.stack([np.array([0.2 * v, 0, 0], np.float32) for v in range(V)])

    # both shard layouts: 8 one-view shards (halo > local block, chained
    # permutes) and 2 four-view shards (sliced boundary permute)
    for n_sh in (8, 2):
        mesh = make_mesh(n_view=n_sh, n_landmark=1,
                         devices=jax.devices()[:n_sh])
        fuse = make_sharded_consistency_filter(mesh, k=3)
        fs, cnt_s = fuse(jnp.asarray(depths), jnp.asarray(K),
                         jnp.asarray(R), jnp.asarray(c))
        f1, cnt_1 = consistency_filter_ring(
            jax.device_put(depths, jax.devices()[0]), jnp.asarray(K),
            jnp.asarray(R), jnp.asarray(c), k=3,
        )
        assert np.allclose(np.asarray(fs), np.asarray(f1))
        assert np.array_equal(np.asarray(cnt_s), np.asarray(cnt_1))
        fs = np.asarray(fs)
        assert (fs > 0).mean() > 0.5  # the consistent plane survives
        assert (fs[0, :, :] > 0).mean() < 1.0  # outlier patches rejected


def test_ring_filter_matches_dense_when_window_covers_all():
    """With 2k+1 >= V the bounded ring filter degenerates to the dense
    all-pairs filter — same counts, same output."""
    from alicevision_tpu.mvs.fusion import (
        consistency_filter,
        consistency_filter_ring,
    )

    V, H, W = 6, 32, 40
    rng = np.random.RandomState(1)
    depths = (4.0 + rng.rand(V, H, W)).astype(np.float32)
    K = np.tile(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                         np.float32), (V, 1, 1))
    ang = np.linspace(0, 0.1, V)
    R = np.stack([
        np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32) for a in ang])
    c = np.stack([np.array([0.1 * v, 0, 0], np.float32) for v in range(V)])
    fd, cd = consistency_filter(jnp.asarray(depths), jnp.asarray(K),
                                jnp.asarray(R), jnp.asarray(c))
    fr, cr = consistency_filter_ring(jnp.asarray(depths), jnp.asarray(K),
                                     jnp.asarray(R), jnp.asarray(c), k=5)
    assert np.array_equal(np.asarray(cd), np.asarray(cr))
    assert np.allclose(np.asarray(fd), np.asarray(fr))


def test_fusion_comms_table_halo_scaling():
    """The ring-halo collective moves 2·k boundary maps per shard —
    independent of the shard count — and the projected ICI efficiency at
    the realistic V=32 operating point clears BASELINE's ≥0.8 bar at
    8 shards (the all-gather design measured 0.42 in BENCH_r04)."""
    from alicevision_tpu.parallel.comms_report import fusion_comms_table

    V, H, W, k = 32, 96, 128, 4
    rows = fusion_comms_table(shard_counts=(1, 2, 4, 8), V=V, hw=(H, W), k=k)
    by_n = {r["shards"]: r for r in rows}
    assert 1 in by_n and 8 in by_n
    assert by_n[1]["collective_bytes"] == 0
    halo_bytes = 2 * k * H * W * 4
    for n in (2, 4, 8):
        assert "collective-permute" in by_n[n]["by_kind"]
        assert "all-gather" not in by_n[n]["by_kind"]
        # per-shard halo ≈ 2k maps (XLA may pad/fuse slightly)
        assert by_n[n]["collective_bytes"] <= 1.25 * halo_bytes, by_n[n]
    # efficiency model at the full 272x480 operating point is checked in
    # bench; here assert the structural invariant that makes it hold:
    # bytes constant while per-shard flops shrink
    assert by_n[8]["collective_bytes"] <= by_n[2]["collective_bytes"] * 1.01
    assert by_n[8]["flops_per_shard"] < 0.5 * by_n[2]["flops_per_shard"]
