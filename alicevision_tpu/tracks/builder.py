"""Track building: fuse pairwise matches into multi-view tracks.

TPU-native counterpart of the reference's union-find track builder
(ref: src/aliceVision/track/TracksBuilder.cpp:10-22, TracksBuilder.hpp:45-64,
tracksUtils.cpp). Union-find over (view, feature) nodes is irregular
pointer-chasing — it runs in the native C++ runtime
(alicevision_tpu/native, path-halving + union-by-size), exactly as the
reference keeps it on lemon rather than CUDA. The *output* is the flat SoA
observation block that the TPU kernels consume.

Fork filtering matches the reference: any track containing two features in
the same view is dropped (TracksBuilder "filter").
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Tracks(NamedTuple):
    # flat observation SoA, sorted by track id
    track_ids: np.ndarray  # (O,) int32 — contiguous 0..T-1
    views: np.ndarray  # (O,) int32 view index
    features: np.ndarray  # (O,) int32 feature index within the view
    n_tracks: int

    def lengths(self) -> np.ndarray:
        return np.bincount(self.track_ids, minlength=self.n_tracks)


def build_tracks(
    pair_matches: dict,
    n_features_per_view: dict,
    min_track_length: int = 2,
) -> Tracks:
    """Fuse matches into tracks.

    pair_matches: {(view_i, view_j): (K, 2) int array of feature index pairs}
    n_features_per_view: {view: feature capacity} — defines node numbering.
    """
    views = sorted(n_features_per_view)
    offsets = {}
    total = 0
    for v in views:
        offsets[v] = total
        total += int(n_features_per_view[v])

    # Flatten all match edges once, then run the native C++ union-find
    # (alicevision_tpu/native — the lemon-unionfind equivalent); the module
    # falls back to scipy connected_components without a compiler.
    ea, eb = [], []
    used = np.zeros(total, bool)
    for (vi, vj), m in pair_matches.items():
        m = np.asarray(m)
        if len(m) == 0:
            continue
        na = offsets[vi] + m[:, 0]
        nb = offsets[vj] + m[:, 1]
        ea.append(na)
        eb.append(nb)
        used[na] = True
        used[nb] = True
    nodes = np.nonzero(used)[0]
    if len(nodes) == 0:
        return Tracks(
            np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.int32), 0
        )
    from .. import native

    all_roots = native.connected_components(
        np.concatenate(ea), np.concatenate(eb), total
    )
    roots = all_roots[nodes]

    # Map node -> (view, feature).
    view_of = np.zeros(total, np.int32)
    feat_of = np.zeros(total, np.int32)
    for v in views:
        o = offsets[v]
        n = int(n_features_per_view[v])
        view_of[o : o + n] = v
        feat_of[o : o + n] = np.arange(n)

    # Group by root.
    order = np.argsort(roots, kind="stable")
    nodes_s = nodes[order]
    roots_s = roots[order]
    uniq, start = np.unique(roots_s, return_index=True)
    comp_id = np.zeros(len(nodes_s), np.int64)
    comp_id[start] = 1
    comp_id = np.cumsum(comp_id) - 1  # 0..T-1 per node

    tv = view_of[nodes_s]
    tf = feat_of[nodes_s]

    # Fork filter: drop tracks with duplicate views; length filter.
    T = len(uniq)
    # duplicate-view detection per track via sorting (track, view)
    key = comp_id * (tv.max() + 2) + tv
    ks = np.sort(key)
    dup_keys = ks[1:][ks[1:] == ks[:-1]]
    bad_tracks = np.unique(dup_keys // (tv.max() + 2))
    lengths = np.bincount(comp_id, minlength=T)
    good = np.ones(T, bool)
    good[bad_tracks] = False
    good &= lengths >= min_track_length

    keep = good[comp_id]
    comp_keep = comp_id[keep]
    # reindex to contiguous track ids
    remap = -np.ones(T, np.int64)
    kept_tracks = np.nonzero(good)[0]
    remap[kept_tracks] = np.arange(len(kept_tracks))
    return Tracks(
        track_ids=remap[comp_keep].astype(np.int32),
        views=tv[keep].astype(np.int32),
        features=tf[keep].astype(np.int32),
        n_tracks=len(kept_tracks),
    )


def tracks_in_views(tracks: Tracks, view_set) -> np.ndarray:
    """Track ids fully observable from the given set of views that appear in
    at least 2 of them (ref: tracksUtils::getCommonTracksInImages)."""
    mask = np.isin(tracks.views, list(view_set))
    cnt = np.bincount(tracks.track_ids[mask], minlength=tracks.n_tracks)
    return np.nonzero(cnt >= 2)[0]


def observations_table(tracks: Tracks, features_xy: dict) -> np.ndarray:
    """(O, 2) pixel coords aligned with the flat track arrays.

    features_xy: {view: (F, 2) array of keypoint coordinates}.
    """
    out = np.zeros((len(tracks.views), 2), np.float64)
    for v, xy in features_xy.items():
        sel = tracks.views == v
        out[sel] = np.asarray(xy)[tracks.features[sel]]
    return out
