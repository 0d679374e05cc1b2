"""Pipeline stages with file-level contracts (the Meshroom-style DAG).

TPU-native equivalent of the reference's CLI stage chain
(ref: SURVEY.md §3.6; src/software/pipeline/main_cameraInit.cpp:323-343,
main_featureExtraction.cpp, main_imageMatching.cpp:209,
main_featureMatching.cpp, main_incrementalSfM.cpp,
main_prepareDenseScene.cpp:71-82, main_depthMapEstimation.cpp,
main_depthMapFiltering.cpp:142-144, main_meshing.cpp:400-401).

Each stage reads/writes files so runs are resumable at stage granularity —
the same checkpoint contract the reference exposes to Meshroom. Formats:
  features: <viewId>.feat.npz  (xy, scale, orientation, response, desc, valid)
  pairs:    pairs.txt          ("i j" per line, view indices)
  matches:  matches.npz        (one array per "i_j" pair, (K, 2) feature ids)
  depth:    <viewId>_depth.npy / _sim.npy
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from .. import camera as cam
from .. import geometry as geo
from .. import sfmdata
from ..image.io import read_exif, read_image, write_image
from ..utils import sensor_db as sdb


def _ensure_dir(d):
    os.makedirs(d, exist_ok=True)
    return d


# ---------------------------------------------------------------------------
# cameraInit
# ---------------------------------------------------------------------------


def camera_init(
    image_folder: str,
    output_sfm: str,
    sensor_db_path: str | None = None,
    default_focal_px: float | None = None,
) -> sfmdata.SfMData:
    """Scan a folder of images -> .sfm with views + EXIF-derived intrinsics.

    Groups views by (make, model, focal, size) into shared intrinsics like
    the reference's cameraInit."""
    db = sdb.parse_database(sensor_db_path) if sensor_db_path else None
    exts = {".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp", ".exr", ".npy"}
    files = sorted(
        f
        for f in os.listdir(image_folder)
        if os.path.splitext(f)[1].lower() in exts
    )
    if not files:
        raise FileNotFoundError(f"no images in {image_folder}")

    sc = sfmdata.SfMData.empty()
    intr_key_to_idx: dict = {}
    for i, fname in enumerate(files):
        path = os.path.join(image_folder, fname)
        meta = read_exif(path)
        if "width" not in meta:
            img = read_image(path)
            meta["height"], meta["width"] = img.shape[:2]
        w, h = int(meta["width"]), int(meta["height"])
        if default_focal_px is not None:
            focal_px, sensor_w = default_focal_px, 36.0
        else:
            focal_px, _ = sdb.focal_px_from_exif(meta, w, db)
            sensor_w, _ = sdb.sensor_width_mm(meta.get("make", ""), meta.get("model", ""), db)
        key = (meta.get("make", ""), meta.get("model", ""), round(focal_px, 1), w, h)
        if key not in intr_key_to_idx:
            intr_key_to_idx[key] = sc.add_intrinsic(
                1000 + len(intr_key_to_idx),
                w,
                h,
                focal_px,
                disto_kind=cam.DISTO_RADIALK3,
                disto_params=(0.0, 0.0, 0.0),
                sensor_mm=(sensor_w, sensor_w * h / w),
            )
        sc.add_view(i + 1, intr_key_to_idx[key], w, h, path=path, frame_id=i)
    sfmdata.save(sc, output_sfm)
    return sc


# ---------------------------------------------------------------------------
# featureExtraction
# ---------------------------------------------------------------------------

# Module-level jit cache keyed by (family, config): a jit built on a
# closure defined INSIDE feature_extraction is a fresh Python function per
# stage invocation, so every call re-traced and re-compiled the SIFT
# program (~90 s without the persistent compile cache; executable re-load
# even with it). Shared across calls, the executable is traced and loaded
# ONCE per (config, batch shape) — same pattern as sharded._tile_sgm_jit.
_EXTRACT_JIT: dict = {}


def _sift_extract_packed(cfg):
    key = ("sift-packed", cfg)
    if key not in _EXTRACT_JIT:
        import jax
        import jax.numpy as jnp

        from ..features import sift

        def one(im):
            f = sift.extract(im, cfg)
            # quantize ON-CHIP (x512, clip, uint8 — the reference's
            # on-disk descriptor type, feature/Descriptor.hpp unsigned
            # char): the chip->host descriptor fetch was the biggest e2e
            # slice at f32 (16 MB/batch); uint8 moves 4x less. Then pack
            # EVERYTHING into one uint8 array: each chip->host fetch
            # through the axon relay pays a fixed per-array round trip,
            # so fetching 6 small leaves cost ~6 s/batch — the whole
            # featureExtraction stage wall. Bitcast the f32 metadata to
            # bytes and ride along with the descriptors: ONE fetch.
            desc_u8 = jnp.clip(f.desc * 512.0, 0.0, 255.0).astype(
                jnp.uint8)
            meta = jnp.stack(
                [f.xy[:, 0], f.xy[:, 1], f.scale, f.orientation,
                 f.response, f.valid.astype(jnp.float32)], axis=-1
            )  # (N, 6) f32
            meta_u8 = jax.lax.bitcast_convert_type(
                meta, jnp.uint8
            ).reshape(meta.shape[0], 24)
            return jnp.concatenate([meta_u8, desc_u8], axis=-1)

        _EXTRACT_JIT[key] = jax.jit(jax.vmap(one))
    return _EXTRACT_JIT[key]


def _akaze_extract_batch(acfg):
    key = ("akaze", acfg)
    if key not in _EXTRACT_JIT:
        import jax

        from ..features import akaze

        _EXTRACT_JIT[key] = jax.jit(
            jax.vmap(lambda im: akaze.extract(im, acfg))
        )
    return _EXTRACT_JIT[key]


def feature_extraction(
    input_sfm: str,
    output_folder: str,
    max_keypoints: int = 4096,
    dsp: bool = False,
    range_start: int = 0,
    range_size: int = -1,
    downscale_to: int = 1024,
    describer_types: str = "sift",
) -> None:
    """Features per view -> <viewId>.feat.npz (plus <viewId>.<marker>.npz
    for marker describers).

    describer_types is a comma list from {sift, dspsift, akaze, akaze_mldb,
    tag16h5, cctag3} — the
    reference's describerTypes flag (imageDescriberCommon.hpp:19-50);
    range_start/range_size mirror the reference's chunked farm runs
    (main_featureExtraction.cpp --rangeStart/--rangeSize)."""
    import jax
    import jax.numpy as jnp

    from ..features import sift

    sc = sfmdata.load(input_sfm)
    _ensure_dir(output_folder)
    end = sc.n_views if range_size < 0 else min(sc.n_views, range_start + range_size)
    types = [t.strip() for t in describer_types.split(",") if t.strip()]
    # "dspsift" selects domain-size-pooled descriptors (the reference's
    # default describer, ImageDescriber_DSPSIFT_vlfeat.hpp)
    dsp = dsp or ("dspsift" in types)

    if "sift" in types or "dspsift" in types:
        cfg = sift.SiftConfig(max_keypoints=max_keypoints, dsp=dsp,
                              n_octaves=4)
        extract_batch = _sift_extract_packed(cfg)
        sift_packed = True
    elif "akaze" in types or "akaze_mldb" in types:
        # AKAZE msurf descriptors are signed floats and stay f32 (no
        # uint8 packing)
        from ..features import akaze

        acfg = akaze.AkazeConfig(
            max_keypoints=max_keypoints,
            descriptor="mldb" if "akaze_mldb" in types else "msurf",
        )
        extract_batch = _akaze_extract_batch(acfg)
        sift_packed = False
    else:
        extract_batch, sift_packed = None, False

    # load pending views, record per-view rescale factors
    pending, imgs, scales = [], {}, {}
    for v in range(range_start, end):
        out = os.path.join(output_folder, f"{int(sc.view_ids[v])}.feat.npz")
        if os.path.exists(out):
            continue
        img = read_image(sc.view_paths[v], grayscale=True)
        scale = 1.0
        if downscale_to and max(img.shape) > downscale_to:
            scale = downscale_to / max(img.shape)
            import cv2

            img = cv2.resize(
                img, (int(img.shape[1] * scale), int(img.shape[0] * scale))
            )
        pending.append(v)
        imgs[v] = img.astype(np.float32)
        scales[v] = scale

    # describer pass, batched per image shape: one vmapped dispatch per
    # chunk instead of one per image (the per-call relay round trip was a
    # large share of this stage's wall; the reference's analog is the
    # memory-aware OpenMP job batch, featureEngine/FeatureExtractor.cpp
    # :100-152)
    if ("sift" in types or "dspsift" in types
            or "akaze" in types or "akaze_mldb" in types):
        by_shape: dict = {}
        for v in pending:
            by_shape.setdefault(imgs[v].shape, []).append(v)
        for shape, vs in by_shape.items():
            for s in range(0, len(vs), 8):
                chunk = vs[s : s + 8]
                B = 1 << int(np.ceil(np.log2(len(chunk))))
                stack = np.stack(
                    [imgs[v] for v in chunk]
                    + [imgs[chunk[0]]] * (B - len(chunk))
                )
                feats = extract_batch(jnp.asarray(stack))
                if sift_packed:
                    packed = np.asarray(feats)  # ONE relay fetch per batch
                    meta = (
                        packed[:, :, :24].copy().view(np.float32)
                    )  # (B, N, 6): x, y, scale, orientation, response, valid
                    for g, v in enumerate(chunk):
                        np.savez_compressed(
                            os.path.join(
                                output_folder,
                                f"{int(sc.view_ids[v])}.feat.npz",
                            ),
                            xy=meta[g, :, :2] / scales[v],
                            scale=meta[g, :, 2] / scales[v],
                            orientation=meta[g, :, 3],
                            response=meta[g, :, 4],
                            # uint8 stays uint8 on disk (4x smaller files,
                            # matching the reference's unsigned-char
                            # .desc); load_features dequantizes
                            desc=packed[g, :, 24:],
                            valid=meta[g, :, 5] > 0.5,
                        )
                    continue
                feats_np = jax.tree_util.tree_map(np.asarray, feats)
                for g, v in enumerate(chunk):
                    np.savez_compressed(
                        os.path.join(
                            output_folder, f"{int(sc.view_ids[v])}.feat.npz"
                        ),
                        xy=feats_np.xy[g] / scales[v],
                        scale=feats_np.scale[g] / scales[v],
                        orientation=feats_np.orientation[g],
                        response=feats_np.response[g],
                        desc=feats_np.desc[g],
                        valid=feats_np.valid[g],
                    )

    for v in pending:
        for mtype in ("tag16h5", "cctag3"):
            if mtype not in types:
                continue
            from ..features import markers as mk

            img = imgs[v]
            dets = (
                mk.detect_apriltags(img)
                if mtype == "tag16h5"
                else mk.detect_cctags(img)
            )
            xy, mscale, ori, desc = mk.markers_to_features(dets)
            np.savez_compressed(
                os.path.join(
                    output_folder, f"{int(sc.view_ids[v])}.{mtype}.npz"
                ),
                xy=xy / scales[v],
                scale=mscale / scales[v],
                orientation=ori,
                desc=desc,
                ids=np.array([d.marker_id for d in dets], np.int32),
            )


def load_features(features_folder: str, view_id: int) -> dict:
    with np.load(os.path.join(features_folder, f"{view_id}.feat.npz")) as z:
        out = {k: z[k] for k in z.files}
    if out["desc"].dtype == np.uint8:  # on-chip-quantized SIFT descriptors
        out["desc"] = out["desc"].astype(np.float32) / 512.0
    return out


# ---------------------------------------------------------------------------
# imageMatching (pair selection)
# ---------------------------------------------------------------------------


def image_matching(
    input_sfm: str,
    features_folder: str,
    output_pairs: str,
    method: str = "exhaustive",  # exhaustive | voctree | sequential | frustum
    n_neighbors: int = 10,
    tree_branching: int = 8,
    tree_levels: int = 3,
) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from ..matching import voctree as vt

    sc = sfmdata.load(input_sfm)
    n = sc.n_views
    if method == "exhaustive" or n <= 2:
        pairs = vt.exhaustive_pairs(n)
    elif method == "sequential":
        pairs = vt.sequential_pairs(n, window=n_neighbors)
    elif method == "frustum":
        # geometric pair selection on posed scenes: SAT frustum intersection
        # (ref: imageMatching/ImageMatching.hpp:50-58 FRUSTUM mode,
        # sfm/FrustumFilter.cpp)
        from ..sfm.frustum import frustum_pairs

        pairs = frustum_pairs(sc)
    elif method == "voctree":
        descs, valids = [], []
        for v in range(n):
            f = load_features(features_folder, int(sc.view_ids[v]))
            descs.append(f["desc"])
            valids.append(f["valid"])
        train = jnp.asarray(np.concatenate(descs)[np.concatenate(valids)])
        tree = vt.build_voctree(
            jax.random.PRNGKey(0), train, n_children=tree_branching, n_levels=tree_levels
        )
        bows = jnp.stack(
            [
                vt.bow_vector(tree, jnp.asarray(d), jnp.asarray(m))
                for d, m in zip(descs, valids)
            ]
        )
        db = vt.build_database(tree, bows)
        pairs = vt.query_pairs(db, n_neighbors=n_neighbors)
    else:
        raise ValueError(method)
    with open(output_pairs, "w") as f:
        for i, j in pairs:
            f.write(f"{i} {j}\n")
    return pairs


def load_pairs(path: str) -> np.ndarray:
    out = []
    with open(path) as f:
        for line in f:
            a, b = line.split()
            out.append((int(a), int(b)))
    return np.array(out, np.int64).reshape(-1, 2)


# ---------------------------------------------------------------------------
# featureMatching (photometric + geometric filter)
# ---------------------------------------------------------------------------


def _match_pairs_batch(desc, valid, ii, jj, ratio):
    """Top-2 ratio matching for a chunk of view pairs in ONE dispatch:
    gathers rows of the stacked (V, N, D) descriptor table and vmaps the
    MXU brute-force matcher."""
    import jax

    from ..matching import descriptor_matching as dm

    global _MATCH_PAIRS_JIT
    if _MATCH_PAIRS_JIT is None:

        def impl(desc, valid, ii, jj, ratio):
            def one(i, j):
                return dm.match_bruteforce(
                    desc[i], desc[j], valid[i], valid[j], ratio=ratio
                ).idx2

            return jax.vmap(one)(ii, jj)

        _MATCH_PAIRS_JIT = jax.jit(impl)
    return _MATCH_PAIRS_JIT(desc, valid, ii, jj, ratio)


_MATCH_PAIRS_JIT = None


def feature_matching(
    input_sfm: str,
    features_folder: str,
    pairs_file: str,
    output_matches: str,
    ratio: float = 0.8,
    geometric: str = "fundamental",  # fundamental | essential | homography_growing | none
    n_ransac_hyps: int = 256,
    max_error_px: float = 4.0,
    range_start: int = 0,
    range_size: int = -1,
) -> None:
    import jax
    import jax.numpy as jnp

    from .. import robust
    from ..matching import descriptor_matching as dm

    sc = sfmdata.load(input_sfm)
    pairs = load_pairs(pairs_file)
    end = len(pairs) if range_size < 0 else min(len(pairs), range_start + range_size)
    pairs = [(int(pairs[p, 0]), int(pairs[p, 1])) for p in range(range_start, end)]

    feats = {}

    def get(v):
        if v not in feats:
            feats[v] = load_features(features_folder, int(sc.view_ids[v]))
        return feats[v]

    key = jax.random.PRNGKey(0)
    out: dict[str, np.ndarray] = {}

    # --- photometric pass, batched 8 pairs per dispatch -----------------
    # Descriptor tables are fixed-capacity per view, so a whole chunk of
    # pairs is one vmapped top-2 matmul (the reference's per-pair OpenMP
    # loop, ImageCollectionMatcher_generic.cpp, becomes a batch axis).
    need = sorted({v for p in pairs for v in p})
    cap_sets: dict = {}
    for v in need:
        cap_sets.setdefault(get(v)["desc"].shape, []).append(v)
    pm_all: dict = {}
    B = 8
    if len(cap_sets) == 1 and len(pairs) > 1:
        desc_d = jnp.asarray(np.stack([get(v)["desc"] for v in need]))
        valid_d = jnp.asarray(np.stack([get(v)["valid"] for v in need]))
        row = {v: r for r, v in enumerate(need)}
        for s in range(0, len(pairs), B):
            chunk = pairs[s : s + B]
            ii = np.array([row[p[0]] for p in chunk], np.int32)
            jj = np.array([row[p[1]] for p in chunk], np.int32)
            pad = B - len(chunk)
            ii = np.pad(ii, (0, pad), mode="edge")
            jj = np.pad(jj, (0, pad), mode="edge")
            idx2 = np.asarray(
                _match_pairs_batch(desc_d, valid_d, jnp.asarray(ii),
                                   jnp.asarray(jj), ratio)
            )
            for g, (i, j) in enumerate(chunk):
                rows = np.nonzero(idx2[g] >= 0)[0]
                pm_all[(i, j)] = np.stack([rows, idx2[g][rows]], axis=-1)
    else:  # mixed feature capacities: per-pair fallback
        for i, j in pairs:
            fi, fj = get(i), get(j)
            m = dm.match_bruteforce(
                jnp.asarray(fi["desc"]), jnp.asarray(fj["desc"]),
                jnp.asarray(fi["valid"]), jnp.asarray(fj["valid"]),
                ratio=ratio,
            )
            pm_all[(i, j)] = dm.matches_to_pairs(m)

    # --- geometric pass, bucketed by (match capacity, image size) -------
    todo_geo: dict = {}
    for i, j in pairs:
        pm = pm_all[(i, j)]
        if len(pm) < 8 or geometric == "none":
            out[f"{i}_{j}"] = pm
            continue
        fi, fj = get(i), get(j)
        if geometric == "homography_growing":
            # multi-plane HGrowing filter (ref: matchingImageCollection/
            # GeometricFilterMatrix_HGrowing.cpp:107-190)
            from ..matching.hgrowing import filter_matches_hgrowing

            _, _, inlier = filter_matches_hgrowing(
                fi["xy"][pm[:, 0]],
                fj["xy"][pm[:, 1]],
                fi["scale"][pm[:, 0]],
                fj["scale"][pm[:, 1]],
                fi["orientation"][pm[:, 0]],
                fj["orientation"][pm[:, 1]],
            )
            out[f"{i}_{j}"] = pm[inlier]
            continue
        # pad to a power-of-two bucket: per-pair match counts all differ,
        # and an unpadded call would RECOMPILE the AC-RANSAC program for
        # every distinct length (measured as the bulk of this stage's wall
        # on the relay-attached chip path)
        cap = 1 << int(np.ceil(np.log2(max(len(pm), 32))))
        w, h = float(sc.view_sizes[i, 0]), float(sc.view_sizes[i, 1])
        todo_geo.setdefault((cap, w, h), []).append((i, j, pm))

    for (cap, w, h), items in todo_geo.items():
        for s in range(0, len(items), B):
            chunk = items[s : s + B]
            Bc = len(chunk)
            x1 = np.zeros((B, cap, 2), np.float32)
            x2 = np.zeros((B, cap, 2), np.float32)
            vmask = np.zeros((B, cap), bool)
            for g, (i, j, pm) in enumerate(chunk):
                n = len(pm)
                fi, fj = get(i), get(j)
                x1[g, :n] = fi["xy"][pm[:, 0]]
                x2[g, :n] = fj["xy"][pm[:, 1]]
                vmask[g, :n] = True
            key, k1 = jax.random.split(key)
            rm = robust.robust_fundamental_batch(
                jax.random.split(k1, B),
                jnp.asarray(x1), jnp.asarray(x2), (w, h),
                jnp.asarray(vmask),
                n_hyps=n_ransac_hyps, max_error_px=max_error_px,
            )
            inl_b = np.asarray(rm.inliers)
            for g, (i, j, pm) in enumerate(chunk[:Bc]):
                out[f"{i}_{j}"] = pm[inl_b[g, : len(pm)]]
    np.savez_compressed(output_matches, **out)


def load_matches(path: str) -> dict:
    out = {}
    with np.load(path) as z:
        for k in z.files:
            i, j = k.split("_")
            out[(int(i), int(j))] = z[k]
    return out


# ---------------------------------------------------------------------------
# incrementalSfm
# ---------------------------------------------------------------------------


def incremental_sfm(
    input_sfm: str,
    features_folder: str,
    matches_file: str,
    output_sfm: str,
    min_track_length: int = 2,
    seed: int = 0,
    config=None,
) -> sfmdata.SfMData:
    """`config` (an IncrementalConfig) overrides the engine defaults —
    e.g. resolution-scaled outlier gates for high-resolution captures."""
    from ..sfm.incremental import IncrementalConfig, IncrementalSfM
    from ..tracks.builder import build_tracks

    sc = sfmdata.load(input_sfm)
    matches = load_matches(matches_file)
    feats = {
        v: load_features(features_folder, int(sc.view_ids[v]))
        for v in range(sc.n_views)
    }
    nfeat = {v: len(feats[v]["xy"]) for v in feats}
    tracks = build_tracks(matches, nfeat, min_track_length=min_track_length)
    features_xy = {v: feats[v]["xy"] for v in feats}

    engine = IncrementalSfM(
        tracks,
        features_xy,
        sc.intrinsics_table(),
        view_intrinsic=sc.view_intrinsic,
        image_sizes=sc.view_sizes,
        config=config if config is not None else IncrementalConfig(seed=seed),
    )
    engine.process()
    out = engine.to_sfmdata(view_ids=sc.view_ids)
    # carry over paths/sizes
    out.view_paths = list(sc.view_paths)
    sfmdata.save(out, output_sfm)
    return out


# ---------------------------------------------------------------------------
# modular engine stages (tracksBuilding / sfmBootstraping / sfmExpanding)
# (ref: src/software/pipeline/main_tracksBuilding.cpp,
#  main_sfmBootstraping.cpp:307-343, main_sfmExpanding.cpp:206-211)
# ---------------------------------------------------------------------------


def tracks_building(
    input_sfm: str,
    features_folder: str,
    matches_file: str,
    output_tracks: str,
    min_track_length: int = 2,
) -> None:
    from ..tracks.builder import build_tracks

    sc = sfmdata.load(input_sfm)
    matches = load_matches(matches_file)
    nfeat = {
        v: len(load_features(features_folder, int(sc.view_ids[v]))["xy"])
        for v in range(sc.n_views)
    }
    tr = build_tracks(matches, nfeat, min_track_length=min_track_length)
    np.savez_compressed(
        output_tracks,
        track_ids=tr.track_ids,
        views=tr.views,
        features=tr.features,
        n_tracks=np.int64(tr.n_tracks),
    )


def _engine_from_files(input_sfm, features_folder, tracks_file, seed=0):
    from ..sfm.incremental import IncrementalConfig, IncrementalSfM
    from ..tracks.builder import Tracks

    sc = sfmdata.load(input_sfm)
    with np.load(tracks_file) as z:
        tr = Tracks(z["track_ids"], z["views"], z["features"], int(z["n_tracks"]))
    feats = {
        v: load_features(features_folder, int(sc.view_ids[v]))
        for v in range(sc.n_views)
    }
    engine = IncrementalSfM(
        tr,
        {v: feats[v]["xy"] for v in feats},
        sc.intrinsics_table(),
        view_intrinsic=sc.view_intrinsic,
        image_sizes=sc.view_sizes,
        config=IncrementalConfig(seed=seed),
    )
    # SfM-augmentation: adopt any poses already present in the scene.
    for v in range(sc.n_views):
        p = int(sc.view_pose[v])
        if p >= 0:
            engine.res.pose_R[v] = sc.pose_R[p]
            engine.res.pose_c[v] = sc.pose_c[p]
            engine.res.posed[v] = True
    if engine.res.posed.any():
        engine.triangulate_all()
    return sc, engine


def sfm_bootstrapping(
    input_sfm: str, features_folder: str, tracks_file: str, output_sfm: str
) -> None:
    from ..sfm.expansion import ExpansionProcess

    sc, engine = _engine_from_files(input_sfm, features_folder, tracks_file)
    proc = ExpansionProcess(engine)
    if not proc.bootstrap():
        raise RuntimeError("bootstrap failed")
    out = engine.to_sfmdata(view_ids=sc.view_ids)
    out.view_paths = list(sc.view_paths)
    sfmdata.save(out, output_sfm)


def sfm_expanding(
    input_sfm: str, features_folder: str, tracks_file: str, output_sfm: str
) -> None:
    from ..sfm.expansion import ExpansionProcess

    sc, engine = _engine_from_files(input_sfm, features_folder, tracks_file)
    ExpansionProcess(engine).process()
    out = engine.to_sfmdata(view_ids=sc.view_ids)
    out.view_paths = list(sc.view_paths)
    sfmdata.save(out, output_sfm)


# ---------------------------------------------------------------------------
# prepareDenseScene (undistort)
# ---------------------------------------------------------------------------


def prepare_dense_scene(input_sfm: str, output_folder: str) -> None:
    """Undistorted grayscale images for MVS (main_prepareDenseScene.cpp)."""
    import jax.numpy as jnp

    from ..image.filtering import bilinear_sample

    sc = sfmdata.load(input_sfm)
    _ensure_dir(output_folder)
    intr = sc.intrinsics_table()
    for v in sc.valid_views():
        out = os.path.join(output_folder, f"{int(sc.view_ids[v])}.npy")
        if os.path.exists(out) or not sc.view_paths[v]:
            continue
        img = read_image(sc.view_paths[v], grayscale=True)
        ii = int(sc.view_intrinsic[v])
        row = cam.Intrinsics(
            *[jnp.asarray(np.asarray(x)[ii]) for x in intr]
        )
        H, W = img.shape
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
        # undistorted pixel -> distorted source pixel
        p = cam.ima2cam(row, pix)
        pd = cam.add_distortion(row.disto_kind, row.disto, p)
        src = cam.cam2ima(row, pd)
        vals = bilinear_sample(jnp.asarray(img), src)
        write_image(out, np.asarray(vals).reshape(H, W))


# ---------------------------------------------------------------------------
# depthMapEstimation / Filtering / meshing(point cloud)
# ---------------------------------------------------------------------------


def depth_map_estimation(
    input_sfm: str,
    images_folder: str,
    output_folder: str,
    n_depths: int = 96,
    n_tcams: int = 4,
    downscale: int = 2,
    range_start: int = 0,
    range_size: int = -1,
    refine: bool = False,
    color_opt_iters: int = 20,
    tile_size: int = 0,
    tile_overlap: int = 64,
) -> None:
    import jax
    import jax.numpy as jnp

    from ..mvs import plane_sweep as ps
    from ..mvs.fusion import depth_range_from_landmarks

    sc = sfmdata.load(input_sfm)
    _ensure_dir(output_folder)
    valid = sc.valid_views()
    end = len(valid) if range_size < 0 else min(len(valid), range_start + range_size)

    # camera tables
    K_all, R_all, c_all, imgs = {}, {}, {}, {}
    for v in valid:
        ii = int(sc.view_intrinsic[v])
        fx, fy = sc.scale[ii] / downscale
        pp = (sc.offset[ii] + 0.5 * sc.sizes[ii]) / downscale
        K_all[v] = np.array([[fx, 0, pp[0]], [0, fy, pp[1]], [0, 0, 1.0]], np.float32)
        p = int(sc.view_pose[v])
        R_all[v] = sc.pose_R[p].astype(np.float32)
        c_all[v] = sc.pose_c[p].astype(np.float32)
        path = os.path.join(images_folder, f"{int(sc.view_ids[v])}.npy")
        img = read_image(path, grayscale=True)
        if downscale > 1:
            img = img[::downscale, ::downscale]
        imgs[v] = img.astype(np.float32)

    centers = np.stack([c_all[v] for v in valid])
    for k in range(range_start, end):
        rc = valid[k]
        out_d = os.path.join(output_folder, f"{int(sc.view_ids[rc])}_depth.npy")
        if os.path.exists(out_d):
            continue
        # T-cam selection: nearest posed views (MultiViewParams pair selection)
        d = np.linalg.norm(centers - c_all[rc], axis=1)
        order = [valid[i] for i in np.argsort(d) if valid[i] != rc][:n_tcams]
        # relative poses: x_t = R_rel x_ref + t_rel with
        # x_t = R_t (x_w - c_t), x_w = R_rc^T x_ref + c_rc
        R_rel = np.stack([R_all[t] @ R_all[rc].T for t in order])
        t_rel = np.stack([R_all[t] @ (c_all[rc] - c_all[t]) for t in order])

        # SfM-seeded per-view depth list + per-T-cam sub-ranges
        # (SgmDepthList semantics: only the landmarks THIS view observes
        # define its hypothesis range; each tcam sweeps the indices whose
        # principal-ray point it can actually see.
        # ref: src/aliceVision/depthMap/SgmDepthList.cpp:48-75,272,412)
        from ..mvs.depth_list import sgm_depth_list

        hw_all = {
            v: (imgs[v].shape[1], imgs[v].shape[0]) for v in valid
        }
        d_min, d_max = depth_range_from_landmarks(sc.points, R_all[rc], c_all[rc])
        dl = sgm_depth_list(
            sc.points, sc.obs_landmark, sc.obs_view, sc.obs_uv,
            rc, R_all, c_all, K_all, hw_all, order, n_depths,
            fallback_range=(d_min, d_max),
        )
        tc_ranges = np.stack(
            [dl.depths[dl.tc_limits[:, 0]],
             dl.depths[np.clip(dl.tc_limits[:, 1] - 1, 0, n_depths - 1)]],
            axis=1,
        ).astype(np.float32)
        logging.getLogger("alicevision_tpu").info(
            "depthMap view %d: %d planes in [%.3f, %.3f] from %d seeds; "
            "tcam plane counts %s",
            int(sc.view_ids[rc]), len(dl.depths), dl.d_min, dl.d_max,
            dl.n_obs, (dl.tc_limits[:, 1] - dl.tc_limits[:, 0]).tolist(),
        )
        params = ps.SgmParams(n_depths=n_depths)
        H_im, W_im = imgs[rc].shape
        if tile_size and max(H_im, W_im) > tile_size:
            # Tiled large-image path (mvsUtils::TileParams contract,
            # ref: depthMap/DepthMapEstimator.cpp:238-270 tile batching,
            # SgmDepthList.cpp:272-340 per-tile ROI seeds): each tile gets
            # its OWN SfM-seeded depth list restricted to the landmarks
            # observed inside the tile (full-size pixel ROI), a shifted
            # principal point, and the full T-cam images; tiles merge with
            # Hann weights (mapIO addTileMapWeighted).
            from ..mvs.rectified import rectification_ok
            from ..mvs.sharded import (
                _batched_sgm_jit,
                make_tiles,
                merge_tiles,
            )

            t_stack = jnp.asarray(np.stack([imgs[t] for t in order]))
            Kt_j = jnp.asarray(np.stack([K_all[t] for t in order]))
            Rr_j = jnp.asarray(R_rel.astype(np.float32))
            tr_j = jnp.asarray(t_rel.astype(np.float32))
            rois = make_tiles(H_im, W_im, tile_size, tile_overlap, clamp=True)
            crops, Kcs, depth_lists, tc_lists = [], [], [], []
            for (y0, y1, x0, x1) in rois:
                roi_full = (
                    x0 * downscale, y0 * downscale,
                    x1 * downscale, y1 * downscale,
                )
                dl_t = sgm_depth_list(
                    sc.points, sc.obs_landmark, sc.obs_view, sc.obs_uv,
                    rc, R_all, c_all, K_all, hw_all, order, n_depths,
                    roi=roi_full, fallback_range=(dl.d_min, dl.d_max),
                )
                tc_t = np.stack(
                    [dl_t.depths[dl_t.tc_limits[:, 0]],
                     dl_t.depths[np.clip(dl_t.tc_limits[:, 1] - 1, 0,
                                         n_depths - 1)]],
                    axis=1,
                ).astype(np.float32)
                K_crop = K_all[rc].copy()
                K_crop[0, 2] -= x0
                K_crop[1, 2] -= y0
                crops.append(imgs[rc][y0:y1, x0:x1])
                Kcs.append(K_crop.astype(np.float32))
                depth_lists.append(np.asarray(dl_t.depths, np.float32))
                tc_lists.append(tc_t)
            # uniform clamped tiles -> vmapped batch dispatches (the
            # reference fills the device with same-size tiles the same
            # way, depthMap/DepthMapEstimator.cpp:238-270); gate the
            # rectified path ONCE on the host (poses are tile-invariant)
            shapes = {c.shape for c in crops}
            tiles_out = []
            if len(shapes) == 1 and len(rois) > 1:
                ok = all(
                    rectification_ok(R_rel[t], t_rel[t])
                    for t in range(R_rel.shape[0])
                )
                params_b = params._replace(
                    method="rectified" if ok else "gather"
                )
                # tiles per dispatch: batched volumes spill v5e HBM at
                # >=768^2 tiles (measured 6x LOSS at 1024^2, B=2) — batch
                # only small tiles
                TB = 4 if tile_size < 768 else 1
                for s in range(0, len(rois), TB):
                    sl = slice(s, s + TB)
                    B = len(crops[sl])
                    d_b, _ = _batched_sgm_jit(
                        jnp.asarray(np.stack(crops[sl], 0), jnp.float32),
                        jnp.broadcast_to(t_stack[None], (B,) + t_stack.shape),
                        jnp.asarray(np.stack(Kcs[sl], 0)),
                        jnp.broadcast_to(Kt_j[None], (B,) + Kt_j.shape),
                        jnp.broadcast_to(Rr_j[None], (B,) + Rr_j.shape),
                        jnp.broadcast_to(tr_j[None], (B,) + tr_j.shape),
                        jnp.asarray(np.stack(depth_lists[sl], 0)),
                        params_b,
                        tc_depth_ranges=jnp.asarray(np.stack(tc_lists[sl], 0)),
                    )
                    d_np = np.asarray(d_b)
                    for i, roi in enumerate(rois[sl]):
                        tiles_out.append((roi, d_np[i]))
            else:
                for i, (y0, y1, x0, x1) in enumerate(rois):
                    d_t, _ = ps.sgm_depth_map(
                        jnp.asarray(crops[i]),
                        t_stack,
                        jnp.asarray(Kcs[i]),
                        Kt_j, Rr_j, tr_j,
                        float(depth_lists[i][0]), float(depth_lists[i][-1]),
                        params,
                        depths=depth_lists[i], tc_depth_ranges=tc_lists[i],
                    )
                    tiles_out.append(((y0, y1, x0, x1), np.asarray(d_t)))
            depth = jnp.asarray(merge_tiles(tiles_out, H_im, W_im))
            sim = jnp.zeros_like(depth)
        else:
            depth, sim = ps.sgm_depth_map(
                jnp.asarray(imgs[rc]),
                jnp.asarray(np.stack([imgs[t] for t in order])),
                jnp.asarray(K_all[rc]),
                jnp.asarray(np.stack([K_all[t] for t in order])),
                jnp.asarray(R_rel.astype(np.float32)),
                jnp.asarray(t_rel.astype(np.float32)),
                dl.d_min,
                dl.d_max,
                params,
                depths=dl.depths,
                tc_depth_ranges=tc_ranges,
            )
        if refine:
            from ..mvs.refine import color_guided_optimize, refine_depth_map_auto

            depth, sim = refine_depth_map_auto(
                depth,
                jnp.asarray(imgs[rc]),
                jnp.asarray(np.stack([imgs[t] for t in order])),
                jnp.asarray(K_all[rc]),
                jnp.asarray(np.stack([K_all[t] for t in order])),
                jnp.asarray(R_rel.astype(np.float32)),
                jnp.asarray(t_rel.astype(np.float32)),
                depth_range=(float(dl.d_min), float(dl.d_max)),
            )
            depth = color_guided_optimize(
                depth, jnp.asarray(imgs[rc]), iterations=color_opt_iters
            )
        np.save(out_d, np.asarray(depth))
        np.save(
            os.path.join(output_folder, f"{int(sc.view_ids[rc])}_sim.npy"),
            np.asarray(sim),
        )


def depth_map_filtering(
    input_sfm: str,
    depth_folder: str,
    output_folder: str,
    min_consistent: int = 3,
    downscale: int = 2,
    compute_normal_maps: bool = False,
    n_nearest_cams: int = 0,
) -> None:
    """Cross-view consistency filtering of per-view depth maps.

    n_nearest_cams > 0 bounds each view's consistency set to its ±k ring
    neighbours in view order (the reference checks against a bounded
    neighbour-camera set, fuseCut/Fuser.hpp:21-34 + maxNbNearestCams);
    0 = all-pairs."""
    import jax.numpy as jnp

    from ..mvs.fusion import consistency_filter, consistency_filter_ring

    sc = sfmdata.load(input_sfm)
    _ensure_dir(output_folder)
    valid = sc.valid_views()
    depths, Ks, Rs, cs, ids = [], [], [], [], []
    for v in valid:
        vid = int(sc.view_ids[v])
        p = os.path.join(depth_folder, f"{vid}_depth.npy")
        if not os.path.exists(p):
            continue
        depths.append(np.load(p))
        ii = int(sc.view_intrinsic[v])
        fx, fy = sc.scale[ii] / downscale
        pp = (sc.offset[ii] + 0.5 * sc.sizes[ii]) / downscale
        Ks.append(np.array([[fx, 0, pp[0]], [0, fy, pp[1]], [0, 0, 1.0]], np.float32))
        pi = int(sc.view_pose[v])
        Rs.append(sc.pose_R[pi].astype(np.float32))
        cs.append(sc.pose_c[pi].astype(np.float32))
        ids.append(vid)
    if not depths:
        return
    if n_nearest_cams > 0:
        filt, counts = consistency_filter_ring(
            jnp.asarray(np.stack(depths)),
            jnp.asarray(np.stack(Ks)),
            jnp.asarray(np.stack(Rs)),
            jnp.asarray(np.stack(cs)),
            k=n_nearest_cams,
            min_consistent=min_consistent,
        )
    else:
        filt, counts = consistency_filter(
            jnp.asarray(np.stack(depths)),
            jnp.asarray(np.stack(Ks)),
            jnp.asarray(np.stack(Rs)),
            jnp.asarray(np.stack(cs)),
            min_consistent=min_consistent,
        )
    filt = np.asarray(filt)
    for i, vid in enumerate(ids):
        np.save(os.path.join(output_folder, f"{vid}_depth.npy"), filt[i])
    if compute_normal_maps:
        # per-view normals from the filtered depths
        # (ref: main_depthMapFiltering.cpp:147-152 NormalMapEstimator)
        from ..image.io import write_image
        from ..mvs.normals import normal_map_from_depth

        for i, vid in enumerate(ids):
            n = np.asarray(
                normal_map_from_depth(jnp.asarray(filt[i]), jnp.asarray(Ks[i]))
            )
            write_image(
                os.path.join(output_folder, f"{vid}_normalMap.exr"), n
            )


def meshing_point_cloud(
    input_sfm: str,
    depth_folder: str,
    output_ply: str,
    voxel_size: float = 0.0,
    downscale: int = 2,
) -> np.ndarray:
    from ..mvs.fusion import fuse_point_cloud

    sc = sfmdata.load(input_sfm)
    valid = sc.valid_views()
    depths, Ks, Rs, cs = [], [], [], []
    for v in valid:
        p = os.path.join(depth_folder, f"{int(sc.view_ids[v])}_depth.npy")
        if not os.path.exists(p):
            continue
        depths.append(np.load(p))
        ii = int(sc.view_intrinsic[v])
        fx, fy = sc.scale[ii] / downscale
        pp = (sc.offset[ii] + 0.5 * sc.sizes[ii]) / downscale
        Ks.append(np.array([[fx, 0, pp[0]], [0, fy, pp[1]], [0, 0, 1.0]]))
        pi = int(sc.view_pose[v])
        Rs.append(sc.pose_R[pi])
        cs.append(sc.pose_c[pi])
    pts, cols, views = fuse_point_cloud(
        np.stack(depths), None, np.stack(Ks), np.stack(Rs), np.stack(cs),
        voxel_size=voxel_size,
    )
    # write PLY
    with open(output_ply, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property double x\nproperty double y\nproperty double z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pts, cols):
            f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
    return pts


def meshing_surface(
    input_sfm: str,
    depth_folder: str,
    output_obj: str,
    voxel_size: float = 0.0,
    downscale: int = 2,
    max_points: int = 50000,
    smooth_iters: int = 3,
    images_folder: str | None = None,
) -> tuple:
    """Graph-cut surface from fused depth maps (main_meshing equivalent):
    fuse -> Delaunay + visibility cut -> largest component -> Taubin smooth
    -> optional per-vertex color bake -> OBJ."""
    from ..mesh import (
        bake_vertex_colors,
        graph_cut_surface,
        laplacian_smooth,
        largest_component,
        save_obj,
    )
    from ..mvs.fusion import fuse_point_cloud

    sc = sfmdata.load(input_sfm)
    valid = sc.valid_views()
    depths, Ks, Rs, cs, view_rows = [], [], [], [], []
    for v in valid:
        p = os.path.join(depth_folder, f"{int(sc.view_ids[v])}_depth.npy")
        if not os.path.exists(p):
            continue
        depths.append(np.load(p))
        ii = int(sc.view_intrinsic[v])
        fx, fy = sc.scale[ii] / downscale
        pp = (sc.offset[ii] + 0.5 * sc.sizes[ii]) / downscale
        Ks.append(np.array([[fx, 0, pp[0]], [0, fy, pp[1]], [0, 0, 1.0]]))
        pi = int(sc.view_pose[v])
        Rs.append(sc.pose_R[pi])
        cs.append(sc.pose_c[pi])
        view_rows.append(v)
    if not depths:
        raise FileNotFoundError(
            f"no '<viewId>_depth.npy' maps found in {depth_folder!r} — run "
            "depthMapEstimation/depthMapFiltering first"
        )
    Ks, Rs, cs = np.stack(Ks), np.stack(Rs), np.stack(cs)
    pts, cols, views = fuse_point_cloud(
        np.stack(depths), None, Ks, Rs, cs, voxel_size=voxel_size
    )
    if len(pts) > max_points:
        sel = np.random.RandomState(0).choice(len(pts), max_points, replace=False)
        pts, views = pts[sel], views[sel]
    verts, faces = graph_cut_surface(pts, np.arange(len(pts)), cs[views])
    verts, faces = largest_component(verts, faces)
    if smooth_iters:
        verts = laplacian_smooth(verts, faces, iterations=smooth_iters)
    colors = None
    if images_folder is not None:
        imgs = []
        for v in view_rows:
            path = os.path.join(images_folder, f"{int(sc.view_ids[v])}.npy")
            img = read_image(path, grayscale=True)
            if downscale > 1:
                img = img[::downscale, ::downscale]
            imgs.append(img)
        colors = bake_vertex_colors(verts, faces, imgs, Ks, Rs, cs,
                                    depth_maps=list(np.stack(depths)))
    save_obj(output_obj, verts, faces, colors)
    return verts, faces
