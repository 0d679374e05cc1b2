"""Additional `av` subcommands — full parity with the reference tool list.

The reference ships ~100 per-stage executables under src/software/
(ref: SURVEY.md §2.7). cli.py holds the core pipeline stages; this module
registers the long tail through a small (name, parser-setup, handler)
registry so each tool stays a focused function.
"""

from __future__ import annotations

import json
import os
import sys

_COMMANDS: list = []  # (name, setup_fn, handler_fn)


def command(name, setup):
    def deco(fn):
        _COMMANDS.append((name, setup, fn))
        return fn

    return deco


def register(sub, add_common) -> None:
    for name, setup, handler in _COMMANDS:
        p = sub.add_parser(name)
        setup(p)
        add_common(p)
        p.set_defaults(_handler=handler)


def _ensure_parent(path):
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)


# ---------------------------------------------------------------------------
# SfM scene utilities
# ---------------------------------------------------------------------------


def _setup_merge(p):
    p.add_argument("--input", required=True)
    p.add_argument("--input2", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--alignment", action="store_true",
                   help="align the second scene onto the first before merging")


@command("sfmMerge", _setup_merge)
def _sfm_merge(args):
    """ref: src/software/utils/main_sfmMerge.cpp"""
    from .. import sfmdata
    from ..sfmdata.merge import merge_scenes

    out = merge_scenes(sfmdata.load(args.input), sfmdata.load(args.input2),
                       align=args.alignment)
    sfmdata.save(out, args.output)
    print(json.dumps({"views": out.n_views, "landmarks": out.n_landmarks}))


def _setup_split(p):
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="reconstructed part")
    p.add_argument("--outputNonReconstructed", default=None)


@command("sfmSplitReconstructed", _setup_split)
def _sfm_split(args):
    """ref: src/software/utils/main_sfmSplitReconstructed.cpp"""
    from .. import sfmdata
    from ..sfmdata.merge import split_reconstructed

    rec, non = split_reconstructed(sfmdata.load(args.input))
    sfmdata.save(rec, args.output)
    if args.outputNonReconstructed:
        sfmdata.save(non, args.outputNonReconstructed)


def _setup_align(p):
    p.add_argument("--input", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--noScale", action="store_true")


@command("sfmAlignment", _setup_align)
def _sfm_alignment(args):
    """ref: src/software/utils/main_sfmAlignment.cpp"""
    from .. import sfmdata
    from ..sfm.alignment import align_to_scene

    sc = sfmdata.load(args.input)
    align_to_scene(sc, sfmdata.load(args.reference), with_scale=not args.noScale)
    sfmdata.save(sc, args.output)


def _setup_transfer(p):
    p.add_argument("--input", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--method", default="from_viewid",
                   choices=["from_viewid", "from_filepath"])
    p.add_argument("--transferPoses", action="store_true", default=True)
    p.add_argument("--transferIntrinsics", action="store_true")


@command("sfmTransfer", _setup_transfer)
def _sfm_transfer(args):
    """ref: src/software/utils/main_sfmTransfer.cpp"""
    from .. import sfmdata
    from ..sfm.transfer import transfer_intrinsics, transfer_poses

    sc = sfmdata.load(args.input)
    ref = sfmdata.load(args.reference)
    by = "filename" if args.method == "from_filepath" else "viewId"
    n_pose = transfer_poses(sc, ref, match_by=by) if args.transferPoses else 0
    n_intr = transfer_intrinsics(sc, ref, match_by=by) if args.transferIntrinsics else 0
    sfmdata.save(sc, args.output)
    print(json.dumps({"poses": n_pose, "intrinsics": n_intr}))


def _setup_applycal(p):
    p.add_argument("--input", required=True)
    p.add_argument("--calibration", required=True,
                   help="calibrated .sfm or checkerboardCalibration .json")
    p.add_argument("--output", required=True)


@command("applyCalibration", _setup_applycal)
def _apply_calibration(args):
    """ref: src/software/utils/main_applyCalibration.cpp"""
    from .. import sfmdata
    from ..sfm.transfer import apply_calibration

    sc = sfmdata.load(args.input)
    n = apply_calibration(sc, args.calibration)
    sfmdata.save(sc, args.output)
    print(json.dumps({"intrinsics_updated": n}))


def _setup_distances(p):
    p.add_argument("--input", required=True)
    p.add_argument("--landmarksA", default="", help="comma-separated ids")
    p.add_argument("--landmarksB", default="", help="comma-separated ids")


@command("sfmDistances", _setup_distances)
def _sfm_distances(args):
    """ref: src/software/utils/main_sfmDistances.cpp"""
    import numpy as np

    from .. import sfmdata
    from ..sfm.transfer import landmark_distances

    sc = sfmdata.load(args.input)
    if args.landmarksA and args.landmarksB:
        a = [int(x) for x in args.landmarksA.split(",")]
        b = [int(x) for x in args.landmarksB.split(",")]
        print(json.dumps({"distances": landmark_distances(sc, a, b)}))
    else:
        ext = sc.points.max(0) - sc.points.min(0) if sc.n_landmarks else np.zeros(3)
        print(json.dumps({"bbox_extent": [float(x) for x in ext]}))


def _setup_regression(p):
    p.add_argument("--input", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--maxRotationDeg", type=float, default=1.0)
    p.add_argument("--maxCenterDist", type=float, default=0.1)


@command("sfmRegression", _setup_regression)
def _sfm_regression(args):
    """ref: src/software/utils/main_sfmRegression.cpp"""
    from .. import sfmdata
    from ..sfm.transfer import compare_scenes

    rep = compare_scenes(sfmdata.load(args.input), sfmdata.load(args.reference))
    print(json.dumps(rep, indent=1))
    ok = (
        rep["rotation_deg_max"] <= args.maxRotationDeg
        and rep["center_dist_max"] <= args.maxCenterDist
    )
    if not ok:
        sys.exit(2)


def _setup_harmonize(p):
    p.add_argument("--input", required=True, help=".sfm")
    p.add_argument("--features", required=True, help="features folder")
    p.add_argument("--matches", required=True)
    p.add_argument("--imagesFolder", required=True)
    p.add_argument("--output", required=True, help="folder of harmonized images")


@command("sfmColorHarmonize", _setup_harmonize)
def _sfm_color_harmonize(args):
    """Gain/offset color consistency across matched views
    (ref: src/software/pipeline/main_sfmColorHarmonize.cpp,
    colorHarmonization/GainOffsetConstraintBuilder.cpp). Per-pair matched
    mean intensities feed the IRLS gain/offset solve."""
    import numpy as np

    from .. import sfmdata
    from ..image.io import read_image, write_image
    from ..misc.color_harmonization import harmonize_gains
    from .stages import load_features, load_matches

    from ..misc.color_harmonization import matched_quantile_constraints

    sc = sfmdata.load(args.input)
    matches = load_matches(args.matches)
    imgs = {}
    for v in range(sc.n_views):
        path = sc.view_paths[v]
        if path and os.path.exists(path):
            imgs[v] = read_image(path, grayscale=True)
    feats = {}

    def get_xy(v):
        if v not in feats:
            feats[v] = load_features(args.features, int(sc.view_ids[v]))["xy"]
        return feats[v]

    edges, mi, mj = [], [], []
    for (i, j), m in matches.items():
        if i not in imgs or j not in imgs or len(m) == 0:
            continue
        # matched-region quantiles around the matched feature patches
        # (GainOffsetConstraintBuilder histogram constraints)
        q_i, q_j = matched_quantile_constraints(
            imgs[i], imgs[j], get_xy(i)[m[:, 0]], get_xy(j)[m[:, 1]]
        )
        for a, b in zip(q_i, q_j):
            edges.append((i, j))
            mi.append(float(a))
            mj.append(float(b))
    if not edges:
        raise RuntimeError("no usable pairs for harmonization")
    import jax.numpy as jnp

    gains, offsets = harmonize_gains(
        sc.n_views, np.asarray(edges), jnp.asarray(mi), jnp.asarray(mj)
    )
    os.makedirs(args.output, exist_ok=True)
    g = np.asarray(gains)
    o = np.asarray(offsets)
    for v, img in imgs.items():
        out = np.clip(img * g[v] + o[v], 0.0, 1.0)
        write_image(os.path.join(args.output, f"{int(sc.view_ids[v])}.png"), out)
    print(json.dumps({"views": len(imgs)}))


# ---------------------------------------------------------------------------
# global SfM / relative poses / triangulation
# ---------------------------------------------------------------------------


def _setup_relpose(p):
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--matches", required=True)
    p.add_argument("--output", required=True, help="relative poses .npz")


@command("relativePoseEstimating", _setup_relpose)
def _relative_pose_estimating(args):
    """Per-pair essential decomposition
    (ref: src/software/pipeline/main_relativePoseEstimating.cpp)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from .. import camera as camm
    from .. import robust, sfmdata
    from .stages import load_features, load_matches

    sc = sfmdata.load(args.input)
    matches = load_matches(args.matches)
    intr = sc.intrinsics_table()
    key = jax.random.PRNGKey(0)
    edges, R_rel, dirs, n_inl = [], [], [], []
    feats = {}

    def get(v):
        if v not in feats:
            feats[v] = load_features(args.features, int(sc.view_ids[v]))
        return feats[v]

    for (i, j), m in matches.items():
        if len(m) < 8:
            continue
        fi, fj = get(i), get(j)

        def norm_pts(f, v, idx):
            ii = int(sc.view_intrinsic[v])
            row = camm.Intrinsics(*[jnp.asarray(np.asarray(x)[ii]) for x in intr])
            p = camm.ima2cam(row, jnp.asarray(f["xy"][idx], jnp.float32))
            return camm.remove_distortion(row.disto_kind, row.disto, p)

        x1 = norm_pts(fi, i, m[:, 0])
        x2 = norm_pts(fj, j, m[:, 1])
        f_mean = float(np.mean(sc.scale[int(sc.view_intrinsic[i])]))
        w, h = float(sc.view_sizes[i, 0]), float(sc.view_sizes[i, 1])
        key, k1 = jax.random.split(key)
        R, t, rm = robust.robust_relative_pose(k1, x1, x2, f_mean, (w, h))
        inl = int(np.asarray(rm.inliers).sum())
        if inl < 12:
            continue
        edges.append((i, j))
        R_rel.append(np.asarray(R))
        # direction of c_j - c_i in camera-i frame: -R^T t normalized
        d = -np.asarray(R).T @ np.asarray(t)
        nrm = np.linalg.norm(d)
        dirs.append(d / max(nrm, 1e-12))
        n_inl.append(inl)
    _ensure_parent(args.output)
    np.savez_compressed(
        args.output,
        edges=np.asarray(edges, np.int64).reshape(-1, 2),
        R_rel=np.asarray(R_rel).reshape(-1, 3, 3),
        dirs=np.asarray(dirs).reshape(-1, 3),
        inliers=np.asarray(n_inl, np.int64),
    )
    print(json.dumps({"pairs": len(edges)}))


def _setup_globalsfm(p):
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--matches", required=True)
    p.add_argument("--relativePoses", default=None,
                   help="precomputed .npz from relativePoseEstimating")
    p.add_argument("--output", required=True)
    p.add_argument("--minTrackLength", type=int, default=2)


@command("globalSfM", _setup_globalsfm)
def _global_sfm(args):
    """Rotation/translation averaging reconstruction
    (ref: src/software/pipeline/main_globalSfM.cpp,
    sfm/pipeline/global/ReconstructionEngine_globalSfM.hpp:36-53)."""
    import numpy as np
    import jax

    from .. import sfmdata
    from ..sfm.global_sfm import GlobalSfM
    from ..sfm.incremental import IncrementalConfig, IncrementalSfM
    from ..tracks.builder import build_tracks
    from .stages import load_features, load_matches

    sc = sfmdata.load(args.input)
    if args.relativePoses and os.path.exists(args.relativePoses):
        with np.load(args.relativePoses) as z:
            edges, R_rel, dirs = z["edges"], z["R_rel"], z["dirs"]
    else:
        tmp = args.output + ".relposes.npz"
        args2 = type("A", (), dict(input=args.input, features=args.features,
                                   matches=args.matches, output=tmp))
        _relative_pose_estimating(args2)
        with np.load(tmp) as z:
            edges, R_rel, dirs = z["edges"], z["R_rel"], z["dirs"]
    if len(edges) < 1:
        raise RuntimeError("no relative poses")
    eng = GlobalSfM(sc.n_views, sc.intrinsics_table(), sc.view_intrinsic,
                    sc.view_sizes)
    R, c = eng.run(edges, R_rel, dirs)
    for v in range(sc.n_views):
        sc.set_pose(v, np.asarray(R[v], np.float64), np.asarray(c[v], np.float64))

    # triangulate tracks against the averaged poses, then one global BA
    matches = load_matches(args.matches)
    feats = {v: load_features(args.features, int(sc.view_ids[v]))
             for v in range(sc.n_views)}
    tracks = build_tracks(matches, {v: len(feats[v]["xy"]) for v in feats},
                          min_track_length=args.minTrackLength)
    engine = IncrementalSfM(
        tracks, {v: feats[v]["xy"] for v in feats}, sc.intrinsics_table(),
        view_intrinsic=sc.view_intrinsic, image_sizes=sc.view_sizes,
        config=IncrementalConfig(),
    )
    for v in range(sc.n_views):
        engine.res.pose_R[v] = np.asarray(R[v])
        engine.res.pose_c[v] = np.asarray(c[v])
        engine.res.posed[v] = True
    engine.triangulate_all()
    engine.bundle_adjust()
    engine.remove_outliers()
    out = engine.to_sfmdata(view_ids=sc.view_ids)
    out.view_paths = list(sc.view_paths)
    sfmdata.save(out, args.output)
    print(json.dumps({"poses": int(engine.res.posed.sum()),
                      "landmarks": out.n_landmarks}))


def _setup_triangulate(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--features", required=True)
    p.add_argument("--tracks", default=None, help="tracks .npz")
    p.add_argument("--matches", default=None, help="or matches .npz")
    p.add_argument("--output", required=True)
    p.add_argument("--minTrackLength", type=int, default=2)


def _triangulate_known_poses(args):
    import numpy as np

    from .. import sfmdata
    from ..sfm.incremental import IncrementalConfig, IncrementalSfM
    from ..tracks.builder import Tracks, build_tracks
    from .stages import load_features, load_matches

    sc = sfmdata.load(args.input)
    feats = {v: load_features(args.features, int(sc.view_ids[v]))
             for v in range(sc.n_views)}
    if args.tracks:
        with np.load(args.tracks) as z:
            tracks = Tracks(z["track_ids"], z["views"], z["features"],
                            int(z["n_tracks"]))
    elif args.matches:
        matches = load_matches(args.matches)
        tracks = build_tracks(matches, {v: len(feats[v]["xy"]) for v in feats},
                              min_track_length=args.minTrackLength)
    else:
        raise RuntimeError("give --tracks or --matches")
    engine = IncrementalSfM(
        tracks, {v: feats[v]["xy"] for v in feats}, sc.intrinsics_table(),
        view_intrinsic=sc.view_intrinsic, image_sizes=sc.view_sizes,
        config=IncrementalConfig(),
    )
    for v in range(sc.n_views):
        p = int(sc.view_pose[v])
        if p >= 0:
            engine.res.pose_R[v] = sc.pose_R[p]
            engine.res.pose_c[v] = sc.pose_c[p]
            engine.res.posed[v] = True
    engine.triangulate_all()
    out = engine.to_sfmdata(view_ids=sc.view_ids)
    out.view_paths = list(sc.view_paths)
    sfmdata.save(out, args.output)
    print(json.dumps({"landmarks": out.n_landmarks}))


command("sfmTriangulation", _setup_triangulate)(_triangulate_known_poses)
command("computeStructureFromKnownPoses", _setup_triangulate)(
    _triangulate_known_poses
)


def _setup_select_connected(p):
    p.add_argument("--input", required=True)
    p.add_argument("--matches", required=True)
    p.add_argument("--output", required=True, help="kept view-id list file")
    p.add_argument("--minLinks", type=int, default=1)


@command("selectConnectedViews", _setup_select_connected)
def _select_connected_views(args):
    """ref: src/software/pipeline/main_selectConnectedViews.cpp"""
    import numpy as np

    from .. import sfmdata
    from .stages import load_matches

    sc = sfmdata.load(args.input)
    links = np.zeros(sc.n_views, np.int64)
    for (i, j), m in load_matches(args.matches).items():
        if len(m):
            links[i] += 1
            links[j] += 1
    keep = np.nonzero(links >= args.minLinks)[0]
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        for v in keep:
            f.write(f"{int(sc.view_ids[v])}\n")
    print(json.dumps({"kept": len(keep), "total": sc.n_views}))


def _setup_frustum(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--output", required=True, help="pair list file")
    p.add_argument("--zNear", type=float, default=None)
    p.add_argument("--zFar", type=float, default=None)


@command("frustumFiltering", _setup_frustum)
def _frustum_filtering(args):
    """ref: src/software/pipeline/main_frustumFiltering.cpp"""
    from .. import sfmdata
    from ..sfm.frustum import frustum_pairs

    sc = sfmdata.load(args.input)
    pairs = frustum_pairs(sc, z_near=args.zNear, z_far=args.zFar)
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        for i, j in pairs:
            f.write(f"{i} {j}\n")
    print(json.dumps({"pairs": int(len(pairs))}))


# ---------------------------------------------------------------------------
# exports / imports
# ---------------------------------------------------------------------------


def _setup_colored_cloud(p):
    p.add_argument("--input", required=True)
    p.add_argument(
        "--imagesFolder",
        default="",
        help="prepared-image folder (<viewId>.npy); when given, landmarks "
        "are colorized from observation pixels before export",
    )
    p.add_argument("--output", required=True, help=".ply")


@command("exportColoredPointCloud", _setup_colored_cloud)
def _export_colored_point_cloud(args):
    """Colorize landmarks from their observation pixels (colorizeTracks
    greedy view assignment) and write the colored PLY.
    ref: src/software/export/main_exportColoredPointCloud.cpp,
    src/aliceVision/sfmData/colorize.cpp:23-123"""
    from .. import sfmdata

    sc = sfmdata.load(args.input)
    if args.imagesFolder:
        sfmdata.colorize_tracks(
            sc, sfmdata.npy_folder_loader(sc, args.imagesFolder)
        )
    _ensure_parent(args.output)
    sfmdata.save_ply(sc, args.output)
    print(json.dumps({"points": int(len(sc.points)),
                      "colorized": bool(args.imagesFolder)}))


def _setup_export_keypoints(p):
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--output", required=True, help="folder of SVGs")


@command("exportKeypoints", _setup_export_keypoints)
def _export_keypoints(args):
    """ref: src/software/export/main_exportKeypoints.cpp"""
    from .. import sfmdata
    from ..utils.svg import write_keypoints_svg
    from .stages import load_features

    sc = sfmdata.load(args.input)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for v in range(sc.n_views):
        try:
            f = load_features(args.features, int(sc.view_ids[v]))
        except FileNotFoundError:
            continue
        write_keypoints_svg(
            os.path.join(args.output, f"{int(sc.view_ids[v])}.svg"),
            sc.view_sizes[v], f["xy"][f["valid"]],
            scale=f.get("scale", [2.0] * len(f["xy"])),
            image_path=sc.view_paths[v] or None,
        )
        n += 1
    print(json.dumps({"views": n}))


def _setup_export_matches(p):
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--matches", required=True)
    p.add_argument("--output", required=True, help="folder of SVGs")


@command("exportMatches", _setup_export_matches)
def _export_matches(args):
    """ref: src/software/export/main_exportMatches.cpp"""
    from .. import sfmdata
    from ..utils.svg import write_matches_svg
    from .stages import load_features, load_matches

    sc = sfmdata.load(args.input)
    os.makedirs(args.output, exist_ok=True)
    feats = {}

    def get(v):
        if v not in feats:
            feats[v] = load_features(args.features, int(sc.view_ids[v]))
        return feats[v]

    n = 0
    for (i, j), m in load_matches(args.matches).items():
        if not len(m):
            continue
        fi, fj = get(i), get(j)
        write_matches_svg(
            os.path.join(args.output, f"{int(sc.view_ids[i])}_{int(sc.view_ids[j])}.svg"),
            sc.view_sizes[i], sc.view_sizes[j],
            fi["xy"][m[:, 0]], fj["xy"][m[:, 1]],
            image1=sc.view_paths[i] or None, image2=sc.view_paths[j] or None,
        )
        n += 1
    print(json.dumps({"pairs": n}))


def _setup_export_tracks(p):
    p.add_argument("--input", required=True)
    p.add_argument("--tracks", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--output", required=True, help="SVG path")
    p.add_argument("--maxTracks", type=int, default=500)


@command("exportTracks", _setup_export_tracks)
def _export_tracks(args):
    """ref: src/software/export/main_exportTracks.cpp"""
    import numpy as np

    from .. import sfmdata
    from ..tracks.builder import Tracks
    from ..utils.svg import write_tracks_svg
    from .stages import load_features

    sc = sfmdata.load(args.input)
    with np.load(args.tracks) as z:
        tr = Tracks(z["track_ids"], z["views"], z["features"], int(z["n_tracks"]))
    feats = {v: load_features(args.features, int(sc.view_ids[v]))
             for v in range(sc.n_views)}
    polylines = []
    order = np.argsort(tr.track_ids, kind="stable")
    tids = tr.track_ids[order]
    vs = tr.views[order]
    fs = tr.features[order]
    starts = np.searchsorted(tids, np.unique(tids))
    bounds = np.append(starts, len(tids))
    for k in range(min(args.maxTracks, len(starts))):
        sl = slice(bounds[k], bounds[k + 1])
        line = [feats[int(v)]["xy"][int(f)] for v, f in zip(vs[sl], fs[sl])]
        if len(line) >= 2:
            polylines.append(line)
    _ensure_parent(args.output)
    write_tracks_svg(args.output, sc.view_sizes[0], polylines)
    print(json.dumps({"tracks": len(polylines)}))


def _setup_import_middlebury(p):
    p.add_argument("--input", required=True, help="*_par.txt")
    p.add_argument("--imagesFolder", default=None)
    p.add_argument("--output", required=True, help=".sfm")


@command("importMiddlebury", _setup_import_middlebury)
def _import_middlebury(args):
    """ref: src/software/pipeline/main_importMiddlebury.cpp"""
    from .. import sfmdata
    from ..sfmdata.middlebury import import_middlebury

    sc = import_middlebury(args.input, args.imagesFolder)
    sfmdata.save(sc, args.output)
    print(json.dumps({"views": sc.n_views}))


def _setup_sample_scene(p):
    p.add_argument("--output", required=True, help=".sfm")
    p.add_argument("--nbViews", type=int, default=10)
    p.add_argument("--nbPoints", type=int, default=100)
    p.add_argument("--noisePx", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)


@command("generateSampleScene", _setup_sample_scene)
def _generate_sample_scene(args):
    """ref: src/software/utils/main_generateSampleScene.cpp,
    sfmDataIO/sceneSample.hpp:18"""
    from .. import sfmdata
    from ..utils.synthetic import ring_scene_sfmdata

    sc = ring_scene_sfmdata(
        n_views=args.nbViews, n_points=args.nbPoints, noise_px=args.noisePx,
        seed=args.seed,
    )
    _ensure_parent(args.output)
    sfmdata.save(sc, args.output)
    print(json.dumps({"views": sc.n_views, "landmarks": sc.n_landmarks}))


# ---------------------------------------------------------------------------
# voctree utilities
# ---------------------------------------------------------------------------


def _setup_voctree_query(p):
    p.add_argument("--tree", required=True, help="tree .npz from voctreeCreation")
    p.add_argument("--input", required=True, help=".sfm")
    p.add_argument("--features", required=True)
    p.add_argument("--output", default=None, help="pair list file")
    p.add_argument("--nbNeighbors", type=int, default=10)


@command("voctreeQueryUtility", _setup_voctree_query)
def _voctree_query(args):
    """ref: src/software/utils/main_voctreeQueryUtility.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from .. import sfmdata
    from ..matching import voctree as vt
    from .stages import load_features

    sc = sfmdata.load(args.input)
    with np.load(args.tree) as z:
        tree = vt.VocTree(
            centers=jnp.asarray(z["centers"]),
            n_children=int(z["n_children"]),
            n_levels=int(z["n_levels"]),
        )
    bows = []
    for v in range(sc.n_views):
        f = load_features(args.features, int(sc.view_ids[v]))
        bows.append(vt.bow_vector(tree, jnp.asarray(f["desc"]),
                                  jnp.asarray(f["valid"])))
    db = vt.build_database(tree, jnp.stack(bows))
    pairs = vt.query_pairs(db, n_neighbors=args.nbNeighbors)
    if args.output:
        _ensure_parent(args.output)
        with open(args.output, "w") as f:
            for i, j in pairs:
                f.write(f"{i} {j}\n")
    print(json.dumps({"pairs": int(len(pairs))}))


def _setup_voctree_stats(p):
    p.add_argument("--tree", required=True)


@command("voctreeStatistics", _setup_voctree_stats)
def _voctree_statistics(args):
    """ref: src/software/utils/main_voctreeStatistics.cpp"""
    import numpy as np

    with np.load(args.tree) as z:
        centers = z["centers"]
        k = int(z["n_children"])
        levels = int(z["n_levels"])
    print(json.dumps({
        "levels": levels,
        "branching": k,
        "leaves": int(k ** levels),
        "nodes_per_level": int(centers.shape[1]),
        "descriptor_dim": int(centers.shape[-1]),
        "mean_center_norm": float(np.linalg.norm(centers, axis=-1).mean()),
    }))


# ---------------------------------------------------------------------------
# mesh rendering / visibility tools
# ---------------------------------------------------------------------------


def _scene_cams(sc, downscale=1):
    cams = []
    for v in sc.valid_views():
        K, R, c = sc.camera_matrices(v)
        w, h = sc.view_sizes[v]
        if downscale > 1:
            K = K.copy()
            K[:2] /= downscale
            w, h = w // downscale, h // downscale
        cams.append((int(sc.view_ids[v]), K, R, c, (int(h), int(w))))
    return cams


def _setup_depth_render(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--mesh", required=True)
    p.add_argument("--output", required=True, help="folder of <viewId>_depth.npy")
    p.add_argument("--downscale", type=int, default=4)


@command("depthMapRendering", _setup_depth_render)
def _depth_map_rendering(args):
    """ref: src/software/pipeline/main_depthMapRendering.cpp"""
    import numpy as np

    from .. import sfmdata
    from ..mesh import load_obj
    from ..mesh.render import render_depth_map

    sc = sfmdata.load(args.input)
    V, F = load_obj(args.mesh)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for vid, K, R, c, hw in _scene_cams(sc, args.downscale):
        depth, _ = render_depth_map(V, F, K, R, c, hw)
        np.save(os.path.join(args.output, f"{vid}_depth.npy"), depth)
        n += 1
    print(json.dumps({"rendered": n}))


def _setup_normal_render(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--mesh", required=True)
    p.add_argument("--output", required=True, help="folder of <viewId>_normal.npy")
    p.add_argument("--downscale", type=int, default=4)
    p.add_argument("--worldFrame", action="store_true")


@command("normalMapRendering", _setup_normal_render)
def _normal_map_rendering(args):
    """ref: src/software/pipeline/main_normalMapRendering.cpp"""
    import numpy as np

    from .. import sfmdata
    from ..mesh import load_obj
    from ..mesh.render import render_normal_map

    sc = sfmdata.load(args.input)
    V, F = load_obj(args.mesh)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for vid, K, R, c, hw in _scene_cams(sc, args.downscale):
        normals, _ = render_normal_map(
            V, F, K, R, c, hw, camera_frame=not args.worldFrame
        )
        np.save(os.path.join(args.output, f"{vid}_normal.npy"), normals)
        n += 1
    print(json.dumps({"rendered": n}))


def _setup_unseen(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--mesh", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--minObservations", type=int, default=1)
    p.add_argument("--downscale", type=int, default=4)


@command("meshRemoveUnseenFaces", _setup_unseen)
def _mesh_remove_unseen(args):
    """ref: src/software/pipeline/main_meshRemoveUnseenFaces.cpp"""
    from .. import sfmdata
    from ..mesh import load_obj, save_obj
    from ..mesh.render import remove_unseen_faces

    sc = sfmdata.load(args.input)
    V, F = load_obj(args.mesh)
    cams = [(K, R, c, hw) for _, K, R, c, hw in _scene_cams(sc, args.downscale)]
    V2, F2 = remove_unseen_faces(V, F, cams, min_views=args.minObservations)
    save_obj(args.output, V2, F2)
    print(json.dumps({"faces_in": int(len(F)), "faces_out": int(len(F2))}))


def _setup_merge_meshes(p):
    p.add_argument("--input", required=True)
    p.add_argument("--input2", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--weldEps", type=float, default=0.0)


@command("mergeMeshes", _setup_merge_meshes)
def _merge_meshes(args):
    """ref: src/software/pipeline/main_mergeMeshes.cpp"""
    from ..mesh import load_obj, save_obj
    from ..mesh.ops import merge_meshes

    v1, f1 = load_obj(args.input)
    v2, f2 = load_obj(args.input2)
    v, f = merge_meshes(v1, f1, v2, f2, weld_eps=args.weldEps)
    save_obj(args.output, v, f)
    print(json.dumps({"vertices": int(len(v)), "faces": int(len(f))}))


# ---------------------------------------------------------------------------
# calibration tools
# ---------------------------------------------------------------------------


def _setup_checker_detect(p):
    p.add_argument("--input", required=True, help="image or folder")
    p.add_argument("--output", required=True, help="corners .json")
    p.add_argument("--rows", type=int, required=True)
    p.add_argument("--cols", type=int, required=True)


@command("checkerboardDetection", _setup_checker_detect)
def _checkerboard_detection(args):
    """ref: src/software/pipeline/main_checkerboardDetection.cpp,
    calibration/checkerDetector.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..calibration import detect_checkerboard
    from ..image.io import read_image

    files = (
        sorted(
            os.path.join(args.input, f) for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
        )
        if os.path.isdir(args.input)
        else [args.input]
    )
    out = {}
    for path in files:
        img = read_image(path, grayscale=True)
        g = detect_checkerboard(jnp.asarray(img), args.rows, args.cols)
        if g is not None:
            out[os.path.basename(path)] = np.asarray(g).tolist()
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"rows": args.rows, "cols": args.cols, "detections": out}, f)
    print(json.dumps({"detected": len(out), "images": len(files)}))


def _setup_camera_calibration(p):
    p.add_argument("--input", required=True, help="image folder")
    p.add_argument("--output", required=True, help="calibration .json")
    p.add_argument("--rows", type=int, required=True)
    p.add_argument("--cols", type=int, required=True)
    p.add_argument("--squareSize", type=float, default=1.0)


@command("cameraCalibration", _setup_camera_calibration)
def _camera_calibration(args):
    """Zhang calibration over a checkerboard sequence
    (ref: src/software/pipeline/main_cameraCalibration.cpp)."""
    import numpy as np
    import jax.numpy as jnp

    from ..calibration import calibrate_zhang, detect_checkerboard
    from ..image.io import read_image

    files = sorted(
        f for f in os.listdir(args.input)
        if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
    )
    grids = []
    for f in files:
        img = read_image(os.path.join(args.input, f), grayscale=True)
        g = detect_checkerboard(jnp.asarray(img), args.rows, args.cols)
        if g is not None:
            grids.append(np.asarray(g))
    if len(grids) < 3:
        raise RuntimeError(f"checkerboard found in only {len(grids)} images")
    obj = args.squareSize * np.array(
        [[i, j] for j in range(args.rows) for i in range(args.cols)], float
    )
    res = calibrate_zhang(obj, np.stack(grids))
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump(
            {"K": res["K"].tolist(), "dist": res["dist"].tolist(),
             "rms": res["rms"], "n_views": len(grids)}, f, indent=1,
        )
    print(json.dumps({"rms": res["rms"], "views": len(grids)}))


def _setup_disto_calib(p):
    p.add_argument("--input", required=True, help=".sfm")
    p.add_argument("--checkerboards", required=True,
                   help="corners .json from checkerboardDetection")
    p.add_argument("--output", required=True, help=".sfm with distortion")
    p.add_argument("--nbParams", type=int, default=3)
    p.add_argument("--undistortionModelName", default="none",
                   choices=["none", "radialk3", "3deanamorphic4",
                            "3declassicld", "3deradial4"],
                   help="fit an Undistortion-family (3DE) model instead of "
                        "the RADIALK3 distortion "
                        "(ref: main_distortionCalibration.cpp)")


@command("distortionCalibration", _setup_disto_calib)
def _distortion_calibration(args):
    """Distortion from checkerboard line straightness
    (ref: src/software/pipeline/main_distortionCalibration.cpp,
    calibration/distortionEstimationLine.cpp)."""
    import numpy as np
    import jax.numpy as jnp

    from .. import camera as camm
    from .. import sfmdata
    from ..calibration.distortion_lines import calibrate_distortion_from_lines

    sc = sfmdata.load(args.input)
    with open(args.checkerboards) as f:
        data = json.load(f)
    rows, cols = data["rows"], data["cols"]
    lines = []
    for det in data["detections"].values():
        g = np.asarray(det, float).reshape(rows, cols, 2)
        for r in range(rows):
            lines.append(g[r])
        for c_ in range(cols):
            lines.append(g[:, c_])
    n = max(rows, cols)
    pts = np.full((len(lines), n, 2), 0.0)
    mask = np.zeros((len(lines), n), bool)
    for k, ln in enumerate(lines):
        pts[k, : len(ln)] = ln
        mask[k, : len(ln)] = True
    if args.undistortionModelName != "none":
        from ..calibration.distortion_lines import (
            calibrate_undistortion_from_lines,
        )
        from ..camera import undistortion as und

        kind = und.UNDIST_CODES[args.undistortionModelName]
        w, h = int(sc.sizes[0, 0]), int(sc.sizes[0, 1])
        init = und.Undistortion.make(kind, w, h)
        fitted, rms_before, rms_after = calibrate_undistortion_from_lines(
            jnp.asarray(pts), jnp.asarray(mask), init
        )
        for i in range(sc.n_intrinsics):
            und.set_scene_undistortion(sc, i, fitted)
    else:
        intr = sc.intrinsics_table(np.float64)
        import jax.tree_util as jtu

        row = jtu.tree_map(lambda a: a[0], intr)
        disto, rms_before, rms_after = calibrate_distortion_from_lines(
            jnp.asarray(pts), jnp.asarray(mask), row, n_params=args.nbParams
        )
        for i in range(sc.n_intrinsics):
            sc.disto_kind[i] = camm.DISTO_RADIALK3
            sc.disto[i] = np.asarray(disto)
    sfmdata.save(sc, args.output)
    print(json.dumps({"rms_before": float(rms_before),
                      "rms_after": float(rms_after)}))


def _setup_convert_disto(p):
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--to", required=True,
                   choices=["none", "radialk1", "radialk3", "brown", "fisheye4",
                            "fisheye1"])


@command("convertDistortion", _setup_convert_disto)
def _convert_distortion(args):
    """ref: src/software/convert/main_convertDistortion.cpp"""
    from .. import camera as camm
    from .. import sfmdata
    from ..camera.convert import convert_intrinsic_distortion

    name_to_kind = {
        "none": camm.DISTO_NONE,
        "radialk1": camm.DISTO_RADIALK1,
        "radialk3": camm.DISTO_RADIALK3,
        "brown": camm.DISTO_BROWN,
        "fisheye4": camm.DISTO_FISHEYE,
        "fisheye1": camm.DISTO_FISHEYE1,
    }
    sc = sfmdata.load(args.input)
    for i in range(sc.n_intrinsics):
        convert_intrinsic_distortion(sc, i, name_to_kind[args.to])
    sfmdata.save(sc, args.output)
    print(json.dumps({"intrinsics": sc.n_intrinsics, "to": args.to}))


def _setup_export_disto(p):
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="output folder")


@command("exportDistortion", _setup_export_disto)
def _export_distortion(args):
    """Undistort/distort STMaps + Nuke script per intrinsic
    (ref: src/software/export/main_exportDistortion.cpp)."""
    import numpy as np
    import jax.tree_util as jtu

    from .. import sfmdata
    from ..camera.convert import distort_stmap, undistort_stmap

    sc = sfmdata.load(args.input)
    intr = sc.intrinsics_table(np.float64)
    os.makedirs(args.output, exist_ok=True)
    for i in range(sc.n_intrinsics):
        row = jtu.tree_map(lambda a: a[i], intr)
        iid = int(sc.intrinsic_ids[i])
        # cap map size for speed; STMaps are resolution independent
        w, h = int(sc.sizes[i, 0]), int(sc.sizes[i, 1])
        s = max(1, max(w, h) // 1024)
        np.save(os.path.join(args.output, f"{iid}_undistort_stmap.npy"),
                undistort_stmap(row, hw=(h // s, w // s)))
        np.save(os.path.join(args.output, f"{iid}_distort_stmap.npy"),
                distort_stmap(row, hw=(h // s, w // s)))
        # Undistortion-family (3DE) STMaps when present
        # (ref: main_exportDistortion.cpp undistortion branch)
        from ..camera import undistortion as und

        u = und.scene_undistortion(sc, i)
        if u is not None:
            hh, ww = h // s, w // s
            scale_xy = np.array([w / ww, h / hh])
            yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
            grid = (np.stack([xx, yy], -1).reshape(-1, 2) + 0.5) * scale_xy
            fwd = np.asarray(und.undistort_pixels(u, grid)).reshape(hh, ww, 2)
            inv = np.asarray(und.inverse_pixels(u, grid)).reshape(hh, ww, 2)
            np.save(os.path.join(args.output, f"{iid}_undistortion_stmap.npy"),
                    fwd / [w, h])
            np.save(os.path.join(args.output, f"{iid}_undistortion_inv_stmap.npy"),
                    inv / [w, h])
        fx, fy = sc.scale[i]
        with open(os.path.join(args.output, f"{iid}_nuke.nk"), "w") as f:
            f.write(
                "# LensDistortion node (AliceVision-compatible export)\n"
                f"# intrinsic {iid}: fx={fx} fy={fy} "
                f"disto={list(sc.disto[i])}\n"
            )
    print(json.dumps({"intrinsics": sc.n_intrinsics}))


# ---------------------------------------------------------------------------
# photometric stereo / lighting
# ---------------------------------------------------------------------------


def _setup_ps(p):
    p.add_argument("--inputFolder", required=True, help="images, one per light")
    p.add_argument("--lights", required=True,
                   help="lights .json ({\"directions\": [[x,y,z],...]}) or .npy")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--integrate", action="store_true", help="also write depth")


@command("photometricStereo", _setup_ps)
def _photometric_stereo(args):
    """ref: src/software/pipeline/main_photometricStereo.cpp,
    photometricStereo/photometricStereo.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..image.io import read_image
    from ..photometric import normal_integration_dct, photometric_stereo

    files = sorted(
        f for f in os.listdir(args.inputFolder)
        if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
    )
    imgs = np.stack(
        [read_image(os.path.join(args.inputFolder, f), grayscale=True)
         for f in files]
    )
    if args.lights.endswith(".npy"):
        L = np.load(args.lights)
    else:
        with open(args.lights) as f:
            L = np.asarray(json.load(f)["directions"], float)
    normals, albedo = photometric_stereo(jnp.asarray(imgs), jnp.asarray(L))
    os.makedirs(args.output, exist_ok=True)
    np.save(os.path.join(args.output, "normals.npy"), np.asarray(normals))
    np.save(os.path.join(args.output, "albedo.npy"), np.asarray(albedo))
    if args.integrate:
        depth = normal_integration_dct(normals)
        np.save(os.path.join(args.output, "depth.npy"), np.asarray(depth))
    print(json.dumps({"images": len(files)}))


def _setup_ni(p):
    p.add_argument("--input", required=True, help="normals .npy (H,W,3)")
    p.add_argument("--output", required=True, help="depth .npy")


@command("normalIntegration", _setup_ni)
def _normal_integration(args):
    """ref: src/software/pipeline/main_normalIntegration.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..photometric import normal_integration_dct

    normals = jnp.asarray(np.load(args.input))
    depth = normal_integration_dct(normals)
    _ensure_parent(args.output)
    np.save(args.output, np.asarray(depth))


def _setup_le(p):
    p.add_argument("--normals", required=True, help="normals .npy")
    p.add_argument("--image", required=True, help="shaded image")
    p.add_argument("--albedo", default=None)
    p.add_argument("--output", required=True, help="SH coefficients .json")


@command("lightingEstimation", _setup_le)
def _lighting_estimation(args):
    """ref: src/software/pipeline/main_lightingEstimation.cpp,
    lightingEstimation/lightingEstimation.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..image.io import read_image
    from ..photometric import estimate_sh_lighting

    normals = jnp.asarray(np.load(args.normals))
    img = read_image(args.image, grayscale=True)
    albedo = (
        jnp.asarray(np.load(args.albedo)) if args.albedo else None
    )
    L = estimate_sh_lighting(jnp.asarray(img), normals, albedo=albedo)
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"sh": np.asarray(L).tolist()}, f)
    print(json.dumps({"sh_dim": int(np.asarray(L).shape[-1])}))


def _setup_lc(p):
    p.add_argument("--inputFolder", required=True)
    p.add_argument("--sphere", default=None,
                   help="cx,cy,r — detected automatically when omitted")
    p.add_argument("--output", required=True, help="lights .json")


@command("lightingCalibration", _setup_lc)
def _lighting_calibration(args):
    """ref: src/software/pipeline/main_lightingCalibration.cpp,
    lightingEstimation/lightingCalibration.cpp (brightestPoint)"""
    import numpy as np

    from ..image.io import read_image
    from ..misc.sphere_detection import detect_sphere
    from ..photometric.light_calibration import calibrate_light_from_sphere

    files = sorted(
        f for f in os.listdir(args.inputFolder)
        if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
    )
    dirs = []
    for f in files:
        img = read_image(os.path.join(args.inputFolder, f), grayscale=True)
        if args.sphere:
            cx, cy, r = [float(x) for x in args.sphere.split(",")]
        else:
            det = detect_sphere(img)
            if det is None:
                continue
            cx, cy, r = det[0], det[1], det[2]
        dirs.append(calibrate_light_from_sphere(img, cx, cy, r).tolist())
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"directions": dirs}, f)
    print(json.dumps({"lights": len(dirs)}))


def _setup_sphere(p):
    p.add_argument("--input", required=True, help="image")
    p.add_argument("--output", required=True, help="detection .json")
    p.add_argument("--minRadius", type=int, default=8)
    p.add_argument("--maxRadius", type=int, default=64)


@command("sphereDetection", _setup_sphere)
def _sphere_detection(args):
    """ref: src/software/pipeline/main_sphereDetection.cpp (classical Hough
    voting instead of the reference's ONNX model — no ONNX runtime here)."""
    from ..image.io import read_image
    from ..misc.sphere_detection import detect_sphere

    img = read_image(args.input, grayscale=True)
    det = detect_sphere(img, r_min=args.minRadius, r_max=args.maxRadius)
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump(
            {"found": det is not None,
             "sphere": list(det[:3]) if det else None,
             "score": det[3] if det else 0.0}, f,
        )
    print(json.dumps({"found": det is not None}))


def _setup_image_masking(p):
    p.add_argument("--input", required=True, help="image or folder")
    p.add_argument("--output", required=True, help="mask png or folder")
    p.add_argument("--algorithm", default="hsv",
                   choices=["hsv", "autoGrayscaleThreshold"],
                   help="masking algorithm (ref main_imageMasking.cpp:95)")
    p.add_argument("--hsvMin", default="0,0,0")
    p.add_argument("--hsvMax", default="1,1,1")
    p.add_argument("--invert", action="store_true")
    p.add_argument("--growRadius", type=int, default=0,
                   help="dilate the mask (ref main_imageMasking.cpp:144)")
    p.add_argument("--shrinkRadius", type=int, default=0,
                   help="erode the mask (ref main_imageMasking.cpp:146)")


@command("imageMasking", _setup_image_masking)
def _image_masking(args):
    """HSV-box / Otsu masking with grow/shrink postprocessing
    (ref: src/software/pipeline/main_imageMasking.cpp,
    imageMasking/imageMasking.cpp)."""
    import numpy as np
    import jax.numpy as jnp

    from ..image.io import read_image, write_image
    from ..misc.masking import auto_threshold_mask, dilate, erode, hsv_mask

    lo = [float(x) for x in args.hsvMin.split(",")]
    hi = [float(x) for x in args.hsvMax.split(",")]
    if os.path.isdir(args.input):
        files = sorted(
            f for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
        )
        os.makedirs(args.output, exist_ok=True)
        pairs = [
            (os.path.join(args.input, f),
             os.path.join(args.output, os.path.splitext(f)[0] + "_mask.png"))
            for f in files
        ]
    else:
        pairs = [(args.input, args.output)]
    for src, dst in pairs:
        img = read_image(src)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if args.algorithm == "autoGrayscaleThreshold":
            gray = jnp.asarray(img).mean(axis=-1)
            m = auto_threshold_mask(gray)
            if args.invert:
                m = ~m
        else:
            m = hsv_mask(
                jnp.asarray(img), h_range=(lo[0], hi[0]),
                s_range=(lo[1], hi[1]),
                v_range=(lo[2], hi[2]), invert=args.invert,
            )
        if args.growRadius > 0:
            m = dilate(m, args.growRadius)
        if args.shrinkRadius > 0:
            m = erode(m, args.shrinkRadius)
        write_image(dst, np.asarray(m, np.float32))
    print(json.dumps({"masks": len(pairs)}))


# ---------------------------------------------------------------------------
# localization / rig
# ---------------------------------------------------------------------------


def _obs_descriptors(sc, features_folder):
    import numpy as np

    from .stages import load_features

    descs = {}
    for v in np.unique(sc.obs_view):
        descs[int(v)] = load_features(features_folder, int(sc.view_ids[v]))["desc"]
    return np.stack(
        [descs[int(v)][int(f)] for v, f in zip(sc.obs_view, sc.obs_feature)]
    ).astype(np.float32)


def _build_landmark_index_from_features(sc, features_folder):
    """Mean descriptor per landmark via obs (view, feature) ids."""
    from ..localization import build_landmark_index

    obs_desc = _obs_descriptors(sc, features_folder)
    return build_landmark_index(sc.points, sc.obs_landmark, obs_desc)


def _setup_camera_loc(p):
    p.add_argument("--input", required=True, help="reconstructed .sfm")
    p.add_argument("--features", required=True, help="features of the scene views")
    p.add_argument("--queryFolder", required=True, help="images to localize")
    p.add_argument("--output", required=True, help="poses .json")
    p.add_argument("--maxKeypoints", type=int, default=2048)
    p.add_argument("--downscaleTo", type=int, default=1024)
    p.add_argument("--method", default="voctree", choices=["voctree", "direct"],
                   help="voctree: retrieval-restricted matching "
                        "(VoctreeLocalizer.hpp); direct: landmark index")


@command("cameraLocalization", _setup_camera_loc)
def _camera_localization(args):
    """ref: src/software/pipeline/main_cameraLocalization.cpp,
    localization/VoctreeLocalizer.hpp:34-153 — method=voctree retrieves the
    most similar database views and matches only their observations;
    method=direct matches the mean-descriptor landmark index."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from .. import camera as camm
    from .. import sfmdata
    from ..features import sift as siftm
    from ..image.io import read_image
    from ..localization import localize_image

    sc = sfmdata.load(args.input)
    method = getattr(args, "method", "direct")
    if method == "voctree":
        from ..localization.voctree_localizer import VoctreeLocalizer

        vloc = VoctreeLocalizer(
            sc.points, sc.obs_landmark, sc.obs_view,
            _obs_descriptors(sc, args.features),
        )
    else:
        lm_desc, lm_pts = _build_landmark_index_from_features(sc, args.features)
    fx = float(np.mean(sc.scale[:, 0]))
    w, h = float(sc.sizes[0, 0]), float(sc.sizes[0, 1])
    intr = sc.intrinsics_table()
    import jax.tree_util as jtu

    row = jtu.tree_map(lambda a: jnp.asarray(np.asarray(a)[0]), intr)

    results = {}
    key = jax.random.PRNGKey(0)
    files = sorted(
        f for f in os.listdir(args.queryFolder)
        if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
    )
    for fname in files:
        img = read_image(os.path.join(args.queryFolder, fname), grayscale=True)
        scale = 1.0
        if args.downscaleTo and max(img.shape) > args.downscaleTo:
            s = max(img.shape) // args.downscaleTo + 1
            img = img[::s, ::s]
            scale = float(s)
        feats = siftm.extract(
            jnp.asarray(img, jnp.float32),
            siftm.SiftConfig(max_keypoints=args.maxKeypoints),
        )
        valid = np.asarray(feats.valid)
        desc = np.asarray(feats.desc)[valid]
        xy = np.asarray(feats.xy)[valid] * scale
        p = camm.ima2cam(row, jnp.asarray(xy, jnp.float32))
        p = camm.remove_distortion(row.disto_kind, row.disto, p)
        key, k1 = jax.random.split(key)
        if method == "voctree":
            res = vloc.localize(k1, desc, np.asarray(p), fx, (w, h))
        else:
            res = localize_image(
                k1, lm_desc, lm_pts, desc, np.asarray(p), fx, (w, h)
            )
        results[fname] = {
            "success": bool(res.success),
            "n_inliers": int(res.n_inliers),
            "R": np.asarray(res.R).tolist(),
            "c": np.asarray(res.c).tolist(),
        }
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=1)
    n_ok = sum(r["success"] for r in results.values())
    print(json.dumps({"localized": n_ok, "total": len(results)}))


def _setup_rig_calib(p):
    p.add_argument("--inputs", required=True,
                   help="comma-separated posed .sfm, one per rig camera")
    p.add_argument("--output", required=True, help="rig .json")


@command("rigCalibration", _setup_rig_calib)
def _rig_calibration(args):
    """ref: src/software/pipeline/main_rigCalibration.cpp, rig/Rig.cpp"""
    import numpy as np

    from .. import sfmdata
    from ..misc.rig import calibrate_rig

    scenes = [sfmdata.load(p) for p in args.inputs.split(",")]
    poses_per_cam = []
    frames = None
    for sc in scenes:
        valid = sc.valid_views()
        fmap = {int(sc.view_frames[v]): v for v in valid}
        frames = (
            sorted(fmap) if frames is None
            else [f for f in frames if f in fmap]
        )
        poses_per_cam.append(fmap)
    if not frames:
        raise RuntimeError("no common frames across rig cameras")
    tracked = []
    for sc, fmap in zip(scenes, poses_per_cam):
        R = np.stack([sc.pose_R[sc.view_pose[fmap[f]]] for f in frames])
        c = np.stack([sc.pose_c[sc.view_pose[fmap[f]]] for f in frames])
        tracked.append((R, c))
    subs = calibrate_rig(tracked)
    out = []
    for R_rel, c_rel in subs:
        out.append({"R": np.asarray(R_rel).tolist(),
                    "c": np.asarray(c_rel).tolist()})
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"subposes": out, "frames": len(frames)}, f, indent=1)
    print(json.dumps({"cameras": len(out), "frames": len(frames)}))


def _setup_rig_transform(p):
    p.add_argument("--input", required=True, help="rig-trajectory .sfm (cam 0)")
    p.add_argument("--rig", required=True, help="rig .json from rigCalibration")
    p.add_argument("--camera", type=int, required=True, help="sub-camera index")
    p.add_argument("--output", required=True)


@command("rigTransform", _setup_rig_transform)
def _rig_transform(args):
    """Apply a calibrated sub-pose to a rig trajectory
    (ref: src/software/utils/main_rigTransform.cpp)."""
    import numpy as np

    from .. import sfmdata
    from ..geometry.rotations import quat_to_mat  # noqa: F401 (doc import)

    sc = sfmdata.load(args.input)
    with open(args.rig) as f:
        rig = json.load(f)
    sub = rig["subposes"][args.camera]
    R_rel = np.asarray(sub["R"])
    c_rel = np.asarray(sub["c"])
    for v in sc.valid_views():
        p = int(sc.view_pose[v])
        R0, c0 = sc.pose_R[p], sc.pose_c[p]
        # camera k pose = sub-pose composed with the rig (cam-0) pose
        R = R_rel @ R0
        c = c0 + R0.T @ c_rel
        sc.pose_R[p] = R
        sc.pose_c[p] = c
    sfmdata.save(sc, args.output)


def _setup_rig_loc(p):
    p.add_argument("--input", required=True, help="reconstructed .sfm")
    p.add_argument("--features", required=True)
    p.add_argument("--queryFolders", required=True,
                   help="comma-separated folders, one per rig camera")
    p.add_argument("--rig", required=True, help="rig .json")
    p.add_argument("--output", required=True, help="rig poses .json")
    p.add_argument(
        "--fusion", default="joint", choices=["joint", "average"],
        help="joint = non-central resection over ALL rig cameras at once "
        "(rigResection.cpp); average = legacy per-camera + quaternion mean",
    )


@command("rigLocalization", _setup_rig_loc)
def _rig_localization(args):
    """Localize the rig frame per query timestamp. Default: 2D-3D matches
    from EVERY rig camera feed ONE joint non-central resection with the
    known sub-poses (ref: src/software/pipeline/main_rigLocalization.cpp,
    localization/rigResection.cpp — OpenGV non-central PnP analog); the
    legacy per-camera + quaternion-averaging path stays as --fusion average.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..geometry import mat_to_quat, quat_to_mat
    from ..misc.rig import average_quaternions

    with open(args.rig) as f:
        rig = json.load(f)
    folders = args.queryFolders.split(",")

    if getattr(args, "fusion", "joint") == "joint":
        from .. import camera as camm
        from .. import sfmdata
        from ..features import sift as siftm
        from ..image.io import read_image
        from ..localization.localizer import (
            build_landmark_index,
            match_2d3d,
        )
        from ..localization.voctree_localizer import rig_resection

        sc = sfmdata.load(args.input)
        lm_desc, lm_pts = _build_landmark_index_from_features(
            sc, args.features
        )
        fx = float(np.mean(sc.scale[:, 0]))
        w, h = float(sc.sizes[0, 0]), float(sc.sizes[0, 1])
        import jax.tree_util as jtu

        row = jtu.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[0]), sc.intrinsics_table()
        )
        # sub-pose chain x_cam_k = sub_R x_frame + sub_t from the rig
        # json's (R_rel, c_rel) pose composition
        sub_R = np.stack(
            [np.asarray(s["R"]) for s in rig["subposes"]]
        )
        sub_t = np.stack(
            [-np.asarray(s["R"]) @ np.asarray(s["c"])
             for s in rig["subposes"]]
        )

        def list_queries(folder):
            return sorted(
                f for f in os.listdir(folder)
                if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
            )

        names = sorted(
            set.intersection(*[set(list_queries(f)) for f in folders])
        )
        fused = {}
        key = jax.random.PRNGKey(0)
        for name in names:
            world_per_cam, obs_per_cam = [], []
            for k, folder in enumerate(folders):
                img = read_image(os.path.join(folder, name), grayscale=True)
                feats = siftm.extract(
                    jnp.asarray(img, jnp.float32),
                    siftm.SiftConfig(max_keypoints=2048),
                )
                valid = np.asarray(feats.valid)
                desc = np.asarray(feats.desc)[valid]
                xy = np.asarray(feats.xy)[valid]
                p = camm.ima2cam(row, jnp.asarray(xy, jnp.float32))
                p = camm.remove_distortion(row.disto_kind, row.disto, p)
                wpts, onorm = match_2d3d(lm_desc, lm_pts, desc, np.asarray(p))
                world_per_cam.append(wpts)
                obs_per_cam.append(onorm)
            key, k1 = jax.random.split(key)
            res = rig_resection(
                k1, world_per_cam, obs_per_cam, sub_R, sub_t, fx, (w, h)
            )
            fused[name] = {
                "success": bool(res.success),
                "n_inliers": int(res.n_inliers),
                "R": np.asarray(res.R_frame).tolist(),
                "c": np.asarray(res.c_frame).tolist(),
            }
        _ensure_parent(args.output)
        with open(args.output, "w") as f:
            json.dump(fused, f, indent=1)
        print(json.dumps({"frames": len(fused), "fusion": "joint"}))
        return

    per_cam = []
    for k, folder in enumerate(folders):
        out_k = args.output + f".cam{k}.json"
        args2 = type("A", (), dict(
            input=args.input, features=args.features, queryFolder=folder,
            output=out_k, maxKeypoints=2048, downscaleTo=1024,
        ))
        _camera_localization(args2)
        with open(out_k) as f:
            per_cam.append(json.load(f))
    # fuse per matching filename
    names = sorted(set.intersection(*[set(p) for p in per_cam]))
    fused = {}
    for name in names:
        qs, cs = [], []
        for k, res in enumerate(per_cam):
            r = res[name]
            if not r["success"]:
                continue
            Rk = np.asarray(r["R"])
            ck = np.asarray(r["c"])
            sub = rig["subposes"][k]
            R_rel = np.asarray(sub["R"])
            c_rel = np.asarray(sub["c"])
            # invert: rig pose from camera-k pose
            R0 = R_rel.T @ Rk
            c0 = ck - R0.T @ c_rel
            qs.append(np.asarray(mat_to_quat(jnp.asarray(R0))))
            cs.append(c0)
        if not qs:
            fused[name] = {"success": False}
            continue
        q = average_quaternions(jnp.asarray(np.stack(qs)))
        fused[name] = {
            "success": True,
            "R": np.asarray(quat_to_mat(q)).tolist(),
            "c": np.mean(cs, axis=0).tolist(),
            "cameras": len(qs),
        }
    with open(args.output, "w") as f:
        json.dump(fused, f, indent=1)
    print(json.dumps({"frames": len(fused)}))


def _setup_sfm_to_rig(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--output", required=True, help="rig .json")


@command("sfmToRig", _setup_sfm_to_rig)
def _sfm_to_rig(args):
    """Treat all posed views of a scene as one rig captured at a single
    instant: sub-poses relative to the first view
    (ref: src/software/utils/main_sfmToRig.cpp)."""
    import numpy as np

    from .. import sfmdata

    sc = sfmdata.load(args.input)
    valid = sc.valid_views()
    if len(valid) < 2:
        raise RuntimeError("need >= 2 posed views")
    p0 = int(sc.view_pose[valid[0]])
    R0, c0 = sc.pose_R[p0], sc.pose_c[p0]
    subposes = []
    for v in valid:
        p = int(sc.view_pose[v])
        Rk, ck = sc.pose_R[p], sc.pose_c[p]
        R_rel = Rk @ R0.T
        c_rel = R0 @ (ck - c0)
        subposes.append({
            "viewId": int(sc.view_ids[v]),
            "R": R_rel.tolist(),
            "c": c_rel.tolist(),
        })
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"subposes": subposes}, f, indent=1)
    print(json.dumps({"cameras": len(subposes)}))


# ---------------------------------------------------------------------------
# panorama stages (prepare / init / seams / merging / postprocessing)
# ---------------------------------------------------------------------------


def _setup_pano_prepare(p):
    p.add_argument("--inputFolder", required=True)
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--downscaleTo", type=int, default=0)


@command("panoramaPrepareImages", _setup_pano_prepare)
def _panorama_prepare_images(args):
    """Normalize orientation/size of panorama inputs
    (ref: src/software/pipeline/main_panoramaPrepareImages.cpp)."""
    import numpy as np

    from ..image.io import read_exif, read_image, write_image

    files = sorted(
        f for f in os.listdir(args.inputFolder)
        if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
    )
    os.makedirs(args.output, exist_ok=True)
    for fname in files:
        img = read_image(os.path.join(args.inputFolder, fname))
        meta = read_exif(os.path.join(args.inputFolder, fname))
        rot = int(meta.get("orientation", 1))
        if rot == 3:
            img = np.rot90(img, 2)
        elif rot == 6:
            img = np.rot90(img, 3)
        elif rot == 8:
            img = np.rot90(img, 1)
        if args.downscaleTo and max(img.shape[:2]) > args.downscaleTo:
            s = max(img.shape[:2]) // args.downscaleTo + 1
            img = img[::s, ::s]
        out = os.path.splitext(fname)[0] + ".png"
        write_image(os.path.join(args.output, out), img)
    print(json.dumps({"images": len(files)}))


def _setup_pano_init(p):
    p.add_argument("--imageFolder", required=True)
    p.add_argument("--output", required=True, help=".sfm with yaw-init poses")
    p.add_argument("--fisheye", action="store_true")
    p.add_argument("--defaultFocalPx", type=float, default=None)
    p.add_argument("--nbViewsPerRow", type=int, default=0,
                   help="0 = single ring; else rows x cols rig pattern")


@command("panoramaInit", _setup_pano_init)
def _panorama_init(args):
    """Initial rotations for a panorama shoot: evenly spaced yaw (and pitch
    rows for multi-row rigs) (ref: src/software/pipeline/main_panoramaInit.cpp)."""
    import numpy as np

    from .. import camera as camm
    from .. import sfmdata
    from .stages import camera_init

    tmp = args.output + ".init.sfm"
    camera_init(args.imageFolder, tmp, None, args.defaultFocalPx)
    sc = sfmdata.load(tmp)
    os.remove(tmp)
    if args.fisheye:
        sc.cam_kind[:] = camm.CAM_EQUIDISTANT
    n = sc.n_views
    per_row = args.nbViewsPerRow or n
    rows = max(1, (n + per_row - 1) // per_row)
    for v in range(n):
        row_i, col_i = divmod(v, per_row)
        yaw = 2.0 * np.pi * col_i / per_row
        pitch = 0.0 if rows == 1 else (row_i / max(rows - 1, 1) - 0.5) * np.pi / 2
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        sc.set_pose(v, Rx @ Ry, np.zeros(3))
    sfmdata.save(sc, args.output)
    print(json.dumps({"views": n, "rows": rows}))


def _setup_pano_seams(p):
    p.add_argument("--input", required=True, help="warped folder")
    p.add_argument("--output", required=True, help="labels .npy")


@command("panoramaSeams", _setup_pano_seams)
def _panorama_seams(args):
    """ref: src/software/pipeline/main_panoramaSeams.cpp, panorama/seams.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..panorama.compositing import seam_labels

    masks, order = [], []
    for f in sorted(os.listdir(args.input)):
        if f.endswith("_mask.npy"):
            masks.append(np.load(os.path.join(args.input, f)))
            order.append(f.replace("_mask.npy", ""))
    if not masks:
        raise RuntimeError("no *_mask.npy in input folder")
    labels = seam_labels(jnp.asarray(np.stack(masks)))
    _ensure_parent(args.output)
    np.savez_compressed(args.output, labels=np.asarray(labels),
                        views=np.asarray(order))
    print(json.dumps({"views": len(masks)}))


def _setup_pano_merge(p):
    p.add_argument("--input", required=True, help="warped folder")
    p.add_argument("--seams", default=None, help="labels .npz from panoramaSeams")
    p.add_argument("--output", required=True, help="panorama image")
    p.add_argument("--levels", type=int, default=5)


@command("panoramaMerging", _setup_pano_merge)
def _panorama_merging(args):
    """Blend warped views into the final panorama, optionally with
    precomputed seams (ref: src/software/pipeline/main_panoramaMerging.cpp)."""
    import numpy as np
    import jax.numpy as jnp

    from ..image.io import write_image
    from ..panorama.compositing import (
        composite_panorama,
        composite_with_labels,
    )

    warps, masks = [], []
    for f in sorted(os.listdir(args.input)):
        if f.endswith("_warp.npy"):
            warps.append(np.load(os.path.join(args.input, f)))
            masks.append(np.load(os.path.join(args.input,
                                              f.replace("_warp", "_mask"))))
    w = jnp.asarray(np.stack(warps))
    m = jnp.asarray(np.stack(masks))
    if args.seams:
        with np.load(args.seams) as z:
            labels = jnp.asarray(z["labels"])
        pano = composite_with_labels(w, labels, m, levels=args.levels)
    else:
        pano = composite_panorama(w, m, levels=args.levels)
    _ensure_parent(args.output)
    write_image(args.output, np.asarray(pano))


def _setup_pano_post(p):
    p.add_argument("--input", required=True, help="panorama image")
    p.add_argument("--output", required=True)
    p.add_argument("--fillHoles", action="store_true")
    p.add_argument("--crop", action="store_true")


@command("panoramaPostProcessing", _setup_pano_post)
def _panorama_post_processing(args):
    """ref: src/software/pipeline/main_panoramaPostProcessing.cpp"""
    import numpy as np
    import jax.numpy as jnp

    from ..image.io import read_image, write_image
    from ..panorama.compositing import crop_to_content, fill_holes

    img = read_image(args.input, grayscale=True)
    mask = img > 0
    out = jnp.asarray(img)
    if args.fillHoles:
        out = fill_holes(out, jnp.asarray(mask))
        mask = np.ones_like(mask)
    if args.crop:
        out_np = np.asarray(out)
        out_np, mask, _ = crop_to_content(out_np, mask)
        out = out_np
    write_image(args.output, np.asarray(out))


# ---------------------------------------------------------------------------
# color checker
# ---------------------------------------------------------------------------


def _setup_cc_detect(p):
    p.add_argument("--input", required=True, help="image or folder")
    p.add_argument("--output", required=True, help="detections .json")


@command("colorCheckerDetection", _setup_cc_detect)
def _color_checker_detection(args):
    """ref: src/software/utils/main_colorCheckerDetection.cpp"""
    import numpy as np

    from ..image.io import read_image
    from ..misc.color_checker import detect_color_checker

    files = (
        sorted(
            os.path.join(args.input, f) for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
        )
        if os.path.isdir(args.input)
        else [args.input]
    )
    out = {}
    for path in files:
        img = read_image(path)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        det = detect_color_checker(img)
        if det is not None:
            centers, colors = det
            out[os.path.basename(path)] = {
                "positions": np.asarray(centers).tolist(),
                "colors": np.asarray(colors).tolist(),
            }
    _ensure_parent(args.output)
    with open(args.output, "w") as f:
        json.dump({"checkers": out}, f)
    print(json.dumps({"detected": len(out)}))


def _setup_cc_correct(p):
    p.add_argument("--input", required=True, help="image or folder")
    p.add_argument("--detections", required=True, help="from colorCheckerDetection")
    p.add_argument("--output", required=True, help="image or folder")


@command("colorCheckerCorrection", _setup_cc_correct)
def _color_checker_correction(args):
    """ref: src/software/utils/main_colorCheckerCorrection.cpp"""
    import numpy as np

    from ..image.io import read_image, write_image
    from ..misc.color_checker import (
        apply_color_correction,
        color_correction_matrix,
    )

    with open(args.detections) as f:
        det = json.load(f)["checkers"]
    if not det:
        raise RuntimeError("no checker detections")
    measured = np.asarray(next(iter(det.values()))["colors"])
    M = color_correction_matrix(measured)
    if os.path.isdir(args.input):
        os.makedirs(args.output, exist_ok=True)
        files = sorted(
            f for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".npy"))
        )
        pairs = [(os.path.join(args.input, f), os.path.join(args.output, f))
                 for f in files]
    else:
        pairs = [(args.input, args.output)]
    for src, dst in pairs:
        img = read_image(src)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        write_image(dst, np.clip(apply_color_correction(img, M), 0, 1))
    print(json.dumps({"images": len(pairs)}))


# ---------------------------------------------------------------------------
# remaining exporters
# ---------------------------------------------------------------------------


def _setup_export_mvstex(p):
    p.add_argument("--input", required=True, help="posed .sfm")
    p.add_argument("--output", required=True, help="output folder")


@command("exportMVSTexturing", _setup_export_mvstex)
def _export_mvs_texturing(args):
    """MVS-Texturing (mvs-tex) camera format: one .cam per view
    ('tx ty tz R00..R22' / 'f d0 d1 paspect ppx ppy', normalized)
    (ref: src/software/export/main_exportMVSTexturing.cpp)."""
    from .. import sfmdata

    sc = sfmdata.load(args.input)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for v in sc.valid_views():
        K, R, c = sc.camera_matrices(v)
        t = -R @ c
        w, h = int(sc.view_sizes[v, 0]), int(sc.view_sizes[v, 1])
        f_norm = K[0, 0] / max(w, h)
        ppx, ppy = K[0, 2] / w, K[1, 2] / h
        paspect = K[1, 1] / K[0, 0]
        path = os.path.join(args.output, f"{int(sc.view_ids[v])}.cam")
        with open(path, "w") as fo:
            fo.write(
                f"{t[0]} {t[1]} {t[2]} "
                + " ".join(str(x) for x in R.reshape(-1))
                + "\n"
            )
            fo.write(f"{f_norm} 0 0 {paspect} {ppx} {ppy}\n")
        n += 1
    print(json.dumps({"cameras": n}))


def _setup_export_matlab(p):
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="output folder")


@command("exportMatlab", _setup_export_matlab)
def _export_matlab(args):
    """Per-view K/R/t text files loadable from Matlab/Octave
    (ref: src/software/export/main_exportMatlab.cpp)."""
    from .. import sfmdata

    sc = sfmdata.load(args.input)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for v in sc.valid_views():
        K, R, c = sc.camera_matrices(v)
        t = -R @ c
        vid = int(sc.view_ids[v])
        for name, arr in (("K", K), ("R", R), ("t", t.reshape(1, 3))):
            with open(os.path.join(args.output, f"{vid}_{name}.txt"), "w") as fo:
                for row in arr:
                    fo.write(" ".join(f"{x:.12g}" for x in row) + "\n")
        n += 1
    # one loader script
    with open(os.path.join(args.output, "load_scene.m"), "w") as fo:
        fo.write("% per-view K/R/t text files; t = -R*c (world->cam)\n")
    print(json.dumps({"cameras": n}))


def _setup_export_mmaya(p):
    p.add_argument("--input", required=True, help="reconstructed .sfm")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--images", default=None, help="undistorted images folder")


@command("exportMeshroomMaya", _setup_export_mmaya)
def _export_meshroom_maya(args):
    """MeshroomMaya project folder: native-Alembic scene + point cloud +
    per-view cameras + image list
    (ref: src/software/export/main_exportMeshroomMaya.cpp)."""
    import shutil

    from .. import sfmdata

    sc = sfmdata.load(args.input)
    os.makedirs(args.output, exist_ok=True)
    sfmdata.save(sc, os.path.join(args.output, "scene.abc"))
    sfmdata.save_ply(sc, os.path.join(args.output, "pointCloud.ply"))
    cams = {}
    for v in sc.valid_views():
        K, R, c = sc.camera_matrices(v)
        cams[int(sc.view_ids[v])] = {
            "K": K.tolist(), "R": R.tolist(), "c": c.tolist(),
            "image": os.path.basename(sc.view_paths[v] or ""),
            "size": [int(x) for x in sc.view_sizes[v]],
        }
    with open(os.path.join(args.output, "cameras.json"), "w") as f:
        json.dump(cams, f, indent=1)
    if args.images and os.path.isdir(args.images):
        dst = os.path.join(args.output, "undistorted")
        os.makedirs(dst, exist_ok=True)
        for fname in os.listdir(args.images):
            shutil.copy(os.path.join(args.images, fname), dst)
    print(json.dumps({"cameras": len(cams)}))
