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

    sc = sfmdata.load(args.input)
    matches = load_matches(args.matches)
    imgs = {}
    for v in range(sc.n_views):
        path = sc.view_paths[v]
        if path and os.path.exists(path):
            imgs[v] = read_image(path, grayscale=True)
    edges, mi, mj = [], [], []
    for (i, j), m in matches.items():
        if i not in imgs or j not in imgs or len(m) == 0:
            continue
        # matched-region statistic: mean intensity around matched features
        edges.append((i, j))
        mi.append(float(imgs[i].mean()))
        mj.append(float(imgs[j].mean()))
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
    p.add_argument("--output", required=True, help=".ply")


@command("exportColoredPointCloud", _setup_colored_cloud)
def _export_colored_point_cloud(args):
    """ref: src/software/export/main_exportColoredPointCloud.cpp"""
    from .. import sfmdata

    sc = sfmdata.load(args.input)
    _ensure_parent(args.output)
    sfmdata.save_ply(sc, args.output)


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
