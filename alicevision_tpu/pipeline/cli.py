"""`av` — the framework CLI, one subcommand per pipeline stage.

TPU-native counterpart of the reference's ~105 per-stage executables
(ref: SURVEY.md §2.7, src/aliceVision/cmdline/cmdline.cpp:13-26 shared
flags). One binary with subcommands instead of 105 mains; the stage-level
file contract is identical in spirit so external orchestrators can drive
it the same way Meshroom drives the reference.

Usage examples:
  av cameraInit --imageFolder imgs/ --output scene.sfm
  av featureExtraction --input scene.sfm --output feats/
  av imageMatching --input scene.sfm --features feats/ --output pairs.txt
  av featureMatching --input scene.sfm --features feats/ \
      --pairs pairs.txt --output matches.npz
  av incrementalSfm --input scene.sfm --features feats/ \
      --matches matches.npz --output sfm.sfm
  av prepareDenseScene --input sfm.sfm --output dense/
  av depthMapEstimation --input sfm.sfm --images dense/ --output depth/
  av depthMapFiltering --input sfm.sfm --depth depth/ --output depthf/
  av meshing --input sfm.sfm --depth depthf/ --output cloud.ply
  av pipeline --imageFolder imgs/ --output work/     # run everything
"""

from __future__ import annotations

import argparse
import sys
import time


def _add_common(p):
    p.add_argument("--verboseLevel", default="info", help="log level")
    p.add_argument("--rangeStart", type=int, default=0)
    p.add_argument("--rangeSize", type=int, default=-1)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="av", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("cameraInit")
    p.add_argument("--imageFolder", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sensorDatabase", default=None)
    p.add_argument("--defaultFocalPx", type=float, default=None)
    _add_common(p)

    p = sub.add_parser("featureExtraction")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--maxKeypoints", type=int, default=4096)
    p.add_argument("--dsp", action="store_true")
    p.add_argument("--downscaleTo", type=int, default=1024)
    _add_common(p)

    p = sub.add_parser("imageMatching")
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--method", default="exhaustive",
                   choices=["exhaustive", "voctree", "sequential"])
    p.add_argument("--nbNeighbors", type=int, default=10)
    _add_common(p)

    p = sub.add_parser("featureMatching")
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--pairs", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--ratio", type=float, default=0.8)
    p.add_argument("--geometric", default="fundamental",
                   choices=["fundamental", "none"])
    _add_common(p)

    p = sub.add_parser("incrementalSfm")
    p.add_argument("--input", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--matches", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--minTrackLength", type=int, default=2)
    _add_common(p)

    p = sub.add_parser("prepareDenseScene")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    _add_common(p)

    p = sub.add_parser("depthMapEstimation")
    p.add_argument("--input", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--nbDepths", type=int, default=96)
    p.add_argument("--nbTCams", type=int, default=4)
    p.add_argument("--downscale", type=int, default=2)
    _add_common(p)

    p = sub.add_parser("depthMapFiltering")
    p.add_argument("--input", required=True)
    p.add_argument("--depth", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--minConsistent", type=int, default=3)
    p.add_argument("--downscale", type=int, default=2)
    _add_common(p)

    p = sub.add_parser("meshing")
    p.add_argument("--input", required=True)
    p.add_argument("--depth", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--voxelSize", type=float, default=0.0)
    p.add_argument("--downscale", type=int, default=2)
    _add_common(p)

    p = sub.add_parser("meshSurface")
    p.add_argument("--input", required=True)
    p.add_argument("--depth", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--images", default=None, help="undistorted images for color bake")
    p.add_argument("--voxelSize", type=float, default=0.0)
    p.add_argument("--downscale", type=int, default=2)
    p.add_argument("--maxPoints", type=int, default=50000)
    _add_common(p)

    p = sub.add_parser("meshFiltering")
    p.add_argument("--input", required=True, help="input .obj")
    p.add_argument("--output", required=True)
    p.add_argument("--smoothIters", type=int, default=5)
    p.add_argument("--keepRatio", type=float, default=0.0)
    _add_common(p)

    p = sub.add_parser("meshDecimate")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--cellSize", type=float, required=True)
    _add_common(p)

    p = sub.add_parser("convertSfMFormat")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    _add_common(p)

    p = sub.add_parser("pipeline")
    p.add_argument("--imageFolder", required=True)
    p.add_argument("--output", required=True, help="working folder")
    p.add_argument("--method", default="exhaustive")
    p.add_argument("--maxKeypoints", type=int, default=4096)
    p.add_argument("--skipMvs", action="store_true")
    p.add_argument("--defaultFocalPx", type=float, default=None)
    _add_common(p)

    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from . import stages

    t0 = time.time()
    if args.cmd == "cameraInit":
        stages.camera_init(args.imageFolder, args.output, args.sensorDatabase,
                           args.defaultFocalPx)
    elif args.cmd == "featureExtraction":
        stages.feature_extraction(
            args.input, args.output, args.maxKeypoints, args.dsp,
            args.rangeStart, args.rangeSize, args.downscaleTo,
        )
    elif args.cmd == "imageMatching":
        stages.image_matching(
            args.input, args.features, args.output, args.method, args.nbNeighbors
        )
    elif args.cmd == "featureMatching":
        stages.feature_matching(
            args.input, args.features, args.pairs, args.output,
            args.ratio, args.geometric,
            range_start=args.rangeStart, range_size=args.rangeSize,
        )
    elif args.cmd == "incrementalSfm":
        stages.incremental_sfm(
            args.input, args.features, args.matches, args.output,
            args.minTrackLength,
        )
    elif args.cmd == "prepareDenseScene":
        stages.prepare_dense_scene(args.input, args.output)
    elif args.cmd == "depthMapEstimation":
        stages.depth_map_estimation(
            args.input, args.images, args.output, args.nbDepths, args.nbTCams,
            args.downscale, args.rangeStart, args.rangeSize,
        )
    elif args.cmd == "depthMapFiltering":
        stages.depth_map_filtering(
            args.input, args.depth, args.output, args.minConsistent, args.downscale
        )
    elif args.cmd == "meshing":
        stages.meshing_point_cloud(
            args.input, args.depth, args.output, args.voxelSize, args.downscale
        )
    elif args.cmd == "meshSurface":
        stages.meshing_surface(
            args.input, args.depth, args.output, args.voxelSize, args.downscale,
            args.maxPoints, images_folder=args.images,
        )
    elif args.cmd == "meshFiltering":
        from ..mesh import laplacian_smooth, largest_component, load_obj, save_obj

        v, f = load_obj(args.input)
        v, f = largest_component(v, f, keep_ratio=args.keepRatio)
        v = laplacian_smooth(v, f, iterations=args.smoothIters)
        save_obj(args.output, v, f)
    elif args.cmd == "meshDecimate":
        from ..mesh import decimate_grid, load_obj, save_obj

        v, f = load_obj(args.input)
        v, f = decimate_grid(v, f, args.cellSize)
        save_obj(args.output, v, f)
    elif args.cmd == "convertSfMFormat":
        from .. import sfmdata

        sfmdata.save(sfmdata.load(args.input), args.output)
    elif args.cmd == "pipeline":
        from .runner import run_full_pipeline

        run_full_pipeline(
            args.imageFolder,
            args.output,
            method=args.method,
            max_keypoints=args.maxKeypoints,
            skip_mvs=args.skipMvs,
            default_focal_px=args.defaultFocalPx,
        )
    print(f"[av] {args.cmd} done in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
