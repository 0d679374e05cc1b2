"""Full-pipeline runner with stage-level checkpoints.

The reference relies on an external DAG orchestrator (Meshroom) wiring its
per-stage binaries through files (ref: README.md:75-80, SURVEY.md §3.6).
This runner is the in-process equivalent: it executes the canonical stage
chain, skips stages whose outputs already exist (file-granular resume,
exactly the reference's checkpoint contract), and records per-stage wall
times.
"""

from __future__ import annotations

import json
import os
import time


def run_full_pipeline(
    image_folder: str,
    work_folder: str,
    method: str = "exhaustive",
    max_keypoints: int = 4096,
    skip_mvs: bool = False,
    default_focal_px: float | None = None,
) -> dict:
    from . import stages

    os.makedirs(work_folder, exist_ok=True)
    p = lambda *x: os.path.join(work_folder, *x)
    timings = {}

    def stage(name, outputs, fn):
        if all(os.path.exists(o) for o in outputs):
            timings[name] = 0.0
            return
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)

    scene = p("cameraInit.sfm")
    stage("cameraInit", [scene],
          lambda: stages.camera_init(image_folder, scene, default_focal_px=default_focal_px))

    feats = p("features")
    stage("featureExtraction", [feats],
          lambda: stages.feature_extraction(scene, feats, max_keypoints=max_keypoints))

    pairs = p("pairs.txt")
    stage("imageMatching", [pairs],
          lambda: stages.image_matching(scene, feats, pairs, method=method))

    matches = p("matches.npz")
    stage("featureMatching", [matches],
          lambda: stages.feature_matching(scene, feats, pairs, matches))

    sfm_out = p("sfm.sfm")
    stage("incrementalSfm", [sfm_out],
          lambda: stages.incremental_sfm(scene, feats, matches, sfm_out))

    if not skip_mvs:
        dense = p("dense")
        stage("prepareDenseScene", [dense],
              lambda: stages.prepare_dense_scene(sfm_out, dense))

        depth = p("depth")
        stage("depthMapEstimation", [depth],
              lambda: stages.depth_map_estimation(sfm_out, dense, depth))

        depthf = p("depth_filtered")
        stage("depthMapFiltering", [depthf],
              lambda: stages.depth_map_filtering(sfm_out, depth, depthf))

        cloud = p("cloud.ply")
        stage("meshing", [cloud],
              lambda: stages.meshing_point_cloud(sfm_out, depthf, cloud))

    with open(p("timings.json"), "w") as f:
        json.dump(timings, f, indent=1)
    return timings
