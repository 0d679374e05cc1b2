"""Incremental SfM with the local-BA path active (low threshold)."""

import numpy as np
import jax

from alicevision_tpu import camera as cam
from alicevision_tpu.sfm.incremental import IncrementalConfig, IncrementalSfM
from alicevision_tpu.utils.synthetic import ring_scene


def test_incremental_with_local_ba():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_incremental_sfm import _tracks_from_scene, _align_similarity

    scene = ring_scene(n_views=10, n_points=120, noise_px=0.3, seed=5)
    tracks, features_xy, _ = _tracks_from_scene(scene)
    intr = cam.Intrinsics(
        *jax.tree_util.tree_map(lambda a: np.asarray(a)[None], scene.intrinsics)
    )
    engine = IncrementalSfM(
        tracks, features_xy, intr,
        view_intrinsic=np.zeros(10, np.int32),
        image_sizes=np.tile([1920, 1080], (10, 1)),
        config=IncrementalConfig(
            seed=0, local_ba_min_views=4, group_add=2, local_ba_distance=1
        ),
    )
    res = engine.process()
    assert res.posed.sum() == 10
    est = res.pose_c[res.posed]
    gt = np.asarray(scene.poses.c)[res.posed]
    s, R, t = _align_similarity(est, gt)
    ate = np.sqrt(np.mean(np.sum((est @ (s * R).T + t - gt) ** 2, axis=1)))
    assert ate < 0.08, ate
