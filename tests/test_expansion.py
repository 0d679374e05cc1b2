"""Modular expansion engine: equivalent results to the monolithic driver,
plus augmentation mode."""

import numpy as np
import jax

from alicevision_tpu import camera as cam
from alicevision_tpu.sfm.expansion import ExpansionProcess
from alicevision_tpu.sfm.incremental import IncrementalConfig, IncrementalSfM
from alicevision_tpu.utils.synthetic import ring_scene


def _make_engine(seed=0):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_incremental_sfm import _tracks_from_scene

    scene = ring_scene(n_views=8, n_points=100, noise_px=0.3, seed=0)
    tracks, features_xy, _ = _tracks_from_scene(scene)
    intr = cam.Intrinsics(
        *jax.tree_util.tree_map(lambda a: np.asarray(a)[None], scene.intrinsics)
    )
    eng = IncrementalSfM(
        tracks, features_xy, intr,
        view_intrinsic=np.zeros(8, np.int32),
        image_sizes=np.tile([1920, 1080], (8, 1)),
        config=IncrementalConfig(seed=seed),
    )
    return scene, eng


def test_expansion_process_full():
    scene, eng = _make_engine()
    res = ExpansionProcess(eng).process()
    assert res.posed.sum() == 8
    assert res.point_valid.sum() > 70


def test_expansion_augmentation_mode():
    """A pre-initialized scene skips bootstrap and expands the rest."""
    scene, eng = _make_engine(seed=1)
    # manually initialize from ground truth poses of views 0 and 1
    proc = ExpansionProcess(eng)
    assert eng.initialize()
    eng.triangulate_all()
    posed_before = int(eng.res.posed.sum())
    assert posed_before >= 2

    res = proc.process()  # must detect existing scene, not re-bootstrap
    assert res.posed.sum() == 8
    # history should not contain a second 'init'
    inits = [h for h in res.history if h[0] == "init"]
    assert len(inits) == 1
