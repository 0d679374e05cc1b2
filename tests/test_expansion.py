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


def test_expansion_history_and_checkpoint(tmp_path):
    """History records epochs; the checkpoint restores mid-reconstruction
    state into a fresh engine (ExpansionHistory.hpp analog)."""
    from alicevision_tpu.sfm.expansion import ExpansionHistory

    ckpt = str(tmp_path / "state.npz")
    scene, eng = _make_engine()
    proc = ExpansionProcess(eng, checkpoint_path=ckpt)
    res = proc.process()
    assert res.posed.sum() == 8
    assert len(proc.history.epochs) >= 1
    assert proc.history.epochs[-1]["n_posed"] == 8

    # restore into a fresh engine: state matches, expansion is a no-op
    scene2, eng2 = _make_engine()
    ExpansionHistory.load(eng2, ckpt)
    assert eng2.res.posed.sum() == res.posed.sum()
    np.testing.assert_allclose(eng2.res.pose_c, res.pose_c, atol=1e-12)
    res2 = ExpansionProcess(eng2).process()  # augmentation mode, no init
    assert res2.posed.sum() == 8


def test_expansion_lba_policy_connexity():
    from alicevision_tpu.sfm.expansion import LbaPolicyConnexity

    scene, eng = _make_engine()
    ExpansionProcess(eng).process()
    mask = LbaPolicyConnexity(distance=1).fixed_mask(eng, [0])
    # views covisible with view 0 stay refined (not fixed)
    assert mask.dtype == bool and mask.shape == (8,)
    assert not mask[0]
