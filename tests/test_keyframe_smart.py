"""Smart keyframe selection on a synthetic sequence — step adaptation,
per-subsequence sharpness pick, and the reference's center weights.

ref: src/aliceVision/keyframe/KeyframeSelector.cpp:195-340 (smart
selection), :996-1062 (sharpness), :1104-1190 (flow).
"""

import numpy as np
import scipy.ndimage as ndi

from alicevision_tpu.keyframe.selector import (
    _center_weights,
    select_keyframes_smart,
)


def _make_sequence(n_move=12, n_static=8, shift_px=3, seed=0):
    """A pan segment (shift_px/frame) followed by a static segment.

    Within each segment most frames are blurred; a few are sharp — the
    smart selector must place subsequence cuts by accumulated motion and
    pick the SHARP frame inside each subsequence."""
    rng = np.random.RandomState(seed)
    base = rng.rand(64, 96).astype(np.float32)
    frames, sharp_flags = [], []
    for i in range(n_move):
        f = np.roll(base, shift_px * i, axis=1)
        if i % 4 == 1:  # one sharp frame per ~4
            frames.append(f)
            sharp_flags.append(True)
        else:
            frames.append(ndi.gaussian_filter(f, 1.8))
            sharp_flags.append(False)
    still = np.roll(base, shift_px * (n_move - 1), axis=1)
    for i in range(n_static):
        if i == 3:
            frames.append(still)
            sharp_flags.append(True)
        else:
            frames.append(ndi.gaussian_filter(still, 1.8))
            sharp_flags.append(False)
    return frames, np.array(sharp_flags)


def test_center_weights_match_reference_deque():
    # odd size: middle 2.0, endpoints exactly 1.0
    w5 = _center_weights(5)
    assert np.allclose(w5, [1.0, 1.5, 2.0, 1.5, 1.0])
    # even size: BOTH middles 2.0, endpoints 1 + 1/(size-1)
    w4 = _center_weights(4)
    assert np.allclose(w4, [2 - 2 / 3, 2.0, 2.0, 2 - 2 / 3])
    w6 = _center_weights(6)
    assert np.allclose(w6, [1.2, 1.6, 2.0, 2.0, 1.6, 1.2])
    assert np.allclose(_center_weights(1), [2.0])


def test_smart_selection_picks_sharp_frames():
    frames, sharp_flags = _make_sequence()
    # ~3 px flow/frame on a 64-row image: px_displacement=20 -> step 12.8,
    # so every subsequence spans >=4 consecutive frames and therefore
    # contains one of the every-4th sharp frames
    sel = select_keyframes_smart(frames, px_displacement=20.0)
    assert len(sel) >= 2
    # every selected frame past the forced first one must be a sharp frame
    interior = [j for j in sel if j not in (0,)]
    assert interior, "selection collapsed to frame 0 only"
    assert all(sharp_flags[j] for j in interior), (
        f"picked blurred frames: {[j for j in interior if not sharp_flags[j]]}"
    )


def test_smart_selection_subsequences_follow_motion():
    # the static tail accumulates ~zero flow: all its keyframes collapse
    # into (at most) one subsequence, while the pan segment is split
    frames, _ = _make_sequence(n_move=16, n_static=10)
    sel = select_keyframes_smart(frames, px_displacement=8.0)
    n_move = 16
    in_static = [j for j in sel if j >= n_move + 1]
    assert len(in_static) <= 1, f"static segment over-split: {in_static}"
    in_move = [j for j in sel if j < n_move]
    assert len(in_move) >= 2, f"pan segment under-split: {sel}"


def test_smart_selection_step_adaptation_min_frames():
    # a nearly-static sequence yields one subsequence at the natural step;
    # min_out_frames forces the -0.5 step adaptation (down to regular
    # sampling at step 0) until enough keyframes come out
    rng = np.random.RandomState(3)
    base = rng.rand(48, 48).astype(np.float32)
    frames = [base + 0.001 * rng.rand(48, 48).astype(np.float32)
              for _ in range(12)]
    sel1 = select_keyframes_smart(frames, px_displacement=20.0)
    assert len(sel1) <= 2
    sel4 = select_keyframes_smart(
        frames, px_displacement=20.0, min_out_frames=4
    )
    assert len(sel4) >= 4, sel4


def test_smart_selection_step_adaptation_max_frames():
    # fast pan splits everywhere; max_out_frames forces the +0.5 step
    # adaptation until the count fits
    frames, _ = _make_sequence(n_move=20, n_static=0, shift_px=4)
    sel = select_keyframes_smart(frames, px_displacement=2.0)
    capped = select_keyframes_smart(
        frames, px_displacement=2.0, max_out_frames=3
    )
    assert len(capped) <= 3 < len(sel)
