"""Marker detection tests (features/markers.py): render -> detect
round-trips, warped tags, and matching interop."""

import numpy as np

from alicevision_tpu.features import markers as mk


def _place(canvas, patch, y, x):
    h, w = patch.shape
    canvas[y : y + h, x : x + w] = patch
    return canvas


def test_apriltag_roundtrip_axis_aligned():
    img = np.ones((300, 400), np.float32)
    _place(img, mk.render_apriltag(3, 96), 30, 40)
    _place(img, mk.render_apriltag(17, 80), 150, 250)
    dets = mk.detect_apriltags(img)
    ids = sorted(d.marker_id for d in dets)
    assert ids == [3, 17]
    d3 = next(d for d in dets if d.marker_id == 3)
    # center of the black border ring of the 96px tag at (40, 30)
    assert np.linalg.norm(d3.center - np.array([40 + 48, 30 + 48])) < 3.0


def test_apriltag_rotated_and_scaled():
    from scipy import ndimage

    base = np.ones((260, 260), np.float32)
    _place(base, mk.render_apriltag(7, 128), 60, 60)
    rot = ndimage.rotate(base, 25, reshape=False, cval=1.0, order=1)
    dets = mk.detect_apriltags(rot)
    assert [d.marker_id for d in dets] == [7]


def test_apriltag_all_ids_decode():
    for tid in range(0, 30, 5):
        img = np.ones((160, 160), np.float32)
        _place(img, mk.render_apriltag(tid, 96), 30, 30)
        dets = mk.detect_apriltags(img)
        assert [d.marker_id for d in dets] == [tid], tid


def test_cctag_roundtrip():
    img = np.ones((320, 420), np.float32) * 0.9
    tag0 = mk.render_cctag(0, 121)
    tag9 = mk.render_cctag(9, 97)
    _place(img, tag0, 40, 50)
    _place(img, tag9, 160, 260)
    dets = mk.detect_cctags(img)
    found = {d.marker_id: d for d in dets}
    assert 0 in found and 9 in found
    assert np.linalg.norm(found[0].center - np.array([50 + 60, 40 + 60])) < 4.0


def test_markers_to_features_matching():
    dets_a = [
        mk.MarkerDetection(3, np.array([10.0, 20.0]), None, 5.0),
        mk.MarkerDetection(7, np.array([50.0, 60.0]), None, 5.0),
    ]
    dets_b = [
        mk.MarkerDetection(7, np.array([55.0, 61.0]), None, 5.0),
        mk.MarkerDetection(3, np.array([12.0, 22.0]), None, 5.0),
    ]
    xy_a, _, _, da = mk.markers_to_features(dets_a)
    xy_b, _, _, db = mk.markers_to_features(dets_b)
    sim = da.astype(np.float32) @ db.astype(np.float32).T
    nn = sim.argmax(1)
    assert nn[0] == 1 and nn[1] == 0  # id-exact matches
