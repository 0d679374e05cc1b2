import jax.numpy as jnp
import numpy as np

from alicevision_tpu import camera as cam
from alicevision_tpu.calibration.distortion_lines import calibrate_distortion_from_lines
from alicevision_tpu.misc.sphere_detection import detect_sphere
from alicevision_tpu.sfmdata.merge import merge_scenes, split_reconstructed


def _scene():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_stats_alignment_io import _consistent_scene

    return _consistent_scene()


def test_merge_disjoint_scenes():
    a = _scene()
    b = _scene()
    # make b's views distinct
    b.view_ids = b.view_ids + 1000
    b.pose_ids = b.pose_ids + 1000
    merged = merge_scenes(a, b)
    assert merged.n_views == a.n_views + b.n_views
    assert merged.n_poses == a.n_poses + b.n_poses
    assert merged.n_landmarks == a.n_landmarks + b.n_landmarks
    assert merged.n_observations == a.n_observations + b.n_observations


def test_split_reconstructed():
    a = _scene()
    # add two unposed views
    a.add_view(900, 0, 100, 100)
    a.add_view(901, 0, 100, 100)
    rec, non = split_reconstructed(a)
    assert rec.n_views == 6 and non.n_views == 2
    assert rec.n_observations == a.n_observations
    assert non.n_landmarks == 0 and non.n_poses == 0


def test_distortion_from_lines_recovers_k1():
    """Straight lines distorted with known k1: calibration recovers it."""
    intr = cam.make_intrinsics(640, 480, 500.0)
    k_gt = (-0.18, 0.03, 0.0)
    gt_row = intr._replace(
        disto_kind=jnp.asarray(cam.DISTO_RADIALK3),
        disto=jnp.zeros(cam.DISTO_PARAMS).at[:3].set(jnp.asarray(k_gt)),
    )
    # grid of horizontal + vertical lines in pixel space
    lines = []
    ts = np.linspace(60, 580, 24)
    for y in np.linspace(60, 420, 7):
        lines.append(np.stack([ts, np.full_like(ts, y)], -1))
    for x in np.linspace(80, 560, 7):
        t2 = np.linspace(40, 440, 24)
        lines.append(np.stack([np.full_like(t2, x), t2], -1))
    pts = jnp.asarray(np.stack(lines), jnp.float32)
    # distort them (apply forward distortion to the ideal positions)
    p = cam.ima2cam(gt_row, pts)
    d = cam.add_distortion(gt_row.disto_kind, gt_row.disto, p)
    pts_dist = cam.cam2ima(gt_row, d)

    mask = jnp.ones(pts.shape[:2], bool)
    disto, rms0, rms1 = calibrate_distortion_from_lines(pts_dist, mask, intr)
    assert rms1 < rms0 * 0.05, (rms0, rms1)
    assert abs(float(disto[0]) - k_gt[0]) < 0.02, np.asarray(disto)


def test_sphere_detection():
    H = W = 128
    ys, xs = np.mgrid[0:H, 0:W]
    cx, cy, r = 70, 55, 22
    img = 0.15 + 0.8 * (((xs - cx) ** 2 + (ys - cy) ** 2) <= r * r).astype(np.float32)
    import scipy.ndimage as ndi

    img = ndi.gaussian_filter(img, 1.0)
    res = detect_sphere(img, r_min=10, r_max=40, n_radii=16)
    assert res is not None
    dcx, dcy, dr, score = res
    assert abs(dcx - cx) <= 3 and abs(dcy - cy) <= 3
    assert abs(dr - r) <= 4
