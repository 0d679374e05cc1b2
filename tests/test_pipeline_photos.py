"""The full pipeline on ACTUAL PHOTOGRAPHS: JPEG bytes with EXIF in,
poses + distortion out — plus the video-feed round trip.

Every other e2e path feeds `.npy` arrays; this one encodes the rendered
hard views as JPEGs carrying EXIF Make/Model/FocalLength, so cameraInit
must derive the focal through the EXIF + sensor-database path exactly
like the reference's every real run
(ref: src/software/pipeline/main_cameraInit.cpp:323-343 EXIF ingestion,
src/aliceVision/sensorDB/parseDatabase.hpp sensor lookup), and the
front-end must survive JPEG quantization noise.

ref: src/aliceVision/dataio/VideoFeed.cpp (video round trip),
src/software/pipeline/main_keyframeSelection.cpp (video keyframes).
"""

import os

import numpy as np
import pytest

from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.rendered import render_hard_views

MAKE, MODEL = "Canon", "Canon EOS 5D Mark III"  # 36.0 mm in the sensor DB
SENSOR_W_MM = 36.0


def _write_jpegs(imgs, img_dir, focal_px, quality=95):
    """Encode grayscale float frames as JPEGs with EXIF make/model/focal."""
    from PIL import Image

    W = imgs.shape[2]
    focal_mm = focal_px * SENSOR_W_MM / W
    os.makedirs(img_dir, exist_ok=True)
    for v in range(imgs.shape[0]):
        u8 = np.clip(imgs[v] * 255.0, 0, 255).astype(np.uint8)
        im = Image.fromarray(u8).convert("RGB")
        exif = Image.Exif()
        exif[271] = MAKE  # Make
        exif[272] = MODEL  # Model
        exif[37386] = focal_mm  # FocalLength
        im.save(
            os.path.join(img_dir, f"view_{v:03d}.jpg"),
            quality=quality,
            exif=exif,
        )
    return focal_mm


@pytest.fixture(scope="module")
def photo_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("photos")
    # same operating point as the .npy hard-image benchmark
    # (tests/test_hard_scene_images.py): 40 views keep the 9-degree ring
    # spacing SIFT covisibility needs
    V, W, H = 40, 640, 480
    f = 900.0 * W / 1280
    disto_true = (-0.25, 0.06, -0.005)
    imgs, K, disto, R_gt, c_gt = render_hard_views(
        n_views=V, wh=(W, H), focal_px=f, disto=disto_true
    )
    img_dir = os.path.join(d, "imgs")
    _write_jpegs(imgs, img_dir, f)

    work = os.path.join(d, "w")
    os.makedirs(work)
    scene_f = os.path.join(work, "cameraInit.sfm")
    # NO default focal: cameraInit must go EXIF -> sensor DB -> focal_px
    sc = stages.camera_init(img_dir, scene_f)
    feats = os.path.join(work, "features")
    stages.feature_extraction(
        scene_f, feats, max_keypoints=4096, downscale_to=0,
        describer_types="dspsift",
    )
    pairs_f = os.path.join(work, "pairs.txt")
    stages.image_matching(scene_f, feats, pairs_f, method="voctree",
                          n_neighbors=6)
    matches_f = os.path.join(work, "matches.npz")
    stages.feature_matching(scene_f, feats, pairs_f, matches_f)
    out = stages.incremental_sfm(
        scene_f, feats, matches_f, os.path.join(work, "sfm.sfm")
    )
    return sc, out, f, disto_true, c_gt, V


def test_camera_init_reads_exif_and_sensor_db(photo_pipeline):
    sc, out, f, disto_true, c_gt, V = photo_pipeline
    assert sc.n_views == V
    # one shared intrinsic for the whole (make, model, focal, size) group
    assert len(np.unique(np.asarray(sc.view_intrinsic))) == 1
    # the EXIF->sensor-DB focal must land on the render focal
    f_init = float(np.asarray(sc.intrinsics_table().scale)[0, 0])
    assert abs(f_init - f) / f < 0.005, (f_init, f)


def test_poses_and_ate_from_jpeg_photos(photo_pipeline):
    sc, out, f, disto_true, c_gt, V = photo_pipeline
    vp = out.view_pose
    posed_v = [v for v in range(V) if vp[v] >= 0]
    assert len(posed_v) >= V - 1, f"{len(posed_v)}/{V} posed"

    est = np.stack([out.pose_c[vp[v]] for v in posed_v])
    gt = c_gt[posed_v]
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(gc.T @ ec / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((ec**2).sum() / len(est))
    ate = float(np.sqrt(np.mean(np.sum(
        (est @ (s * R).T + (mu_g - s * R @ mu_e) - gt) ** 2, axis=1))))
    radius = float(np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean())
    # same bar as the .npy variant (JPEG quantization adds front-end noise)
    assert ate / radius < 0.012, ate / radius


def test_intrinsics_recovered_from_jpeg_photos(photo_pipeline):
    sc, out, f, disto_true, c_gt, V = photo_pipeline
    rec_f = float(np.mean(out.scale[0]))
    assert abs(rec_f - f) / f < 0.03
    k1 = float(out.disto[0][0])
    assert -0.40 < k1 < -0.12  # true -0.25; prior was 0.0


# ---------------------------------------------------------------------------
# video feed (dataio/VideoFeed.cpp)
# ---------------------------------------------------------------------------


def _write_video(path, frames, fps=10):
    import cv2

    H, W = frames[0].shape
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (W, H), isColor=True
    )
    assert vw.isOpened(), "cv2.VideoWriter failed to open"
    for fr in frames:
        u8 = np.clip(fr * 255.0, 0, 255).astype(np.uint8)
        vw.write(np.stack([u8] * 3, -1))
    vw.release()


def test_video_feed_round_trip(tmp_path):
    from alicevision_tpu.image.feeds import feed_provider, video_feed

    rng = np.random.RandomState(0)
    base = rng.rand(64, 96).astype(np.float32)
    frames = [np.roll(base, 2 * i, axis=1) for i in range(10)]
    path = str(tmp_path / "seq.avi")
    _write_video(path, frames)

    got = list(video_feed(path, grayscale=True))
    assert len(got) == 10
    assert got[0][1] == 0 and got[-1][1] == 9
    for (img, idx) in got:
        assert img.shape == (64, 96)
        # MJPG is lossy: demand correlation with the source frame
        a = img - img.mean()
        b = frames[idx] - frames[idx].mean()
        corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
        assert corr > 0.95, (idx, corr)

    # stride + feed_provider dispatch
    strided = list(video_feed(path, stride=3))
    assert [i for _, i in strided] == [0, 3, 6, 9]
    via_provider = list(feed_provider(path))
    assert len(via_provider) == 10


def test_keyframe_selection_from_video(tmp_path):
    from alicevision_tpu.pipeline.cli import main

    rng = np.random.RandomState(1)
    base = rng.rand(48, 64).astype(np.float32)
    frames = [np.roll(base, 3 * i, axis=1) for i in range(12)]
    path = str(tmp_path / "pan.avi")
    _write_video(path, frames)
    out = str(tmp_path / "sel.txt")
    assert main(["keyframeSelection", "--inputFolder", path, "--output", out,
                 "--method", "regular", "--step", "5"]) == 0
    assert open(out).read().split() == [
        "frame_000000", "frame_000005", "frame_000010"
    ]
    out2 = str(tmp_path / "sel_smart.txt")
    assert main(["keyframeSelection", "--inputFolder", path,
                 "--output", out2, "--method", "smart"]) == 0
    sel = open(out2).read().split()
    assert len(sel) >= 2
    assert all(s.startswith("frame_") for s in sel)
