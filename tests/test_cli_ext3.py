"""CLI tests: mesh rendering, distortion conversion/export, photometric
stereo tools, lighting calibration, rig tools, panorama stages, image
masking, exporters."""

import json
import os

import numpy as np
import pytest

from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline.cli import main


def _run(*argv):
    assert main(list(argv)) == 0


# ---------------------------------------------------------------------------
# mesh rendering
# ---------------------------------------------------------------------------


def _unit_quad_scene(tmp_path, z=2.0):
    """One camera at origin looking at a textured quad at depth z."""
    sc = sfmdata.SfMData.empty()
    w, h = 64, 48
    f = 60.0
    ii = sc.add_intrinsic(0, w, h, f)
    vi = sc.add_view(7, ii, w, h)
    sc.set_pose(vi, np.eye(3), np.zeros(3))
    scene_f = str(tmp_path / "cam.sfm")
    sfmdata.save(sc, scene_f)
    # quad spanning the field of view at depth z
    V = np.array([[-2, -2, z], [2, -2, z], [2, 2, z], [-2, 2, z]], float)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    from alicevision_tpu.mesh import save_obj

    mesh_f = str(tmp_path / "quad.obj")
    save_obj(mesh_f, V, F)
    return scene_f, mesh_f, z


def test_depth_and_normal_rendering(tmp_path):
    scene_f, mesh_f, z = _unit_quad_scene(tmp_path)
    out = str(tmp_path / "depth")
    _run("depthMapRendering", "--input", scene_f, "--mesh", mesh_f,
         "--output", out, "--downscale", "1")
    d = np.load(os.path.join(out, "7_depth.npy"))
    assert d.shape == (48, 64)
    hit = d > 0
    assert hit.mean() > 0.9  # quad covers the frame
    assert np.allclose(d[hit], z, atol=1e-3)  # fronto-parallel plane

    outn = str(tmp_path / "nrm")
    _run("normalMapRendering", "--input", scene_f, "--mesh", mesh_f,
         "--output", outn, "--downscale", "1")
    n = np.load(os.path.join(outn, "7_normal.npy"))
    hit_n = np.linalg.norm(n, axis=-1) > 0.5
    # plane normal faces the camera: (0, 0, -1) in camera frame
    assert np.allclose(n[hit_n], [0, 0, -1], atol=1e-3)


def test_mesh_remove_unseen(tmp_path):
    scene_f, mesh_f, z = _unit_quad_scene(tmp_path)
    # add a second quad BEHIND the first one: occluded, must be removed
    from alicevision_tpu.mesh import load_obj, save_obj

    V, F = load_obj(mesh_f)
    V2 = V + np.array([0, 0, 2.0])
    Vall = np.concatenate([V, V2])
    Fall = np.concatenate([F, F + 4]).astype(np.int32)
    both_f = str(tmp_path / "both.obj")
    save_obj(both_f, Vall, Fall)
    out_f = str(tmp_path / "seen.obj")
    _run("meshRemoveUnseenFaces", "--input", scene_f, "--mesh", both_f,
         "--output", out_f, "--downscale", "1")
    Vs, Fs = load_obj(out_f)
    assert len(Fs) == 2  # only the front quad survives
    assert np.allclose(Vs[:, 2], z)


def test_merge_meshes_cli(tmp_path):
    from alicevision_tpu.mesh import load_obj, save_obj

    V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    F = np.array([[0, 1, 2]], np.int32)
    a = str(tmp_path / "a.obj")
    b = str(tmp_path / "b.obj")
    save_obj(a, V, F)
    save_obj(b, V + 5.0, F)
    out = str(tmp_path / "m.obj")
    _run("mergeMeshes", "--input", a, "--input2", b, "--output", out)
    Vm, Fm = load_obj(out)
    assert len(Vm) == 6 and len(Fm) == 2


# ---------------------------------------------------------------------------
# distortion conversion / export
# ---------------------------------------------------------------------------


def test_convert_distortion_roundtrip(tmp_path):
    import jax.numpy as jnp

    from alicevision_tpu import camera as cam

    sc = sfmdata.SfMData.empty()
    sc.add_intrinsic(0, 640, 480, 500.0, disto_kind=cam.DISTO_RADIALK3,
                     disto_params=(-0.2, 0.03, -0.002))
    sc.add_view(1, 0, 640, 480)
    a = str(tmp_path / "a.sfm")
    sfmdata.save(sc, a)
    out = str(tmp_path / "brown.sfm")
    _run("convertDistortion", "--input", a, "--output", out, "--to", "brown")
    got = sfmdata.load(out)
    assert got.disto_kind[0] == cam.DISTO_BROWN
    # the fitted Brown radial part reproduces the K3 polynomial
    assert np.allclose(got.disto[0, :3], [-0.2, 0.03, -0.002], atol=1e-3)

    exp = str(tmp_path / "disto")
    _run("exportDistortion", "--input", a, "--output", exp)
    st = np.load(os.path.join(exp, "0_undistort_stmap.npy"))
    assert st.shape[-1] == 2
    assert np.isfinite(st).all()


def test_distortion_calibration_from_checkerboard(tmp_path):
    """Synthetic distorted checkerboard corners -> recover k1."""
    import jax.numpy as jnp

    from alicevision_tpu import camera as cam

    rows, cols = 7, 9
    w, h, f = 640, 480, 500.0
    k1 = -0.15
    intr = cam.make_intrinsics(w, h, f, disto_kind=cam.DISTO_RADIALK3,
                               disto_params=(k1, 0.0, 0.0))
    # ideal grid in normalized plane, distorted to pixels
    xs = (np.arange(cols) - cols / 2) * 0.08
    ys = (np.arange(rows) - rows / 2) * 0.08
    g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
    pd = cam.add_distortion(intr.disto_kind, intr.disto, jnp.asarray(g))
    pix = np.asarray(cam.cam2ima(intr, pd)).reshape(rows, cols, 2)

    det_f = str(tmp_path / "corners.json")
    with open(det_f, "w") as fo:
        json.dump({"rows": rows, "cols": cols,
                   "detections": {"img0.png": pix.reshape(-1, 2).tolist()}}, fo)
    sc = sfmdata.SfMData.empty()
    sc.add_intrinsic(0, w, h, f)
    sc.add_view(1, 0, w, h)
    a = str(tmp_path / "a.sfm")
    sfmdata.save(sc, a)
    out = str(tmp_path / "cal.sfm")
    _run("distortionCalibration", "--input", a, "--checkerboards", det_f,
         "--output", out, "--nbParams", "1")
    got = sfmdata.load(out)
    assert np.isclose(got.disto[0, 0], k1, atol=0.02)


# ---------------------------------------------------------------------------
# photometric stereo / lighting tools
# ---------------------------------------------------------------------------


def test_photometric_stereo_cli(tmp_path):
    rng = np.random.default_rng(3)
    H, W = 24, 24
    # ground-truth normals of a sphere cap
    ys, xs = np.mgrid[0:H, 0:W]
    nx = (xs - W / 2) / (W / 2) * 0.6
    ny = (ys - H / 2) / (H / 2) * 0.6
    nz = -np.sqrt(np.clip(1 - nx**2 - ny**2, 0.05, 1))
    n = np.stack([nx, ny, nz], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    L = np.array([[0.2, 0.1, -1.0], [-0.4, 0.3, -0.9], [0.3, -0.5, -0.8],
                  [0.0, 0.0, -1.0]])
    L /= np.linalg.norm(L, axis=-1, keepdims=True)
    d = str(tmp_path / "ps")
    os.makedirs(d)
    for k in range(len(L)):
        img = np.clip((n @ L[k]), 0, None)
        np.save(os.path.join(d, f"im_{k}.npy"), img.astype(np.float32))
    lights_f = str(tmp_path / "lights.json")
    with open(lights_f, "w") as f:
        json.dump({"directions": L.tolist()}, f)
    out = str(tmp_path / "out")
    _run("photometricStereo", "--inputFolder", d, "--lights", lights_f,
         "--output", out, "--integrate")
    got = np.load(os.path.join(out, "normals.npy"))
    dot = np.sum(got * n, -1)
    assert np.median(np.abs(dot)) > 0.99
    assert os.path.exists(os.path.join(out, "depth.npy"))

    # lightingEstimation round-trip on the same data
    np.save(str(tmp_path / "n.npy"), n.astype(np.float32))
    import jax.numpy as jnp

    from alicevision_tpu.photometric import render_sh

    Lsh = np.zeros(9)
    Lsh[0], Lsh[3] = 0.5, -0.4
    shade = np.asarray(render_sh(jnp.asarray(n), jnp.asarray(Lsh)))
    np.save(str(tmp_path / "shade.npy"), shade.astype(np.float32))
    sh_f = str(tmp_path / "sh.json")
    _run("lightingEstimation", "--normals", str(tmp_path / "n.npy"),
         "--image", str(tmp_path / "shade.npy"), "--output", sh_f)
    got_sh = np.asarray(json.load(open(sh_f))["sh"])
    assert np.allclose(got_sh[:4], Lsh[:4], atol=1e-3)


def test_lighting_calibration_sphere(tmp_path):
    """Specular sphere with a highlight from a known light direction."""
    H, W, r = 96, 96, 30
    cx = cy = 48.0
    light = np.array([0.3, -0.2, -0.93])
    light /= np.linalg.norm(light)
    ys, xs = np.mgrid[0:H, 0:W]
    nx = (xs - cx) / r
    ny = (ys - cy) / r
    inside = nx**2 + ny**2 < 1
    nz = -np.sqrt(np.clip(1 - nx**2 - ny**2, 0, 1))
    normals = np.stack([nx, ny, nz], -1)
    view = np.array([0, 0, -1.0])
    hvec = light + view
    hvec /= np.linalg.norm(hvec)
    spec = np.clip((normals @ hvec), 0, 1) ** 80
    img = np.where(inside, 0.1 + 0.9 * spec, 0.0).astype(np.float32)
    d = str(tmp_path / "lc")
    os.makedirs(d)
    np.save(os.path.join(d, "im0.npy"), img)
    out = str(tmp_path / "lights.json")
    _run("lightingCalibration", "--inputFolder", d,
         "--sphere", f"{cx},{cy},{r}", "--output", out)
    got = np.asarray(json.load(open(out))["directions"][0])
    assert got @ light > 0.99


def test_sphere_detection_cli(tmp_path):
    H, W = 96, 96
    ys, xs = np.mgrid[0:H, 0:W]
    img = (((xs - 40) ** 2 + (ys - 50) ** 2) < 20**2).astype(np.float32)
    src = str(tmp_path / "s.npy")
    np.save(src, img)
    out = str(tmp_path / "sphere.json")
    _run("sphereDetection", "--input", src, "--output", out,
         "--minRadius", "10", "--maxRadius", "32")
    got = json.load(open(out))
    assert got["found"]
    cx, cy, r = got["sphere"]
    assert abs(cx - 40) <= 3 and abs(cy - 50) <= 3 and abs(r - 20) <= 3


def test_image_masking_cli(tmp_path):
    img = np.zeros((16, 16, 3), np.float32)
    img[:8] = [0.1, 0.9, 0.1]  # green top half
    src = str(tmp_path / "img.npy")
    np.save(src, img)
    out = str(tmp_path / "mask.png")
    _run("imageMasking", "--input", src, "--output", out,
         "--hsvMin", "0.2,0.3,0.3", "--hsvMax", "0.5,1,1")
    from alicevision_tpu.image.io import read_image

    m = read_image(out)
    assert m[:8].mean() > 0.9 and m[8:].mean() < 0.1


# ---------------------------------------------------------------------------
# rig tools
# ---------------------------------------------------------------------------


def _rig_scenes(tmp_path, n_frames=5):
    """Two cameras with a fixed relative pose moving along a trajectory."""
    rng = np.random.default_rng(0)
    R_rel = np.array([[0.9689124, -0.2474040, 0.0],
                      [0.2474040, 0.9689124, 0.0],
                      [0.0, 0.0, 1.0]])  # yaw 14.3 deg
    c_rel = np.array([0.5, 0.0, 0.0])
    scenes = []
    poses0 = []
    for k in range(2):
        sc = sfmdata.SfMData.empty()
        ii = sc.add_intrinsic(0, 640, 480, 500.0)
        scenes.append(sc)
    for f in range(n_frames):
        th = 0.3 * f
        R0 = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        c0 = np.array([f * 1.0, 0.2 * f, 0.0])
        poses0.append((R0, c0))
        R1 = R_rel @ R0
        c1 = c0 + R0.T @ c_rel
        v0 = scenes[0].add_view(100 + f, 0, 640, 480, frame_id=f)
        scenes[0].set_pose(v0, R0, c0)
        v1 = scenes[1].add_view(200 + f, 0, 640, 480, frame_id=f)
        scenes[1].set_pose(v1, R1, c1)
    paths = []
    for k, sc in enumerate(scenes):
        p = str(tmp_path / f"rig_cam{k}.sfm")
        sfmdata.save(sc, p)
        paths.append(p)
    return paths, R_rel, c_rel, poses0


def test_rig_calibration_and_transform(tmp_path):
    paths, R_rel, c_rel, poses0 = _rig_scenes(tmp_path)
    rig_f = str(tmp_path / "rig.json")
    _run("rigCalibration", "--inputs", ",".join(paths), "--output", rig_f)
    rig = json.load(open(rig_f))
    got_R = np.asarray(rig["subposes"][1]["R"])
    got_c = np.asarray(rig["subposes"][1]["c"])
    assert np.allclose(got_R, R_rel, atol=1e-5)
    assert np.allclose(got_c, c_rel, atol=1e-5)

    # rigTransform: regenerate camera-1 poses from camera-0 trajectory
    out = str(tmp_path / "cam1_regen.sfm")
    _run("rigTransform", "--input", paths[0], "--rig", rig_f,
         "--camera", "1", "--output", out)
    got = sfmdata.load(out)
    ref = sfmdata.load(paths[1])
    for v in range(got.n_views):
        assert np.allclose(got.pose_R[got.view_pose[v]],
                           ref.pose_R[ref.view_pose[v]], atol=1e-5)
        assert np.allclose(got.pose_c[got.view_pose[v]],
                           ref.pose_c[ref.view_pose[v]], atol=1e-5)


def test_sfm_to_rig(tmp_path):
    paths, R_rel, c_rel, _ = _rig_scenes(tmp_path, n_frames=1)
    # one scene holding both cameras at frame 0
    a = sfmdata.load(paths[0])
    b = sfmdata.load(paths[1])
    v = a.add_view(201, 0, 640, 480)
    a.set_pose(v, b.pose_R[0], b.pose_c[0])
    merged = str(tmp_path / "instant.sfm")
    sfmdata.save(a, merged)
    rig_f = str(tmp_path / "rig2.json")
    _run("sfmToRig", "--input", merged, "--output", rig_f)
    rig = json.load(open(rig_f))
    assert np.allclose(np.asarray(rig["subposes"][0]["R"]), np.eye(3))
    assert np.allclose(np.asarray(rig["subposes"][1]["R"]), R_rel, atol=1e-9)


# ---------------------------------------------------------------------------
# panorama stages
# ---------------------------------------------------------------------------


def test_panorama_seams_merge_post(tmp_path):
    H, W = 32, 64
    d = str(tmp_path / "warped")
    os.makedirs(d)
    # two half-overlapping warped views with different constant intensity
    m0 = np.zeros((H, W), bool)
    m0[:, :40] = True
    m1 = np.zeros((H, W), bool)
    m1[:, 24:] = True
    np.save(os.path.join(d, "0_warp.npy"), np.where(m0, 0.4, 0).astype(np.float32))
    np.save(os.path.join(d, "0_mask.npy"), m0)
    np.save(os.path.join(d, "1_warp.npy"), np.where(m1, 0.6, 0).astype(np.float32))
    np.save(os.path.join(d, "1_mask.npy"), m1)
    seams_f = str(tmp_path / "labels.npz")
    _run("panoramaSeams", "--input", d, "--output", seams_f)
    with np.load(seams_f) as z:
        labels = z["labels"]
    assert labels.shape == (H, W)
    assert (labels[:, :10] == 0).all() and (labels[:, -10:] == 1).all()

    pano_f = str(tmp_path / "pano.png")
    _run("panoramaMerging", "--input", d, "--seams", seams_f,
         "--output", pano_f, "--levels", "3")
    from alicevision_tpu.image.io import read_image

    pano = read_image(pano_f)
    assert abs(float(pano[:, :10].mean()) - 0.4) < 0.05
    assert abs(float(pano[:, -10:].mean()) - 0.6) < 0.05

    post_f = str(tmp_path / "post.png")
    _run("panoramaPostProcessing", "--input", pano_f, "--output", post_f,
         "--fillHoles", "--crop")
    assert os.path.exists(post_f)


def test_panorama_init(tmp_path):
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    for k in range(4):
        np.save(os.path.join(d, f"im_{k}.npy"),
                np.zeros((24, 32), np.float32))
    out = str(tmp_path / "pano.sfm")
    _run("panoramaInit", "--imageFolder", d, "--output", out,
         "--defaultFocalPx", "30")
    sc = sfmdata.load(out)
    assert len(sc.valid_views()) == 4
    # yaw-spaced: rotation between consecutive views is 90 deg
    R0 = sc.pose_R[sc.view_pose[0]]
    R1 = sc.pose_R[sc.view_pose[1]]
    ang = np.degrees(np.arccos(np.clip((np.trace(R1 @ R0.T) - 1) / 2, -1, 1)))
    assert abs(ang - 90.0) < 1e-6


# ---------------------------------------------------------------------------
# exporters
# ---------------------------------------------------------------------------


def test_export_mvstex_matlab_maya(tmp_path):
    scene_f = str(tmp_path / "s.sfm")
    _run("generateSampleScene", "--output", scene_f, "--nbViews", "3",
         "--nbPoints", "10")
    d1 = str(tmp_path / "mvstex")
    _run("exportMVSTexturing", "--input", scene_f, "--output", d1)
    cams = [f for f in os.listdir(d1) if f.endswith(".cam")]
    assert len(cams) == 3
    lines = open(os.path.join(d1, cams[0])).read().strip().splitlines()
    assert len(lines) == 2 and len(lines[0].split()) == 12

    d2 = str(tmp_path / "matlab")
    _run("exportMatlab", "--input", scene_f, "--output", d2)
    assert len([f for f in os.listdir(d2) if f.endswith("_K.txt")]) == 3

    d3 = str(tmp_path / "maya")
    _run("exportMeshroomMaya", "--input", scene_f, "--output", d3)
    assert os.path.exists(os.path.join(d3, "pointCloud.ply"))
    assert len(json.load(open(os.path.join(d3, "cameras.json")))) == 3
