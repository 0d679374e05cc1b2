"""Full pipeline integration test: rendered images -> CLI stages -> poses +
dense point cloud. This covers the complete stage chain of SURVEY.md §3.6
on real (synthetic-rendered) images, end to end."""

import os

import numpy as np
import pytest

from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.render import make_test_dataset
from alicevision_tpu import sfmdata


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    K, R_gt, c_gt = make_test_dataset(str(d), n_views=5, wh=(480, 360), focal=400.0)
    return str(d), K, R_gt, c_gt


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    return str(tmp_path_factory.mktemp("work"))


def test_full_pipeline(dataset, work):
    img_dir, K, R_gt, c_gt = dataset
    scene = os.path.join(work, "cameraInit.sfm")
    stages.camera_init(img_dir, scene, default_focal_px=400.0)
    sc = sfmdata.load(scene)
    assert sc.n_views == 5

    feats = os.path.join(work, "features")
    stages.feature_extraction(scene, feats, max_keypoints=2048, downscale_to=0)
    f0 = stages.load_features(feats, int(sc.view_ids[0]))
    assert f0["valid"].sum() > 300

    pairs_f = os.path.join(work, "pairs.txt")
    pairs = stages.image_matching(scene, feats, pairs_f, method="exhaustive")
    assert len(pairs) == 10

    matches_f = os.path.join(work, "matches.npz")
    stages.feature_matching(scene, feats, pairs_f, matches_f)
    m = stages.load_matches(matches_f)
    total = sum(len(v) for v in m.values())
    assert total > 500, total

    sfm_out = os.path.join(work, "sfm.sfm")
    out = stages.incremental_sfm(scene, feats, matches_f, sfm_out)
    assert out.n_poses >= 4, out.n_poses
    assert out.n_landmarks > 100

    # similarity-align centers to GT and check ATE
    posed_ids = [int(v) for v in out.pose_ids]
    id2idx = {int(vid): i for i, vid in enumerate(out.view_ids)}
    est = out.pose_c
    gt = np.stack([c_gt[id2idx[pid] if pid in id2idx else 0] for pid in posed_ids])
    # note: view ids are 1-based order of files = render order
    gt = np.stack([c_gt[pid - 1] for pid in posed_ids])
    mu_a, mu_b = est.mean(0), gt.mean(0)
    Hm = (gt - mu_b).T @ (est - mu_a) / len(est)
    U, S, Vt = np.linalg.svd(Hm)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / ((est - mu_a) ** 2).sum() * len(est)
    ate = np.sqrt(np.mean(np.sum((est @ (s * R).T + mu_b - s * R @ mu_a - gt) ** 2, 1)))
    assert ate < 0.1, ate  # scene scale ~5


def test_mvs_stages(dataset, work):
    """Depth estimation + filtering + fusion on the SfM output."""
    sfm_out = os.path.join(work, "sfm.sfm")
    if not os.path.exists(sfm_out):
        pytest.skip("sfm stage did not run")
    dense = os.path.join(work, "dense")
    stages.prepare_dense_scene(sfm_out, dense)
    assert len(os.listdir(dense)) >= 4

    depth = os.path.join(work, "depth")
    stages.depth_map_estimation(sfm_out, dense, depth, n_depths=64, downscale=2)
    dfiles = [f for f in os.listdir(depth) if f.endswith("_depth.npy")]
    assert len(dfiles) >= 4
    d0 = np.load(os.path.join(depth, dfiles[0]))
    assert (d0 > 0).mean() > 0.5

    depthf = os.path.join(work, "depth_filtered")
    stages.depth_map_filtering(sfm_out, depth, depthf, min_consistent=2)

    cloud = os.path.join(work, "cloud.ply")
    pts = stages.meshing_point_cloud(sfm_out, depthf, cloud, voxel_size=0.0)
    assert len(pts) > 5000
    assert os.path.exists(cloud)


def test_depth_stage_with_refine(dataset, work):
    """depth_map_estimation --refine drives the rectified-refine auto path
    (refine_plan + refine_depth_map_auto + color opt) at stage level."""
    sfm_out = os.path.join(work, "sfm.sfm")
    dense = os.path.join(work, "dense")
    if not (os.path.exists(sfm_out) and os.path.isdir(dense)):
        pytest.skip("sfm/dense stages did not run")
    depth_r = os.path.join(work, "depth_refined")
    stages.depth_map_estimation(
        sfm_out, dense, depth_r, n_depths=48, downscale=2,
        range_start=0, range_size=1, refine=True, color_opt_iters=5,
    )
    dfiles = [f for f in os.listdir(depth_r) if f.endswith("_depth.npy")]
    assert len(dfiles) == 1
    d = np.load(os.path.join(depth_r, dfiles[0]))
    assert (d > 0).mean() > 0.4
    # refined depths stay inside the seeded hypothesis range (sanity)
    pos = d[d > 0]
    assert pos.min() > 0.05 and pos.max() < 1e3


def test_colored_point_cloud_export(dataset, work, tmp_path):
    """exportColoredPointCloud samples real observation pixels
    (colorizeTracks semantics) — landmarks must NOT be the all-white
    default in the exported PLY."""
    sfm_out = os.path.join(work, "sfm.sfm")
    dense = os.path.join(work, "dense")
    if not (os.path.exists(sfm_out) and os.path.isdir(dense)):
        pytest.skip("sfm/dense stages did not run")
    sc = sfmdata.load(sfm_out)
    cols = sfmdata.colorize_tracks(sc, sfmdata.npy_folder_loader(sc, dense))
    obs_lms = np.unique(sc.obs_landmark)
    assert len(obs_lms) > 50
    sampled = cols[obs_lms]
    assert not np.all(sampled == 255)  # real pixels, not the default
    assert sampled.std() > 5.0  # textured scene -> varied colors
    ply = str(tmp_path / "colored.ply")
    sfmdata.save_ply(sc, ply)
    txt = open(ply).read()
    assert "property uchar red" in txt

    # the CLI subcommand drives the same path
    from alicevision_tpu.pipeline.cli import main

    ply2 = str(tmp_path / "colored_cli.ply")
    rc = main([
        "exportColoredPointCloud", "--input", sfm_out,
        "--imagesFolder", dense, "--output", ply2,
    ])
    assert rc == 0 and os.path.exists(ply2)


def test_cli_entry(dataset, tmp_path):
    """The argparse CLI wires to the same stages."""
    from alicevision_tpu.pipeline.cli import main

    img_dir, *_ = dataset
    out = str(tmp_path / "scene.sfm")
    rc = main(["cameraInit", "--imageFolder", img_dir, "--output", out,
               "--defaultFocalPx", "400"])
    assert rc == 0
    assert os.path.exists(out)


def test_surface_and_texturing(dataset, work):
    """Extend the chain through graph-cut surface + LSCM/multiband texture
    atlas (SURVEY.md §3.6 meshing -> texturing; ref main_meshing.cpp:400-457,
    mesh/Texturing.hpp:153)."""
    sfm_out = os.path.join(work, "sfm.sfm")
    depthf = os.path.join(work, "depth_filtered")
    dense = os.path.join(work, "dense")
    if not (os.path.exists(sfm_out) and os.path.exists(depthf)):
        pytest.skip("upstream stages did not run")

    from alicevision_tpu.pipeline import stages as st
    from alicevision_tpu.mesh import load_obj
    from alicevision_tpu.mesh.uv_atlas import generate_textured_mesh

    mesh_obj = os.path.join(work, "mesh.obj")
    V, F = st.meshing_surface(
        sfm_out, depthf, mesh_obj, downscale=2, max_points=20000,
        smooth_iters=2,
    )
    assert len(F) > 500, len(F)
    assert len(V) > 300, len(V)
    # surface should be mostly manifold: every face references valid verts
    assert np.all(F >= 0) and np.all(F < len(V))

    sc = sfmdata.load(sfm_out)
    imgs, Ks, Rs, cs = [], [], [], []
    for v in sc.valid_views():
        p = os.path.join(dense, f"{int(sc.view_ids[v])}.npy")
        if not os.path.exists(p):
            continue
        imgs.append(np.load(p))
        ii = int(sc.view_intrinsic[v])
        fx, fy = sc.scale[ii]
        pp = sc.offset[ii] + 0.5 * sc.sizes[ii]
        Ks.append(np.array([[fx, 0, pp[0]], [0, fy, pp[1]], [0, 0, 1.0]]))
        pz = int(sc.view_pose[v])
        Rs.append(sc.pose_R[pz])
        cs.append(sc.pose_c[pz])
    assert len(imgs) >= 4

    tex_obj = os.path.join(work, "textured.obj")
    generate_textured_mesh(
        V, F, imgs, np.stack(Ks), np.stack(Rs), np.stack(cs), tex_obj,
        atlas_size=512, multiband=True, top_k=3, levels=3,
    )
    assert os.path.exists(tex_obj)
    atlas_png = tex_obj.replace(".obj", "_atlas.png")
    assert os.path.exists(atlas_png)
    from alicevision_tpu.image.io import read_image
    atlas = read_image(atlas_png, grayscale=True)
    fill = float((np.asarray(atlas) > 0).mean())
    assert fill > 0.05, fill  # texture fill rate over the atlas
    # textured OBJ must reference the mesh with UVs
    txt = open(tex_obj).read()
    assert "vt " in txt and "usemtl" in txt
