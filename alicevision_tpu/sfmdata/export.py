"""Scene exporters: COLMAP text model, Meshlab/MVE-style bundles.

Counterpart of the reference's exporters
(ref: src/aliceVision/sfmDataIO/colmap.cpp — cameras.txt/images.txt/
points3D.txt; src/software/export/main_exportColmap.cpp,
main_exportMeshlab.cpp). Text formats follow the public COLMAP spec.
"""

from __future__ import annotations

import os

import numpy as np

from .. import camera as cam
from ..geometry.rotations import mat_to_quat
from .scene import INVALID, SfMData


def export_colmap(scene: SfMData, out_dir: str) -> None:
    """Write cameras.txt / images.txt / points3D.txt."""
    os.makedirs(out_dir, exist_ok=True)

    # cameras.txt — map our models onto COLMAP camera models
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for i in range(scene.n_intrinsics):
            w, h = int(scene.sizes[i, 0]), int(scene.sizes[i, 1])
            fx, fy = scene.scale[i]
            cx, cy = scene.offset[i] + 0.5 * scene.sizes[i]
            dk = int(scene.disto_kind[i])
            cid = int(scene.intrinsic_ids[i])
            if dk == cam.DISTO_NONE:
                f.write(f"{cid} PINHOLE {w} {h} {fx} {fy} {cx} {cy}\n")
            elif dk == cam.DISTO_RADIALK1:
                f.write(
                    f"{cid} SIMPLE_RADIAL {w} {h} {(fx+fy)/2} {cx} {cy} "
                    f"{scene.disto[i,0]}\n"
                )
            elif dk == cam.DISTO_BROWN:
                k1, k2, k3, t1, t2 = scene.disto[i, :5]
                f.write(
                    f"{cid} FULL_OPENCV {w} {h} {fx} {fy} {cx} {cy} "
                    f"{k1} {k2} {t1} {t2} {k3} 0 0 0\n"
                )
            else:  # RADIALK3 and the rest -> OPENCV (k1 k2 p1 p2)
                k1, k2 = scene.disto[i, 0], scene.disto[i, 1]
                f.write(
                    f"{cid} OPENCV {w} {h} {fx} {fy} {cx} {cy} {k1} {k2} 0 0\n"
                )

    # group observations by landmark then by view for the two files below
    obs_by_view: dict[int, list] = {v: [] for v in range(scene.n_views)}
    for o in range(scene.n_observations):
        obs_by_view[int(scene.obs_view[o])].append(o)

    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        f.write("# Image list: IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        for v in range(scene.n_views):
            if scene.view_pose[v] == INVALID:
                continue
            p = int(scene.view_pose[v])
            R = scene.pose_R[p]
            c = scene.pose_c[p]
            t = -R @ c
            import jax.numpy as jnp

            q = np.asarray(mat_to_quat(jnp.asarray(R)))
            vid = int(scene.view_ids[v])
            cid = int(scene.intrinsic_ids[scene.view_intrinsic[v]])
            name = os.path.basename(scene.view_paths[v]) or f"view_{vid}.jpg"
            f.write(
                f"{vid} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} {cid} {name}\n"
            )
            pts2d = []
            for o in obs_by_view[v]:
                u, w_ = scene.obs_uv[o]
                lid = int(scene.landmark_ids[scene.obs_landmark[o]])
                pts2d.append(f"{u} {w_} {lid}")
            f.write(" ".join(pts2d) + "\n")

    with open(os.path.join(out_dir, "points3D.txt"), "w") as f:
        f.write("# 3D point list: POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[]\n")
        order = np.argsort(scene.obs_landmark, kind="stable")
        bounds = np.searchsorted(
            scene.obs_landmark[order], np.arange(scene.n_landmarks + 1)
        )
        for l in range(scene.n_landmarks):
            X = scene.points[l]
            c = scene.colors[l]
            track = []
            for o in order[bounds[l] : bounds[l + 1]]:
                track.append(f"{int(scene.view_ids[scene.obs_view[o]])} {int(scene.obs_feature[o])}")
            f.write(
                f"{int(scene.landmark_ids[l])} {X[0]} {X[1]} {X[2]} "
                f"{c[0]} {c[1]} {c[2]} 0.5 " + " ".join(track) + "\n"
            )


def export_meshlab(scene: SfMData, out_dir: str, mesh_path: str | None = None) -> None:
    """Write a MeshLab project (.mlp) with raster cameras
    (ref: src/software/export/main_exportMeshlab.cpp)."""
    os.makedirs(out_dir, exist_ok=True)
    lines = ['<!DOCTYPE MeshLabDocument>', "<MeshLabProject>"]
    lines.append(" <MeshGroup>")
    if mesh_path:
        lines.append(f'  <MLMesh filename="{mesh_path}" label="mesh"/>')
    lines.append(" </MeshGroup>")
    lines.append(" <RasterGroup>")
    for v in range(scene.n_views):
        p = scene.view_pose[v]
        if p == INVALID:
            continue
        ii = scene.view_intrinsic[v]
        fx = scene.scale[ii, 0]
        w, h = int(scene.view_sizes[v, 0]), int(scene.view_sizes[v, 1])
        R = scene.pose_R[p]
        c = scene.pose_c[p]
        t = -R @ c
        rot = " ".join(
            str(x)
            for x in np.block(
                [[R, t[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]
            ).ravel()
        )
        name = os.path.basename(scene.view_paths[v]) or f"view_{int(scene.view_ids[v])}"
        lines.append("  <MLRaster label=\"%s\">" % name)
        lines.append(
            f'   <VCGCamera TranslationVector="{t[0]} {t[1]} {t[2]} 1" '
            f'LensDistortion="0 0" ViewportPx="{w} {h}" '
            f'PixelSizeMm="1 1" FocalMm="{fx}" '
            f'RotationMatrix="{rot}"/>'
        )
        lines.append(f'   <Plane semantic="1" fileName="{scene.view_paths[v]}"/>')
        lines.append("  </MLRaster>")
    lines.append(" </RasterGroup>")
    lines.append("</MeshLabProject>")
    with open(os.path.join(out_dir, "project.mlp"), "w") as f:
        f.write("\n".join(lines))


def export_animated_camera(scene: SfMData, path: str, fps: float = 24.0) -> None:
    """Per-frame camera track as JSON (the Alembic-free analog of
    main_exportAnimatedCamera; frames ordered by view frame id)."""
    import json as _json

    frames = []
    order = np.argsort(scene.view_frames)
    for v in order:
        p = scene.view_pose[v]
        if p == INVALID:
            continue
        ii = scene.view_intrinsic[v]
        frames.append(
            {
                "frame": int(scene.view_frames[v]),
                "viewId": int(scene.view_ids[v]),
                "rotation": scene.pose_R[p].tolist(),
                "center": scene.pose_c[p].tolist(),
                "focal_px": float(scene.scale[ii, 0]),
                "principal_point": (
                    scene.offset[ii] + 0.5 * scene.sizes[ii]
                ).tolist(),
            }
        )
    with open(path, "w") as f:
        _json.dump({"fps": fps, "frames": frames}, f, indent=1)


def import_known_poses(scene: SfMData, poses_path: str) -> int:
    """Apply externally-known poses to a scene
    (ref: src/software/convert/main_importKnownPoses.cpp). The JSON format
    is the export_animated_camera schema or a {viewId: {rotation, center}}
    map. Returns the number of poses applied."""
    import json as _json

    with open(poses_path) as f:
        data = _json.load(f)
    if "frames" in data:
        entries = {int(fr["viewId"]): fr for fr in data["frames"]}
    else:
        entries = {int(k): v for k, v in data.items()}
    id2idx = {int(vid): i for i, vid in enumerate(scene.view_ids)}
    n = 0
    for vid, e in entries.items():
        if vid in id2idx:
            scene.set_pose(
                id2idx[vid], np.asarray(e["rotation"], float), np.asarray(e["center"], float)
            )
            n += 1
    return n


def import_colmap(model_dir: str) -> SfMData:
    """Read a COLMAP text model back into an SfMData scene."""
    sc = SfMData.empty()
    id2idx_intr = {}
    with open(os.path.join(model_dir, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p = line.split()
            cid, model, w, h = int(p[0]), p[1], int(p[2]), int(p[3])
            params = [float(x) for x in p[4:]]
            if model == "PINHOLE":
                fx, fy, cx, cy = params
                dk, dp = cam.DISTO_NONE, ()
            elif model == "SIMPLE_RADIAL":
                fx = fy = params[0]
                cx, cy = params[1:3]
                dk, dp = cam.DISTO_RADIALK1, (params[3],)
            elif model == "OPENCV":
                fx, fy, cx, cy, k1, k2 = params[:6]
                dk, dp = cam.DISTO_RADIALK3, (k1, k2, 0.0)
            elif model == "FULL_OPENCV":
                fx, fy, cx, cy, k1, k2, t1, t2, k3 = params[:9]
                dk, dp = cam.DISTO_BROWN, (k1, k2, k3, t1, t2)
            else:
                fx = fy = params[0]
                cx, cy = params[1:3]
                dk, dp = cam.DISTO_NONE, ()
            idx = sc.add_intrinsic(
                cid, w, h, fx, disto_kind=dk, disto_params=dp,
                offset=(cx - w / 2, cy - h / 2), focal_y_px=fy,
            )
            id2idx_intr[cid] = idx

    import jax.numpy as jnp

    from ..geometry.rotations import quat_to_mat

    with open(os.path.join(model_dir, "images.txt")) as f:
        lines = [l for l in f if not l.startswith("#")]
    for k in range(0, len(lines) - 1, 2):
        p = lines[k].split()
        if len(p) < 10:
            continue
        vid = int(p[0])
        q = np.array([float(x) for x in p[1:5]])
        t = np.array([float(x) for x in p[5:8]])
        cid = int(p[8])
        name = p[9]
        ii = id2idx_intr[cid]
        w, h = int(sc.sizes[ii, 0]), int(sc.sizes[ii, 1])
        vi = sc.add_view(vid, ii, w, h, path=name)
        R = np.asarray(quat_to_mat(jnp.asarray(q / np.linalg.norm(q))))
        sc.set_pose(vi, R, -R.T @ t)
    return sc
