"""Reconstruction statistics + HTML report.

TPU-native counterpart of the reference's reporting
(ref: src/aliceVision/sfm/sfmStatistics.cpp — residual/track-length/
observation histograms; sfm/generateReport.cpp + dependencies/htmlDoc —
the HTML summary written by the incremental pipeline). All statistics are
batched reductions over the flat observation SoA.
"""

from __future__ import annotations

import os

import numpy as np

from ..sfmdata import INVALID, SfMData


def reprojection_residuals(scene: SfMData) -> np.ndarray:
    """Per-observation reprojection error in pixels (full camera model)."""
    import jax
    import jax.numpy as jnp

    from .. import camera as cam
    from ..geometry.rotations import mat_to_quat, quat_rotate

    posed = scene.view_pose[scene.obs_view] != INVALID
    ov = scene.obs_view[posed]
    ol = scene.obs_landmark[posed]
    R = jnp.asarray(scene.pose_R[scene.view_pose[ov]], jnp.float32)
    c = jnp.asarray(scene.pose_c[scene.view_pose[ov]], jnp.float32)
    X = jnp.asarray(scene.points[ol], jnp.float32)
    q = mat_to_quat(R)
    x_cam = quat_rotate(q, X - c)
    intr = scene.intrinsics_table()
    rows = jax.tree_util.tree_map(lambda a: a[scene.view_intrinsic[ov]], intr)
    pix = cam.project_cam(rows, x_cam)
    err = jnp.linalg.norm(pix - jnp.asarray(scene.obs_uv[posed], jnp.float32), axis=-1)
    return np.asarray(err)


def scene_statistics(scene: SfMData) -> dict:
    res = reprojection_residuals(scene) if scene.n_observations else np.zeros(0)
    track_len = (
        np.bincount(scene.obs_landmark, minlength=scene.n_landmarks)
        if scene.n_landmarks
        else np.zeros(0)
    )
    obs_per_view = (
        np.bincount(scene.obs_view, minlength=scene.n_views)
        if scene.n_observations
        else np.zeros(scene.n_views)
    )
    stats = {
        "n_views": scene.n_views,
        "n_posed": int((scene.view_pose != INVALID).sum()),
        "n_intrinsics": scene.n_intrinsics,
        "n_landmarks": scene.n_landmarks,
        "n_observations": scene.n_observations,
        "residuals_px": {
            "mean": float(res.mean()) if len(res) else 0.0,
            "median": float(np.median(res)) if len(res) else 0.0,
            "p95": float(np.percentile(res, 95)) if len(res) else 0.0,
            "max": float(res.max()) if len(res) else 0.0,
        },
        "track_length": {
            "mean": float(track_len.mean()) if len(track_len) else 0.0,
            "max": int(track_len.max()) if len(track_len) else 0,
        },
        "observations_per_view": {
            "mean": float(obs_per_view.mean()),
            "min": int(obs_per_view.min()) if len(obs_per_view) else 0,
        },
    }
    return stats


def _histogram_svg(values, bins=30, width=420, height=120, color="#4a7"):
    """Tiny inline SVG histogram (the htmlDoc/vectorGraphics analog)."""
    if len(values) == 0:
        return "<svg/>"
    hist, edges = np.histogram(values, bins=bins)
    m = hist.max() or 1
    bw = width / bins
    bars = []
    for k, h in enumerate(hist):
        bh = height * h / m
        bars.append(
            f'<rect x="{k * bw:.1f}" y="{height - bh:.1f}" width="{bw - 1:.1f}" '
            f'height="{bh:.1f}" fill="{color}"/>'
        )
    return (
        f'<svg width="{width}" height="{height + 18}" xmlns="http://www.w3.org/2000/svg">'
        + "".join(bars)
        + f'<text x="2" y="{height + 14}" font-size="11">'
        f"[{edges[0]:.2f} .. {edges[-1]:.2f}]</text></svg>"
    )


def generate_html_report(scene: SfMData, path: str, title: str = "SfM report") -> dict:
    """Write the reconstruction summary HTML (generateReport.cpp analog)."""
    stats = scene_statistics(scene)
    res = reprojection_residuals(scene) if scene.n_observations else np.zeros(0)
    track_len = (
        np.bincount(scene.obs_landmark, minlength=scene.n_landmarks)
        if scene.n_landmarks
        else np.zeros(0)
    )

    rows = "".join(
        f"<tr><td>{k}</td><td>{v}</td></tr>"
        for k, v in [
            ("views", stats["n_views"]),
            ("posed views", stats["n_posed"]),
            ("intrinsics", stats["n_intrinsics"]),
            ("landmarks", stats["n_landmarks"]),
            ("observations", stats["n_observations"]),
            ("mean residual (px)", f"{stats['residuals_px']['mean']:.3f}"),
            ("median residual (px)", f"{stats['residuals_px']['median']:.3f}"),
            ("p95 residual (px)", f"{stats['residuals_px']['p95']:.3f}"),
            ("mean track length", f"{stats['track_length']['mean']:.2f}"),
        ]
    )
    html = f"""<!doctype html><html><head><meta charset="utf-8">
<title>{title}</title>
<style>body{{font-family:sans-serif;margin:2em}}td{{padding:2px 12px}}</style>
</head><body>
<h1>{title}</h1>
<table border="0">{rows}</table>
<h2>Reprojection residuals (px)</h2>{_histogram_svg(res)}
<h2>Track lengths</h2>{_histogram_svg(track_len, color="#47a")}
</body></html>"""
    with open(path, "w") as f:
        f.write(html)
    return stats
