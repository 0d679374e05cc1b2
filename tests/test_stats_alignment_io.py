import os

import numpy as np
import pytest

from alicevision_tpu.features import io as fio
from alicevision_tpu.sfm import alignment as al
from alicevision_tpu.sfm import statistics as st


def _scene():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_sfmdata import _build_scene

    return _build_scene()


def _consistent_scene():
    """Scene whose registered intrinsics match the generating projection
    (the shared _build_scene fixture registers distortion it didn't apply)."""
    import jax
    from alicevision_tpu import sfmdata
    from alicevision_tpu.utils.synthetic import ring_scene

    syn = ring_scene(n_views=6, n_points=40)
    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1000, 1920, 1080, 1200.0)
    for v in range(6):
        vi = sc.add_view(100 + v, ii, 1920, 1080)
        sc.set_pose(vi, np.asarray(syn.poses.R[v], np.float64),
                    np.asarray(syn.poses.c[v], np.float64))
    vis = np.asarray(syn.visible)
    obs_np = np.asarray(syn.observations)
    o_lm, o_view, o_uv = [], [], []
    for v in range(6):
        for l in np.nonzero(vis[v])[0]:
            o_lm.append(l); o_view.append(v); o_uv.append(obs_np[v, l])
    sc.set_structure(np.asarray(syn.points, np.float64), np.array(o_lm),
                     np.array(o_view), np.array(o_uv))
    return sc


def test_scene_statistics_and_report(tmp_path):
    sc = _consistent_scene()
    stats = st.scene_statistics(sc)
    assert stats["n_posed"] == 6
    assert stats["n_landmarks"] == 40
    # observations are exact projections -> tiny residuals
    assert stats["residuals_px"]["median"] < 0.1

    p = str(tmp_path / "report.html")
    st.generate_html_report(sc, p)
    html = open(p).read()
    assert "<svg" in html and "landmarks" in html


def test_transform_scene_preserves_residuals():
    sc = _consistent_scene()
    r0 = st.scene_statistics(sc)["residuals_px"]["median"]
    from alicevision_tpu import geometry as geo
    import jax.numpy as jnp

    R = np.asarray(geo.so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    al.transform_scene(sc, 2.5, R, np.array([1.0, -2.0, 0.5]))
    r1 = st.scene_statistics(sc)["residuals_px"]["median"]
    assert abs(r1 - r0) < 0.05  # similarity transforms leave reprojection invariant


def test_align_to_scene_and_ate():
    a = _scene()
    b = _scene()
    from alicevision_tpu import geometry as geo
    import jax.numpy as jnp

    R = np.asarray(geo.so3_exp(jnp.asarray([0.1, 0.4, -0.2])))
    al.transform_scene(a, 0.7, R, np.array([3.0, 1.0, -2.0]))
    assert al.ate_rmse(a, b, align=False) > 1.0
    s, Rb, t = al.align_to_scene(a, b)
    assert al.ate_rmse(a, b, align=False) < 1e-6
    assert abs(s * 0.7 - 1.0) < 1e-6


def test_auto_center_scale():
    sc = _scene()
    al.auto_center_scale(sc, target_extent=1.0)
    c = sc.pose_c
    assert np.linalg.norm(c.mean(0)) < 1e-9
    assert abs(np.linalg.norm(c, axis=-1).max() - 1.0) < 1e-9


def test_feat_desc_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    feats = {
        "xy": rng.rand(50, 2) * 100,
        "scale": rng.rand(50) * 3,
        "orientation": rng.rand(50) * 6 - 3,
        "desc": rng.rand(50, 128).astype(np.float32) * 0.4,
        "valid": np.concatenate([np.ones(40, bool), np.zeros(10, bool)]),
    }
    fio.save_view_features(str(tmp_path), 42, feats)
    assert os.path.exists(tmp_path / "42.sift.feat")
    assert os.path.exists(tmp_path / "42.sift.desc")
    back = fio.load_view_features(str(tmp_path), 42)
    assert len(back["xy"]) == 40
    np.testing.assert_allclose(back["xy"], feats["xy"][:40], rtol=1e-6)
    np.testing.assert_allclose(back["desc"], feats["desc"][:40], atol=1.0 / 512)


def test_matches_txt_roundtrip(tmp_path):
    pm = {
        (0, 1): np.array([[0, 3], [2, 5]]),
        (1, 4): np.array([[7, 7]]),
    }
    p = str(tmp_path / "matches.txt")
    fio.save_matches_txt(p, pm)
    back = fio.load_matches_txt(p)
    assert set(back) == set(pm)
    for k in pm:
        np.testing.assert_array_equal(back[k], pm[k])


def test_constraints2d_rotation_priors_roundtrip_and_refine(tmp_path):
    """Constraints2D + rotation priors: SfMData round-trip through .sfm and
    GN refinement of global rotations against them
    (ref: sfmData/SfMData.hpp:60-68, Constraint2D.hpp, RotationPrior.hpp)."""
    import numpy as np
    import jax.numpy as jnp
    from alicevision_tpu import sfmdata
    from alicevision_tpu import geometry as geo
    from alicevision_tpu.sfm.rotation_sfm import refine_rotations_with_constraints

    rng = np.random.default_rng(0)
    V = 4
    # GT rotations: small random attitude per view
    ws = rng.normal(0, 0.3, (V, 3)).astype(np.float32)
    R_gt = np.asarray(geo.so3_exp(jnp.asarray(ws)))

    sc = sfmdata.SfMData.empty()
    sc.add_intrinsic(1000, 640, 480, 400.0)
    for v in range(V):
        sc.add_view(v + 1, 0, 640, 480)
    # priors between consecutive views, exact
    for v in range(V - 1):
        sc.rotation_priors.append({
            "view_i": v, "view_j": v + 1,
            "R_j_i": R_gt[v + 1] @ R_gt[v].T,
        })
    # constraints: random directions seen by consecutive pairs
    for _ in range(30):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        for v in range(V - 1):
            bi = R_gt[v] @ d
            bj = R_gt[v + 1] @ d
            if bi[2] < 0.3 or bj[2] < 0.3:
                continue
            sc.constraints2d.append({
                "view_i": v, "uv_i": 400.0 * bi[:2] / bi[2] + [320, 240],
                "view_j": v + 1, "uv_j": 400.0 * bj[:2] / bj[2] + [320, 240],
            })

    p = tmp_path / "c.sfm"
    sfmdata.save(sc, str(p))
    sc2 = sfmdata.load(str(p))
    assert len(sc2.rotation_priors) == V - 1
    assert len(sc2.constraints2d) == len(sc.constraints2d)
    np.testing.assert_allclose(
        sc2.rotation_priors[0]["R_j_i"], sc.rotation_priors[0]["R_j_i"], atol=1e-9
    )

    # perturb rotations, refine against the loaded constraints
    dw = rng.normal(0, 0.03, (V, 3)).astype(np.float32)
    dw[0] = 0
    R_pert = np.asarray(geo.so3_exp(jnp.asarray(dw))) @ R_gt
    intr = sc2.intrinsics_table()
    R_ref = refine_rotations_with_constraints(
        R_pert, sc2.rotation_priors, sc2.constraints2d,
        intr=intr, view_intrinsic=sc2.view_intrinsic,
    )
    # gauge: view 0 fixed at its perturbed value == GT (dw[0]=0)
    for v in range(V):
        ang = np.degrees(np.linalg.norm(np.asarray(
            geo.so3_log(jnp.asarray((R_ref[v] @ R_gt[v].T)[None], jnp.float32)))[0]))
        assert ang < 0.15, (v, ang)
