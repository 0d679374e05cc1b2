"""LSCM conformal unwrap tests (mesh/lscm.py) — the reference unwraps
charts with Geogram's LSCM (mesh/Texturing.cpp:61-74)."""

import numpy as np
import pytest

from alicevision_tpu.mesh.lscm import conformal_error, lscm_unwrap


def _cap_mesh(n=15, curvature=0.35):
    """Triangulated spherical-cap height field z = curvature*(x^2+y^2)."""
    xs = np.linspace(-1, 1, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = curvature * (X**2 + Y**2)
    V = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    F = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            F.append([a, a + 1, a + n])
            F.append([a + 1, a + n + 1, a + n])
    return V, np.array(F, np.int64)


def test_lscm_flat_patch_is_isometric():
    """A planar chart unwraps with ~zero angle distortion and true scale."""
    V, F = _cap_mesh(n=8, curvature=0.0)
    uv = lscm_unwrap(V, F)
    assert conformal_error(V, F, uv) < 1e-3
    # edge lengths preserved (pins keep the true chart scale)
    e3 = np.linalg.norm(V[F[:, 0]] - V[F[:, 1]], axis=1)
    e2 = np.linalg.norm(uv[F[:, 0]] - uv[F[:, 1]], axis=1)
    assert np.allclose(e2 / e3, np.median(e2 / e3), rtol=0.02)


def test_lscm_beats_orthographic_on_curved_chart():
    V, F = _cap_mesh(n=13, curvature=0.5)
    uv = lscm_unwrap(V, F)
    err_lscm = conformal_error(V, F, uv)
    # orthographic projection along z (what the fallback would do)
    err_ortho = conformal_error(V, F, V[:, :2])
    assert err_lscm < 0.5 * err_ortho
    assert err_lscm < 0.02


def test_lscm_rejects_degenerate():
    V = np.zeros((3, 3))
    F = np.array([[0, 1, 2]])
    with pytest.raises(ValueError):
        lscm_unwrap(V, F)


def test_unwrap_and_pack_lscm_path():
    from alicevision_tpu.mesh.uv_atlas import unwrap_and_pack

    V, F = _cap_mesh(n=7, curvature=0.4)
    charts = [np.arange(len(F))]
    uvs, pos = unwrap_and_pack(
        V, F, charts, best_view=np.zeros(len(F), np.int32), atlas_size=512,
        texel_per_unit=100.0,
    )
    assert np.all(np.isfinite(uvs))
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0
    # per-face UVs of shared vertices must agree (a connected parameterization)
    # face 0 and face 1 share vertices 1 and n=7
    assert np.allclose(uvs[0][1], uvs[1][0], atol=1e-9)
