import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import hdr


def _synthetic_brackets(phi=0.3, B=5, H=32, W=48, seed=0):
    """Ground-truth radiance -> brackets through a Laguerre response."""
    rng = np.random.RandomState(seed)
    E = rng.rand(H, W).astype(np.float32) * 2.0 + 0.01  # radiance
    exposures = np.array([1 / 16, 1 / 4, 1.0, 4.0, 16.0][:B], np.float32) * 0.25
    imgs = []
    for dt in exposures:
        linear = np.clip(E * dt, 0, 1)
        z = np.asarray(hdr.laguerre_apply(jnp.asarray(phi), jnp.asarray(linear)))
        imgs.append(z)
    return np.stack(imgs), exposures, E


def test_laguerre_inverse_roundtrip():
    x = jnp.linspace(0.01, 0.99, 64)
    for phi in (-0.5, 0.0, 0.4):
        y = hdr.laguerre_apply(jnp.asarray(phi), x)
        back = hdr.laguerre_apply(jnp.asarray(-phi), y)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_laguerre_calibration_recovers_phi():
    phi_gt = 0.35
    imgs, exposures, E = _synthetic_brackets(phi=phi_gt)
    idx = hdr.sample_bracket_pixels(imgs, 500)
    samples = jnp.asarray(imgs.reshape(len(imgs), -1)[:, idx])
    phi = hdr.laguerre_calibrate(samples, jnp.asarray(exposures))
    assert abs(float(phi) - phi_gt) < 0.05, float(phi)


def test_debevec_monotone_response():
    imgs, exposures, E = _synthetic_brackets(phi=0.0)
    idx = hdr.sample_bracket_pixels(imgs, 300)
    samples = jnp.asarray(imgs.reshape(len(imgs), -1)[:, idx])
    resp = hdr.debevec_calibrate(samples, jnp.asarray(exposures))
    g = np.asarray(resp.g)
    # monotone non-decreasing over the well-exposed range, ~log shape
    mid = g[30:226]
    assert (np.diff(mid) > -1e-3).mean() > 0.97
    # linear response -> g approximates ln(z) + const
    zs = np.arange(30, 226) / 255.0
    corr = np.corrcoef(mid, np.log(zs))[0, 1]
    assert corr > 0.99


def test_merge_recovers_radiance():
    phi_gt = 0.3
    imgs, exposures, E = _synthetic_brackets(phi=phi_gt)
    merged = hdr.merge_hdr(jnp.asarray(imgs), jnp.asarray(exposures), phi=phi_gt)
    m = np.asarray(merged)
    # compare where at least one bracket is well exposed
    ok = ((imgs > 0.05) & (imgs < 0.95)).any(0)
    rel = np.abs(m[ok] - E[ok]) / E[ok]
    assert np.median(rel) < 0.02, np.median(rel)


def test_merge_highlight_fallback():
    E = np.full((8, 8), 100.0, np.float32)  # blinding radiance
    exposures = np.array([0.25, 1.0, 4.0], np.float32)
    imgs = np.stack([np.clip(E * dt, 0, 1) for dt in exposures])
    merged = np.asarray(hdr.merge_hdr(jnp.asarray(imgs), jnp.asarray(exposures)))
    # saturated everywhere -> fallback to shortest-exposure estimate (>= 4)
    assert (merged >= 3.9).all()


def test_estimate_brackets():
    groups = hdr.estimate_brackets(np.array([1, 2, 4, 1, 2, 4]), 3)
    assert groups == [[0, 1, 2], [3, 4, 5]]


def test_grossberg_calibration_recovers_response():
    """Grossberg-style inverse-response fit on a synthetic gamma camera
    (ref: hdr/GrossbergCalibrate.cpp; same synthetic-curve strategy as
    hdr/hdrTestCommon.hpp)."""
    import numpy as np
    import jax.numpy as jnp
    from alicevision_tpu.hdr import grossberg_apply, grossberg_calibrate

    rng = np.random.default_rng(0)
    gamma = 2.2
    radiance = rng.uniform(0.02, 0.9, size=600)
    exposures = np.array([0.5, 1.0, 2.0])
    # Camera: v = clip(E * t) ** (1/gamma)
    samples = np.stack([
        np.clip(radiance * t, 0, 1) ** (1.0 / gamma) for t in exposures
    ])
    c = grossberg_calibrate(jnp.asarray(samples, jnp.float32), jnp.asarray(exposures, jnp.float32), n_coeffs=8)
    v = np.linspace(0.05, 0.95, 50).astype(np.float32)
    h = np.asarray(grossberg_apply(c, jnp.asarray(v)))
    # The recovered inverse response must match v**gamma up to global scale.
    gt = v ** gamma
    s = np.sum(h * gt) / np.sum(h * h)
    rel = np.abs(s * h - gt) / np.maximum(gt, 1e-3)
    assert np.median(rel) < 0.08, np.median(rel)


def test_cli_hdr_sampling_calibration_merge(tmp_path):
    """Full LdrToHdr trio through the CLI (ref: main_LdrToHdrSampling.cpp,
    main_LdrToHdrCalibration.cpp, main_LdrToHdrMerge.cpp stage contract)."""
    import os

    import numpy as np

    from alicevision_tpu.pipeline.cli import main
    from alicevision_tpu.image.io import write_image

    rng = np.random.default_rng(3)
    H = W = 32
    radiance = rng.uniform(0.05, 0.8, size=(H, W)).astype(np.float32)
    folder = tmp_path / "brackets"
    folder.mkdir()
    exps = [1.0, 4.0, 16.0]
    gamma = 2.0
    for i, t in enumerate(exps):
        v = np.clip(radiance * t / 16.0, 0, 1) ** (1 / gamma)
        np.save(folder / f"img_{i}.npy", np.repeat(v[..., None], 3, -1))

    samples_f = str(tmp_path / "samples.npz")
    assert main(["ldrToHdrSampling", "--inputFolder", str(folder), "--output", samples_f]) == 0
    with np.load(samples_f) as z:
        assert z["samples"].shape[0] == 3

    for method in ["laguerre", "grossberg", "debevec"]:
        resp_f = str(tmp_path / f"resp_{method}.npz")
        assert main([
            "ldrToHdrCalibration", "--input", samples_f, "--output", resp_f,
            "--calibrationMethod", method,
        ]) == 0
        out_f = str(tmp_path / f"hdr_{method}.npy")
        assert main([
            "ldrToHdrMerge", "--inputFolder", str(folder), "--output", out_f,
            "--response", resp_f,
        ]) == 0
        merged = np.load(out_f)
        assert merged.shape[:2] == (H, W)
        assert np.isfinite(merged).all()
        # Merged radiance must correlate strongly with the ground truth.
        m = merged.mean(-1).ravel()
        r = radiance.ravel()
        cc = np.corrcoef(m, r)[0, 1]
        assert cc > 0.95, (method, cc)


def test_highlight_recovery_lifts_clamped_pixels():
    """Clamped pixels in the brightest LDR pull radiance toward the
    highlight target; unclamped pixels are untouched
    (ref: hdrMerge.cpp:199-272)."""
    import numpy as np
    from alicevision_tpu.hdr.merge import highlight_recovery

    H, W = 32, 32
    radiance = jnp.ones((H, W)) * 100.0
    ldr = jnp.zeros((H, W)).at[8:16, 8:16].set(1.0)  # clamped block
    out = highlight_recovery(radiance, ldr, target_exposure=1.0,
                             correction_factor=1.0, target_lux=1000.0)
    out = np.asarray(out)
    # target = 1000 * 1 * 2.5 = 2500 >> 100
    assert out[12, 12] > 2000.0
    assert abs(out[2, 2] - 100.0) < 1.0  # far from the clamped block
    # zero correction factor is the identity
    out0 = highlight_recovery(radiance, ldr, 1.0, correction_factor=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(radiance))


def test_emor_tables_shape_and_endpoints():
    """The shipped EMoR inverse basis (DoRF PCA, emorCurveInv.cpp data):
    mean curve spans [0,1] monotonically, basis rows are zero-mean-ish
    deviations pinned near the endpoints."""
    import numpy as np
    from alicevision_tpu.hdr.calibration import emor_tables, grossberg_apply
    import jax.numpy as jnp

    f0, h = emor_tables()
    assert f0.shape == (1024,) and h.shape == (25, 1024)
    assert abs(f0[0]) < 1e-6 and abs(f0[-1] - 1.0) < 1e-6
    assert np.all(np.diff(f0) > -1e-6)  # monotone mean inverse response
    # zero coefficients reproduce the mean curve exactly
    v = jnp.linspace(0, 1, 64)
    out = grossberg_apply(jnp.zeros(6), v, kind="emor")
    ref = np.interp(np.asarray(v), np.linspace(0, 1, 1024), f0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_grossberg_emor_fits_gamma_response():
    """EMoR calibration recovers radiance ratios under a gamma camera."""
    import numpy as np
    import jax.numpy as jnp
    from alicevision_tpu.hdr.calibration import (
        grossberg_apply,
        grossberg_calibrate,
    )

    rng = np.random.RandomState(0)
    E = rng.uniform(0.02, 0.6, 400)  # radiances
    ts = np.array([1.0, 2.0, 4.0])
    g = 1.0 / 2.2
    samples = np.clip((E[None] * ts[:, None]) ** g, 0, 1)  # gamma response
    c = grossberg_calibrate(jnp.asarray(samples, jnp.float32),
                            jnp.asarray(ts, jnp.float32), n_coeffs=8)
    h = np.asarray(grossberg_apply(c, jnp.asarray(samples[0], jnp.float32)))
    # recovered radiance proportional to the true one (mid-range samples)
    sel = (samples[0] > 0.15) & (samples[0] < 0.9)
    ratio = h[sel] / E[sel]
    assert np.std(ratio) / np.mean(ratio) < 0.05
