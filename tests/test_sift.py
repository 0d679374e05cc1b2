import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.features import sift
from alicevision_tpu.image.filtering import gaussian_blur, bilinear_sample


def _render_blobs(H=256, W=256, seed=0, n=12):
    """Image with Gaussian blobs at known locations (classic DoG targets)."""
    rng = np.random.RandomState(seed)
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    centers = []
    for _ in range(n):
        cx, cy = rng.uniform(30, W - 30), rng.uniform(30, H - 30)
        s = rng.uniform(2.0, 6.0)
        img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
        centers.append((cx, cy, s))
    return jnp.asarray(img / img.max()), centers


def test_blob_detection():
    img, centers = _render_blobs()
    cfg = sift.SiftConfig(max_keypoints=256, n_octaves=3)
    feats = sift.extract(img, cfg)
    det = np.asarray(feats.xy[np.asarray(feats.valid)])
    found = 0
    for cx, cy, s in centers:
        d = np.min(np.linalg.norm(det - [cx, cy], axis=-1)) if len(det) else 1e9
        if d < 2.0:
            found += 1
    assert found >= len(centers) * 0.8, (found, len(centers))


def test_descriptor_norm_and_validity():
    img, _ = _render_blobs(seed=1)
    cfg = sift.SiftConfig(max_keypoints=128, n_octaves=3)
    feats = sift.extract(img, cfg)
    v = np.asarray(feats.valid)
    assert v.sum() > 0
    d = np.asarray(feats.desc[v])
    # rootSIFT: L2 norm 1
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
    assert (d >= 0).all()


def test_rotation_invariance():
    """Descriptors of a rotated image should match the originals."""
    img, centers = _render_blobs(seed=2, n=6)
    # add texture so orientation is well-defined
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    tex = 0.3 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
    base = jnp.asarray(np.asarray(img) + tex * np.asarray(img))

    rot90 = jnp.rot90(base, k=1)  # 90 deg CCW
    cfg = sift.SiftConfig(max_keypoints=64, n_octaves=3)
    f1 = sift.extract(base, cfg)
    f2 = sift.extract(rot90, cfg)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    d1, d2 = np.asarray(f1.desc[v1]), np.asarray(f2.desc[v2])
    xy1 = np.asarray(f1.xy[v1])
    xy2 = np.asarray(f2.xy[v2])
    # map rotated coords back: for rot90 CCW with numpy convention,
    # (x', y') = (y, W-1-x) -> inverse x = W-1-y', y = x'
    xy2_back = np.stack([W - 1 - xy2[:, 1], xy2[:, 0]], axis=-1)
    matches = 0
    good = 0
    for i in range(len(xy1)):
        j = np.argmin(np.linalg.norm(xy2_back - xy1[i], axis=-1))
        if np.linalg.norm(xy2_back[j] - xy1[i]) < 2.0:
            matches += 1
            sim = float(np.dot(d1[i], d2[j]))
            if sim > 0.8:
                good += 1
    assert matches >= 5
    assert good >= matches * 0.7, (good, matches)


def test_scale_assignment():
    """Detected scale should track blob sigma (DoG responds at sigma ~ s)."""
    img = np.zeros((128, 128), np.float32)
    yy, xx = np.mgrid[0:128, 0:128]
    s_true = 4.0
    img += np.exp(-((xx - 64) ** 2 + (yy - 64) ** 2) / (2 * s_true**2))
    cfg = sift.SiftConfig(max_keypoints=16, n_octaves=3)
    feats = sift.extract(jnp.asarray(img), cfg)
    v = np.asarray(feats.valid)
    assert v.sum() >= 1
    xy = np.asarray(feats.xy[v])
    sc = np.asarray(feats.scale[v])
    i = np.argmin(np.linalg.norm(xy - [64, 64], axis=-1))
    assert np.linalg.norm(xy[i] - [64, 64]) < 1.5
    # DoG peak for a blob of sigma s occurs at detection scale ~ s
    assert 0.5 * s_true < sc[i] < 2.0 * s_true


def test_dsp_pooling_runs():
    img, _ = _render_blobs(seed=3, n=6)
    cfg = sift.SiftConfig(max_keypoints=32, n_octaves=2, dsp=True, dsp_n_scales=5)
    feats = sift.extract(img, cfg)
    v = np.asarray(feats.valid)
    assert v.sum() > 0
    d = np.asarray(feats.desc[v])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_quantize_roundtrip():
    d = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (4, 128)) * 0.4, 0, 1)
    q = sift.quantize_desc(d)
    assert q.dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(q, np.float32) / 512.0, np.asarray(d), atol=1.0 / 512
    )


def test_dsp_descriptor_quality_under_scale_change():
    """DSP pooling (the reference's default describer) must stay close to
    plain SIFT's matching accuracy under a 1.25x scale change on synthetic
    texture (its published gains need natural-image statistics / viewpoint
    change, which this fixture cannot reproduce), and the level-matched,
    per-scale-normalized pooling must beat naive same-level unnormalized
    pooling (regression guard for the two measured defects).

    Ref: ImageDescriber_DSPSIFT_vlfeat.cpp:304-311 domain-size pooling."""
    rng = np.random.RandomState(3)
    H = W = 320
    base = rng.rand(H + 80, W + 80).astype(np.float32)
    base = np.asarray(gaussian_blur(jnp.asarray(base), 3.0))
    img1 = jnp.asarray(base[:H, :W])
    s = 1.25
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    coords = jnp.asarray(np.stack([xx / s, yy / s], -1).reshape(-1, 2))
    img2 = bilinear_sample(jnp.asarray(base), coords).reshape(H, W)

    def correct_nn(cfg):
        f1 = sift.extract(img1, cfg)
        f2 = sift.extract(img2, cfg)
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        xy1 = np.asarray(f1.xy)[v1]
        d1 = np.asarray(f1.desc)[v1]
        xy2 = np.asarray(f2.xy)[v2]
        d2 = np.asarray(f2.desc)[v2]
        pred = xy1 * s
        gdist = np.linalg.norm(pred[:, None] - xy2[None], axis=-1)
        nn = gdist.argmin(1)
        ok = gdist[np.arange(len(pred)), nn] < 2.0
        assert ok.sum() >= 20
        ddist = np.linalg.norm(d1[:, None] - d2[None], axis=-1)
        dnn = ddist.argmin(1)
        return float((dnn[ok] == nn[ok]).mean())

    plain = correct_nn(sift.SiftConfig(max_keypoints=512, n_octaves=3))
    pooled = correct_nn(sift.SiftConfig(
        max_keypoints=512, n_octaves=3, dsp=True,
        dsp_min=0.6, dsp_max=1.8, dsp_n_scales=6,
    ))
    assert pooled > plain - 0.08, (pooled, plain)
    assert pooled > 0.75
