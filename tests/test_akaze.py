import jax.numpy as jnp
import numpy as np

from alicevision_tpu.features import akaze


def _texture_image(H=192, W=192, seed=0):
    """Multi-octave value-noise texture — AKAZE's natural input domain.

    (Pure Gaussian-blob images are adversarial for the PM-g2 diffusivity:
    every pixel is 'edge', so the nonlinear scale space freezes by design.)
    """
    import scipy.ndimage as ndi

    rng = np.random.RandomState(seed)
    tex = np.zeros((H, W), np.float32)
    for o in range(4):
        n = max(H, W) >> (3 - o)
        layer = rng.rand(n, n).astype(np.float32)
        tex += ndi.zoom(layer, max(H, W) / n, order=1)[:H, :W] / (2**o)
    tex -= tex.min()
    tex /= tex.max()
    return jnp.asarray(tex)


def test_akaze_detects_and_repeats_under_shift():
    img = _texture_image()
    cfg = akaze.AkazeConfig(max_keypoints=512, n_octaves=3)
    f1 = akaze.extract(img, cfg)
    v1 = np.asarray(f1.valid)
    assert v1.sum() > 100

    f2 = akaze.extract(jnp.roll(img, 9, axis=1), cfg)
    v2 = np.asarray(f2.valid)
    xy1, xy2 = np.asarray(f1.xy[v1]), np.asarray(f2.xy[v2])
    hits = sum(
        1 for p in xy1
        if np.linalg.norm(xy2 - (p + [9, 0]), axis=-1).min() < 2.0
    )
    assert hits > 0.6 * len(xy1), (hits, len(xy1))


def test_akaze_descriptor_normalized():
    img = _texture_image(seed=1)
    f = akaze.extract(img, akaze.AkazeConfig(max_keypoints=128, n_octaves=2))
    v = np.asarray(f.valid)
    assert v.sum() > 0
    d = np.asarray(f.desc[v])
    assert d.shape[1] == 64
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_akaze_matching_cross_image():
    """AKAZE descriptors match across a shifted copy via the generic matcher."""
    from alicevision_tpu.matching.descriptor_matching import match_bruteforce

    img = _texture_image(seed=3)
    shifted = jnp.roll(img, 7, axis=1)
    cfg = akaze.AkazeConfig(max_keypoints=256, n_octaves=2)
    f1 = akaze.extract(img, cfg)
    f2 = akaze.extract(shifted, cfg)
    m = match_bruteforce(f1.desc, f2.desc, f1.valid, f2.valid, ratio=0.85)
    idx2 = np.asarray(m.idx2)
    ok = idx2 >= 0
    assert ok.sum() >= 30, ok.sum()
    d = np.asarray(f2.xy)[idx2[ok]] - np.asarray(f1.xy)[ok]
    good = (np.abs(d[:, 0] - 7) < 2) & (np.abs(d[:, 1]) < 2)
    assert good.mean() > 0.8, good.mean()


def test_akaze_rotation_invariance():
    img = _texture_image(seed=2)
    H, W = img.shape
    rot = jnp.rot90(img, k=1)
    cfg = akaze.AkazeConfig(max_keypoints=128, n_octaves=2)
    f1 = akaze.extract(img, cfg)
    f2 = akaze.extract(rot, cfg)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    xy1, xy2 = np.asarray(f1.xy[v1]), np.asarray(f2.xy[v2])
    d1, d2 = np.asarray(f1.desc[v1]), np.asarray(f2.desc[v2])
    xy2_back = np.stack([W - 1 - xy2[:, 1], xy2[:, 0]], -1)
    matches = good = 0
    for i in range(len(xy1)):
        j = np.argmin(np.linalg.norm(xy2_back - xy1[i], axis=-1))
        if np.linalg.norm(xy2_back[j] - xy1[i]) < 2.5:
            matches += 1
            if float(d1[i] @ d2[j]) > 0.7:
                good += 1
    assert matches >= 10
    assert good >= matches * 0.6, (good, matches)
