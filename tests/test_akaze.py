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


def test_mldb_descriptor_and_hamming_matching():
    """MLDB binary descriptors: 486 bits as {0,1} floats, matched by the
    Hamming brute-force path (ref: feature/akaze descriptorMLDB,
    matcherType BRUTE_FORCE_HAMMING)."""
    import numpy as np
    import jax.numpy as jnp

    from alicevision_tpu.features import akaze
    from alicevision_tpu.matching.descriptor_matching import (
        match_bruteforce_hamming,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(20, 20).astype(np.float32)
    big = np.kron(img, np.ones((8, 8), np.float32))  # 160x160 blocky texture
    cfg = akaze.AkazeConfig(max_keypoints=256, n_octaves=2, descriptor="mldb")
    f = akaze.extract(jnp.asarray(big), cfg)
    assert f.desc.shape[1] == akaze.MLDB_BITS
    d = np.asarray(f.desc)[np.asarray(f.valid)]
    assert len(d) > 10
    assert set(np.unique(d)).issubset({0.0, 1.0})
    # self-matching: every valid descriptor matches itself at distance 0
    m = match_bruteforce_hamming(f.desc, f.desc, f.valid, f.valid,
                                 ratio=1.0, cross_check=False)
    idx = np.asarray(m.idx2)[np.asarray(f.valid)]
    # ties between identical descriptors allowed; check distance is 0
    dist = np.asarray(m.dist)[np.asarray(f.valid)]
    assert (dist < 1e-6).mean() > 0.9


def test_ann_l2_agrees_with_bruteforce():
    import numpy as np
    import jax.numpy as jnp

    from alicevision_tpu.matching.descriptor_matching import (
        match_ann_l2, match_bruteforce,
    )

    rng = np.random.RandomState(1)
    d1 = rng.rand(40, 16).astype(np.float32)
    d2 = np.concatenate([d1 + 0.01 * rng.randn(40, 16).astype(np.float32),
                         rng.rand(30, 16).astype(np.float32)])
    v1 = np.ones(40, bool)
    v2 = np.ones(70, bool)
    a = match_ann_l2(d1, d2, v1, v2, ratio=0.8)
    b = match_bruteforce(jnp.asarray(d1), jnp.asarray(d2),
                         jnp.asarray(v1), jnp.asarray(v2),
                         ratio=0.8, cross_check=False)
    ia, ib = np.asarray(a.idx2), np.asarray(b.idx2)
    both = (ia >= 0) & (ib >= 0)
    assert both.sum() > 25
    assert (ia[both] == ib[both]).mean() > 0.95
