import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.matching import descriptor_matching as dm
from alicevision_tpu.tracks import builder as tb


def _desc_sets(key, n=200, d=128, noise=0.02, shuffle=True):
    """Two descriptor sets: set2 is a permuted noisy copy of set1."""
    k1, k2, k3 = jax.random.split(key, 3)
    d1 = jax.random.uniform(k1, (n, d))
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    perm = jax.random.permutation(k2, n) if shuffle else jnp.arange(n)
    d2 = d1[perm] + noise * jax.random.normal(k3, (n, d))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    return d1, d2, np.asarray(perm)


def test_bruteforce_exact_recovery():
    d1, d2, perm = _desc_sets(jax.random.PRNGKey(0))
    v = jnp.ones(d1.shape[0], bool)
    m = dm.match_bruteforce(d1, d2, v, v)
    idx2 = np.asarray(m.idx2)
    inv = np.argsort(perm)  # d2[inv[i]] corresponds to d1[i]
    matched = idx2 >= 0
    assert matched.sum() > 0.9 * len(idx2)
    assert (idx2[matched] == inv[matched]).all()


def test_bruteforce_respects_validity():
    d1, d2, perm = _desc_sets(jax.random.PRNGKey(1), n=50)
    v1 = jnp.arange(50) < 25
    v2 = jnp.ones(50, bool)
    m = dm.match_bruteforce(d1, d2, v1, v2)
    assert (np.asarray(m.idx2)[25:] == -1).all()


def test_cascade_hash_agrees_with_bruteforce():
    d1, d2, perm = _desc_sets(jax.random.PRNGKey(2), n=300)
    v = jnp.ones(300, bool)
    proj = dm.make_hash_projection(jax.random.PRNGKey(3))
    mean = jnp.mean(jnp.concatenate([d1, d2]), axis=0)
    mb = dm.match_bruteforce(d1, d2, v, v)
    mc = dm.match_cascade_hash(d1, d2, v, v, proj, mean, n_candidates=32)
    ib, ic = np.asarray(mb.idx2), np.asarray(mc.idx2)
    both = (ib >= 0) & (ic >= 0)
    agree = (ib[both] == ic[both]).mean()
    assert agree > 0.95
    assert both.sum() > 0.85 * (ib >= 0).sum()


def test_guided_epipolar_restricts_band():
    # identical descriptors everywhere -> only the epipolar band disambiguates
    key = jax.random.PRNGKey(4)
    n = 64
    xy1 = jax.random.uniform(key, (n, 2), minval=0, maxval=500)
    # F for pure horizontal stereo: y2 = y1 (epipolar lines horizontal)
    F = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    xy2 = xy1 + jnp.array([30.0, 0.0])  # shifted along epipolar line
    d = jax.random.uniform(jax.random.PRNGKey(5), (n, 128))
    v = jnp.ones(n, bool)
    m = dm.guided_match_epipolar(F, xy1, xy2, d, d, v, v, max_epipolar_px=2.0)
    idx2 = np.asarray(m.idx2)
    ok = idx2 >= 0
    assert ok.sum() > n * 0.8
    assert (idx2[ok] == np.arange(n)[ok]).all()


def test_tracks_union_find():
    # 3 views; features chained 0-0-0 and 1-1-1; a fork in view 2 for track 2
    matches = {
        (0, 1): np.array([[0, 0], [1, 1], [2, 2]]),
        (1, 2): np.array([[0, 0], [1, 1], [2, 2], [2, 3]]),  # 2->2 and 2->3 fork
    }
    nfeat = {0: 10, 1: 10, 2: 10}
    tr = tb.build_tracks(matches, nfeat)
    # fork track dropped, 2 clean tracks of length 3 remain
    assert tr.n_tracks == 2
    lens = tr.lengths()
    assert (lens == 3).all()


def test_tracks_min_length():
    matches = {(0, 1): np.array([[5, 7]])}
    tr = tb.build_tracks(matches, {0: 10, 1: 10}, min_track_length=3)
    assert tr.n_tracks == 0
    tr2 = tb.build_tracks(matches, {0: 10, 1: 10}, min_track_length=2)
    assert tr2.n_tracks == 1


def test_tracks_common_views():
    matches = {
        (0, 1): np.array([[0, 0]]),
        (1, 2): np.array([[0, 0]]),
        (2, 3): np.array([[5, 5]]),
    }
    tr = tb.build_tracks(matches, {0: 8, 1: 8, 2: 8, 3: 8})
    common01 = tb.tracks_in_views(tr, {0, 1})
    assert len(common01) == 1
    common23 = tb.tracks_in_views(tr, {2, 3})
    assert len(common23) == 1
    assert set(common01) != set(common23)
