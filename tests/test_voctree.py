import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.matching import voctree as vt


def _clustered_descriptors(key, n_clusters=20, per=50, d=32, spread=0.05):
    k1, k2 = jax.random.split(key)
    centers = jax.random.uniform(k1, (n_clusters, d))
    noise = spread * jax.random.normal(k2, (n_clusters, per, d))
    X = centers[:, None, :] + noise
    return X.reshape(-1, d), np.repeat(np.arange(n_clusters), per)


def test_quantize_consistency():
    """Near-duplicate descriptors quantize to the same word (the property
    matching relies on); all leaves are reachable."""
    key = jax.random.PRNGKey(0)
    X, labels = _clustered_descriptors(key)
    tree = vt.build_voctree(jax.random.PRNGKey(1), X, n_children=4, n_levels=3)
    words = np.asarray(vt.quantize(tree, X))
    X2 = X + 1e-4 * jax.random.normal(jax.random.PRNGKey(2), X.shape)
    words2 = np.asarray(vt.quantize(tree, X2))
    assert (words == words2).mean() > 0.95
    assert len(np.unique(words)) > tree.n_leaves * 0.5


def test_retrieval_ranks_similar_images_first():
    """Images made of shared cluster mixes: similar mixes retrieve each other."""
    key = jax.random.PRNGKey(2)
    X, labels = _clustered_descriptors(key, n_clusters=30, per=40)
    X = np.asarray(X)
    tree = vt.build_voctree(jax.random.PRNGKey(3), jnp.asarray(X), n_children=4, n_levels=3)

    rng = np.random.RandomState(0)
    # two groups of images drawing from disjoint cluster sets
    groups = [np.arange(0, 15), np.arange(15, 30)]
    bows, gid = [], []
    for g, cl in enumerate(groups):
        for _ in range(6):
            chosen = rng.choice(cl, 5, replace=False)
            sel = np.concatenate([np.nonzero(labels == c)[0] for c in chosen])
            d = jnp.asarray(X[sel])
            bows.append(vt.bow_vector(tree, d, jnp.ones(len(sel), bool)))
            gid.append(g)
    db = vt.build_database(tree, jnp.stack(bows))
    pairs = vt.query_pairs(db, n_neighbors=3)
    gid = np.array(gid)
    same_group = gid[pairs[:, 0]] == gid[pairs[:, 1]]
    assert same_group.mean() > 0.85


def test_pair_builders():
    ex = vt.exhaustive_pairs(5)
    assert len(ex) == 10
    seq = vt.sequential_pairs(6, window=2)
    assert (seq == np.array([[0,1],[0,2],[1,2],[1,3],[2,3],[2,4],[3,4],[3,5],[4,5]])).all()


def test_bow_respects_validity():
    key = jax.random.PRNGKey(4)
    X, _ = _clustered_descriptors(key, n_clusters=4, per=10)
    tree = vt.build_voctree(jax.random.PRNGKey(5), X, n_children=2, n_levels=2)
    valid = jnp.zeros(X.shape[0], bool)
    bow = vt.bow_vector(tree, X, valid)
    assert float(jnp.sum(bow)) == 0.0
