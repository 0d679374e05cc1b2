"""Vocabulary-tree image retrieval: hierarchical k-means + TF-IDF scoring.

TPU-native re-design of the reference's retrieval stack
(ref: src/aliceVision/voctree/VocabularyTree.hpp:102-131 quantizer,
SimpleKmeans.hpp / TreeBuilder.hpp training, Database.hpp:50-106,153
TF-IDF inverted file; used for pair selection by
src/software/pipeline/main_imageMatching.cpp:209). Tree traversal becomes
a per-level batched argmin against each level's centroid table (gather +
matmul); the inverted-file scoring becomes a dense normalized BoW matrix
product — images x words is small (thousands x ~10k) and rides the MXU.

Defaults mirror the reference's classic tree: branching factor 10,
depth 6 is overkill for in-memory scenes; we default to 8^4 = 4096 leaves.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VocTree(NamedTuple):
    centers: jnp.ndarray  # (n_levels, max_nodes, D) per-level centroids
    n_children: int
    n_levels: int

    @property
    def n_leaves(self) -> int:
        return self.n_children**self.n_levels


def _kmeans(key, X, k, iters=10):
    """Plain batched k-means on (N, D); returns (k, D) centers."""
    return _kmeans_masked(key, X, jnp.ones(X.shape[0], bool), k, iters)


@partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_masked(key, X, valid, k, iters=10):
    """Masked k-means on padded (Ncap, D): invalid rows carry zero weight.

    The padding exists so every tree node trains through ONE jitted
    program per power-of-two bucket — per-node exact shapes meant one XLA
    compile per node (measured: a 3-level/8-child build spent ~15 min in
    72 relay compiles; bucketed it is a handful)."""
    w = valid.astype(X.dtype)
    p = w / jnp.maximum(w.sum(), 1.0)
    idx = jax.random.choice(key, X.shape[0], (k,), replace=True, p=p)
    centers = X[idx]

    def step(centers, _):
        d = (
            jnp.sum(X * X, -1, keepdims=True)
            - 2 * X @ centers.T
            + jnp.sum(centers * centers, -1)[None, :]
        )
        assign = jnp.argmin(d, -1)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype) * w[:, None]
        counts = onehot.sum(0)
        sums = onehot.T @ X
        new = jnp.where(counts[:, None] > 0, sums / counts[:, None].clip(1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def build_voctree(
    key: jax.Array,
    descriptors: jnp.ndarray,  # (N, D) training descriptors
    n_children: int = 8,
    n_levels: int = 4,
    kmeans_iters: int = 8,
) -> VocTree:
    """Train the hierarchical vocabulary (TreeBuilder equivalent).

    Level l has n_children^(l+1) centroids stored flat; each node's children
    are trained on the descriptors assigned to that node. Host-side loop over
    nodes (training is offline), batched k-means inside.
    """
    D = descriptors.shape[1]
    X = np.asarray(descriptors, np.float32)
    rng = np.random.RandomState(0)
    max_node_samples = 8192  # cap per-node training set (offline quality knob)
    assign = np.zeros(len(X), np.int64)  # node id at current level
    levels = []
    for l in range(n_levels):
        n_nodes = n_children ** (l + 1)
        centers_l = np.zeros((n_nodes, D), np.float32)
        for parent in range(n_children**l):
            sel = np.nonzero(assign == parent)[0]
            key, k1 = jax.random.split(key)
            if len(sel) >= n_children:
                if len(sel) > max_node_samples:
                    sel = rng.choice(sel, max_node_samples, replace=False)
                # pad to a power-of-two bucket: one compile per bucket, not
                # one per node (see _kmeans_masked)
                cap = max(64, 1 << int(np.ceil(np.log2(len(sel)))))
                Xp = np.zeros((cap, D), np.float32)
                Xp[: len(sel)] = X[sel]
                vmask = np.zeros(cap, bool)
                vmask[: len(sel)] = True
                c = np.asarray(
                    _kmeans_masked(
                        k1, jnp.asarray(Xp), jnp.asarray(vmask),
                        n_children, kmeans_iters,
                    )
                )
            else:
                c = np.zeros((n_children, D), np.float32)
                if len(sel) > 0:
                    c[: len(sel)] = X[sel]
            centers_l[parent * n_children : (parent + 1) * n_children] = c
        # reassign
        child_of = np.zeros(len(X), np.int64)
        for parent in range(n_children**l):
            sel = np.nonzero(assign == parent)[0]
            if len(sel) == 0:
                continue
            c = centers_l[parent * n_children : (parent + 1) * n_children]
            d = ((X[sel][:, None, :] - c[None]) ** 2).sum(-1)
            child_of[sel] = parent * n_children + np.argmin(d, -1)
        assign = child_of
        levels.append(centers_l)

    max_nodes = n_children**n_levels
    stacked = np.zeros((n_levels, max_nodes, D), np.float32)
    for l, c in enumerate(levels):
        stacked[l, : len(c)] = c
    return VocTree(
        centers=jnp.asarray(stacked), n_children=n_children, n_levels=n_levels
    )


def quantize(tree: VocTree, desc: jnp.ndarray) -> jnp.ndarray:
    """Descriptors (N, D) -> leaf word ids (N,) by greedy tree descent
    (VocabularyTree::quantize). Jit by closing over the tree:
    ``jax.jit(lambda d: quantize(tree, d))`` — the level/branching ints are
    Python-static by construction."""
    n = desc.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for l in range(tree.n_levels):
        base = node * tree.n_children
        cand = base[:, None] + jnp.arange(tree.n_children)[None, :]  # (N, C)
        c = tree.centers[l][cand]  # (N, C, D)
        d = jnp.sum((desc[:, None, :] - c) ** 2, axis=-1)
        node = (base + jnp.argmin(d, axis=-1)).astype(jnp.int32)
    return node


def bow_vector(tree: VocTree, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Raw term-frequency histogram over leaves (n_leaves,)."""
    words = quantize(tree, desc)
    w = valid.astype(jnp.float32)
    return jnp.zeros((tree.n_leaves,)).at[words].add(w)


class VocTreeDatabase(NamedTuple):
    """TF-IDF database over a set of images (Database.hpp equivalent)."""

    tfidf: jnp.ndarray  # (n_images, n_leaves) L2-normalized tf-idf vectors
    idf: jnp.ndarray  # (n_leaves,)


def build_database(tree: VocTree, bows: jnp.ndarray) -> VocTreeDatabase:
    """bows: (n_images, n_leaves) raw counts -> tf-idf with L2 norm."""
    n_images = bows.shape[0]
    df = jnp.sum(bows > 0, axis=0)  # document frequency
    # +0.5 smoothing keeps idf strictly positive even when every image
    # touches a leaf (df == N) — with few images and a small vocabulary,
    # log((N+1)/(df+1)) degenerates to an all-zero database.
    idf = jnp.log((n_images + 1.0) / (df + 0.5))
    tf = bows / jnp.sum(bows, axis=1, keepdims=True).clip(1.0)
    v = tf * idf[None, :]
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True).clip(1e-12)
    return VocTreeDatabase(tfidf=v, idf=idf)


def query_pairs(db: VocTreeDatabase, n_neighbors: int = 10) -> np.ndarray:
    """All-vs-all retrieval: for each image, its top-k most similar others.

    Returns (n_images * k, 2) unique candidate pairs — the pair list that
    feeds feature matching (ImageMatching method VOCTREE,
    ref: imageMatching/ImageMatching.hpp:50-58).
    """
    sim = db.tfidf @ db.tfidf.T  # (N, N) cosine similarity — one matmul
    n = sim.shape[0]
    sim = sim - 2.0 * jnp.eye(n)  # exclude self
    k = min(n_neighbors, n - 1)
    _, nbrs = jax.lax.top_k(sim, k)
    nbrs = np.asarray(nbrs)
    pairs = set()
    for i in range(n):
        for j in nbrs[i]:
            a, b = (i, int(j)) if i < j else (int(j), i)
            if a != b:
                pairs.add((a, b))
    return np.array(sorted(pairs), np.int64).reshape(-1, 2)


def exhaustive_pairs(n: int) -> np.ndarray:
    """All N(N-1)/2 pairs (pairBuilder.cpp exhaustivePairs)."""
    out = [(i, j) for i in range(n) for j in range(i + 1, n)]
    return np.array(out, np.int64).reshape(-1, 2)


def sequential_pairs(n: int, window: int = 5) -> np.ndarray:
    """Video-style windowed pairs (ImageMatching SEQUENTIAL)."""
    out = [(i, j) for i in range(n) for j in range(i + 1, min(i + 1 + window, n))]
    return np.array(out, np.int64).reshape(-1, 2)
