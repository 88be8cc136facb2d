"""Deterministic synthetic graph generators used as zero-egress fallbacks.

These produce graphs with *planted signal* so that accuracy-gate tests are
meaningful: node features carry class-correlated signal and edges are drawn
with homophily, mimicking citation-network statistics (the reference's
cora/citeseer/pubmed loaders read real files:
``python/dgl/data/citation_graph.py``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def planted_citation_graph(num_nodes: int, num_classes: int, feat_dim: int,
                           avg_degree: float = 4.0, homophily: float = 0.85,
                           feat_signal: float = 0.8, seed: int = 0):
    """Returns (row, col, feat, label, train/val/test masks) numpy arrays.

    * labels: balanced random classes
    * edges: with prob ``homophily`` endpoints share a class
    * features: sparse bag-of-words-like: class centroid + noise
    * splits: 20 per class train (cora convention), 500 val, 1000 test
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes).astype(np.int32)
    by_class = [np.nonzero(labels == c)[0] for c in range(num_classes)]

    num_edges = int(num_nodes * avg_degree)
    src = rng.integers(0, num_nodes, num_edges)
    same = rng.random(num_edges) < homophily
    dst = np.empty(num_edges, np.int64)
    for i in range(num_edges):
        if same[i] and len(by_class[labels[src[i]]]) > 0:
            pool = by_class[labels[src[i]]]
        else:
            pool = by_class[rng.integers(0, num_classes)]
        dst[i] = pool[rng.integers(0, len(pool))]

    centroids = rng.normal(0, 1.0, (num_classes, feat_dim))
    feat = (feat_signal * centroids[labels]
            + rng.normal(0, 1.0, (num_nodes, feat_dim)))
    # sparsify like bag-of-words
    mask = rng.random((num_nodes, feat_dim)) < 0.3
    feat = (feat * mask).astype(np.float32)

    train_mask = np.zeros(num_nodes, bool)
    for c in range(num_classes):
        ids = by_class[c][:20]
        train_mask[ids] = True
    rest = np.nonzero(~train_mask)[0]
    rng.shuffle(rest)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    # cora convention (500 val / 1000 test), scaled down for small graphs
    n_val = min(500, len(rest) // 3)
    n_test = min(1000, len(rest) - n_val)
    val_mask[rest[:n_val]] = True
    test_mask[rest[n_val:n_val + n_test]] = True
    return (src.astype(np.int32), dst.astype(np.int32), feat, labels,
            train_mask, val_mask, test_mask)


def planted_graph_classification(num_graphs: int, num_classes: int = 2,
                                 feat_dim: int = 8, seed: int = 0):
    """Graph-classification set: class controls density + feature mean."""
    rng = np.random.default_rng(seed)
    graphs = []
    labels = rng.integers(0, num_classes, num_graphs).astype(np.int32)
    for i in range(num_graphs):
        c = labels[i]
        n = int(rng.integers(8, 20))
        p = 0.15 + 0.25 * c / max(num_classes - 1, 1)
        a = rng.random((n, n)) < p
        np.fill_diagonal(a, False)
        row, col = np.nonzero(a)
        feat = rng.normal(c * 0.5, 1.0, (n, feat_dim)).astype(np.float32)
        graphs.append((row.astype(np.int32), col.astype(np.int32), feat))
    return graphs, labels


def planted_knowledge_graph(num_nodes: int, num_rels: int, num_edges: int,
                            seed: int = 0):
    """Knowledge-graph triples with relation-cluster structure."""
    rng = np.random.default_rng(seed)
    cluster = rng.integers(0, num_rels, num_nodes)
    src = rng.integers(0, num_nodes, num_edges)
    rel = np.where(rng.random(num_edges) < 0.8, cluster[src],
                   rng.integers(0, num_rels, num_edges))
    dst = rng.integers(0, num_nodes, num_edges)
    # bias dst to same cluster as rel
    same = rng.random(num_edges) < 0.7
    for r in range(num_rels):
        pool = np.nonzero(cluster == r)[0]
        if len(pool) == 0:
            continue
        sel = np.nonzero(same & (rel == r))[0]
        dst[sel] = pool[rng.integers(0, len(pool), len(sel))]
    return (src.astype(np.int32), rel.astype(np.int32),
            dst.astype(np.int32), cluster.astype(np.int32))
