"""Graph homophily + label informativeness metrics (reference
``python/dgl/homophily.py``, ``label_informativeness.py``)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .graph.graph import Graph


def _edges_labels(g, y):
    row, col = (np.asarray(a) for a in g.unit().coo())
    y = np.asarray(y)
    return row, col, y


def edge_homophily(graph: Graph, y) -> float:
    """Fraction of edges connecting same-label nodes."""
    row, col, y = _edges_labels(graph, y)
    if len(row) == 0:
        return 0.0
    return float((y[row] == y[col]).mean())


def node_homophily(graph: Graph, y) -> float:
    """Mean per-node fraction of same-label in-neighbors."""
    row, col, y = _edges_labels(graph, y)
    n = graph.num_nodes()
    same = np.zeros(n)
    deg = np.zeros(n)
    np.add.at(same, col, (y[row] == y[col]).astype(np.float64))
    np.add.at(deg, col, 1.0)
    mask = deg > 0
    return float((same[mask] / deg[mask]).mean()) if mask.any() else 0.0


def linkx_homophily(graph: Graph, y) -> float:
    """Class-size-adjusted homophily from the LINKX paper."""
    row, col, y = _edges_labels(graph, y)
    n = graph.num_nodes()
    classes = np.unique(y)
    total = 0.0
    deg = np.zeros(n)
    same = np.zeros(n)
    np.add.at(deg, col, 1.0)
    np.add.at(same, col, (y[row] == y[col]).astype(np.float64))
    for c in classes:
        mask = (y == c) & (deg > 0)
        if not mask.any():
            continue
        h_c = (same[mask] / deg[mask]).sum() / max(mask.sum(), 1)
        total += max(h_c - (y == c).mean(), 0)
    return float(total / max(len(classes) - 1, 1))


def adjusted_homophily(graph: Graph, y) -> float:
    """Degree-weighted homophily adjusted for class imbalance."""
    row, col, y = _edges_labels(graph, y)
    if len(row) == 0:
        return 0.0
    h_edge = (y[row] == y[col]).mean()
    # sum over classes of (D_c / 2|E|)^2 with D_c = degree mass of class c
    n = graph.num_nodes()
    deg = np.zeros(n)
    np.add.at(deg, col, 1.0)
    np.add.at(deg, row, 1.0)
    total_deg = deg.sum()
    acc = 0.0
    for c in np.unique(y):
        acc += (deg[y == c].sum() / total_deg) ** 2
    return float((h_edge - acc) / (1 - acc)) if acc < 1 else 0.0


def label_informativeness(graph: Graph, y) -> float:
    """Normalized mutual information of edge-endpoint labels (reference
    ``label_informativeness.py``)."""
    row, col, y = _edges_labels(graph, y)
    if len(row) == 0:
        return 0.0
    classes = np.unique(y)
    k = len(classes)
    remap = np.zeros(y.max() + 1, np.int64)
    remap[classes] = np.arange(k)
    yc = remap[y]
    joint = np.zeros((k, k))
    np.add.at(joint, (yc[row], yc[col]), 1.0)
    joint = joint / joint.sum()
    p_src = joint.sum(1)
    p_dst = joint.sum(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(joint * np.log(
            np.where(joint > 0, joint / np.outer(p_src, p_dst), 1.0)))
        h = -np.nansum(p_dst * np.log(np.where(p_dst > 0, p_dst, 1.0)))
    return float(mi / h) if h > 0 else 0.0


def edge_label_informativeness(graph: Graph, y, eps: float = 1e-8) -> float:
    """LI_edge (arXiv:2209.06177; reference
    ``label_informativeness.py:22``): normalized mutual information of
    endpoint labels with edges sampled uniformly.  Computed on the
    bidirected simple graph like the reference."""
    from .transforms import to_bidirected
    g = to_bidirected(graph)
    row, col = (np.asarray(a) for a in g.unit().coo())
    y = np.asarray(y)
    deg = np.zeros(g.num_nodes())
    np.add.at(deg, col, 1.0)
    C = int(y.max()) + 1
    cdwp = np.zeros(C)
    np.add.at(cdwp, y, deg)
    cdwp /= cdwp.sum()
    ep = np.zeros((C, C))
    np.add.at(ep, (y[row], y[col]), 1.0)
    ep /= ep.sum()
    ep += eps
    cdwp_e = cdwp + eps
    num = (ep * np.log(ep)).sum()
    den = (cdwp_e * np.log(cdwp_e)).sum()
    return float(2 - num / den)


def node_label_informativeness(graph: Graph, y, eps: float = 1e-8) -> float:
    """LI_node (arXiv:2209.06177; reference
    ``label_informativeness.py:113``): a node is sampled uniformly, then
    an incident edge — low-degree nodes weigh as much as hubs."""
    from .transforms import to_bidirected
    g = to_bidirected(graph)
    row, col = (np.asarray(a) for a in g.unit().coo())
    y = np.asarray(y)
    n = g.num_nodes()
    deg = np.zeros(n)
    np.add.at(deg, col, 1.0)
    C = int(y.max()) + 1
    class_probs = np.bincount(y, minlength=C).astype(np.float64)
    class_probs /= class_probs.sum()
    cdwp = np.zeros(C)
    np.add.at(cdwp, y, deg)
    cdwp /= cdwp.sum()
    nnz = (deg > 0).sum()
    ep = np.zeros((C, C))
    np.add.at(ep, (y[row], y[col]), 1.0 / (nnz * deg[row]))
    ep += eps
    log = np.log(ep / (class_probs[:, None] * cdwp[None, :] + eps))
    num = (ep * log).sum()
    den = (class_probs * np.log(class_probs + eps)).sum()
    return float(-num / den)
