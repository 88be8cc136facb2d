"""Citation-network node-classification datasets: Cora / Citeseer / Pubmed.

Reference: ``python/dgl/data/citation_graph.py`` — loads planetoid pickles.
Here: if the planetoid files exist under ``raw_dir`` they are loaded; in the
zero-egress environment a deterministic synthetic graph with identical
schema/statistics is generated instead (``is_synthetic = True``).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .dgl_dataset import DGLDataset
from .synthetic_gen import planted_citation_graph
from ..graph.convert import graph as make_graph

_STATS = {
    # name: (num_nodes, feat_dim, num_classes, avg_degree)
    "cora": (2708, 1433, 7, 3.9),
    "citeseer": (3327, 3703, 6, 2.8),
    "pubmed": (19717, 500, 3, 4.5),
}


class CitationGraphDataset(DGLDataset):
    def __init__(self, name: str, raw_dir=None, force_reload=False,
                 verbose=False, reverse_edge=True, transform=None,
                 feat_dim=None):
        assert name in _STATS
        self._reverse_edge = reverse_edge
        self._feat_dim_override = feat_dim
        super().__init__(name, raw_dir=raw_dir, force_reload=force_reload,
                         verbose=verbose, transform=transform)

    def process(self):
        from .real_loaders import planetoid_files_exist, load_planetoid
        n, d, c, deg = _STATS[self.name]
        if self._feat_dim_override:
            d = self._feat_dim_override
        npz = os.path.join(self.raw_path, f"{self.name}.npz")
        if planetoid_files_exist(self.raw_path, self.name):
            (src, dst, feat, labels, train_mask, val_mask, test_mask,
             c) = load_planetoid(self.raw_path, self.name,
                                 reverse_edge=self._reverse_edge)
            n = feat.shape[0]
            g = make_graph((src, dst), num_nodes=n)
            g.ndata["feat"] = np.ascontiguousarray(feat)
            g.ndata["label"] = np.ascontiguousarray(labels)
            g.ndata["train_mask"] = np.ascontiguousarray(train_mask)
            g.ndata["val_mask"] = np.ascontiguousarray(val_mask)
            g.ndata["test_mask"] = np.ascontiguousarray(test_mask)
            self._graph = g
            self._num_classes = int(c)
            return
        if os.path.exists(npz):
            data = np.load(npz)
            src, dst = data["src"], data["dst"]
            feat, labels = data["feat"], data["label"]
            train_mask, val_mask, test_mask = (data["train_mask"],
                                               data["val_mask"],
                                               data["test_mask"])
        else:
            self.is_synthetic = True
            src, dst, feat, labels, train_mask, val_mask, test_mask = (
                planted_citation_graph(n, c, min(d, 256), avg_degree=deg,
                                       seed=hash(self.name) % 2 ** 31))
        if self._reverse_edge:
            src, dst = (np.concatenate([src, dst]),
                        np.concatenate([dst, src]))
        g = make_graph((src, dst), num_nodes=n)
        g.ndata["feat"] = np.ascontiguousarray(feat)
        g.ndata["label"] = np.ascontiguousarray(labels)
        g.ndata["train_mask"] = np.ascontiguousarray(train_mask)
        g.ndata["val_mask"] = np.ascontiguousarray(val_mask)
        g.ndata["test_mask"] = np.ascontiguousarray(test_mask)
        self._graph = g
        self._num_classes = c

    @property
    def num_classes(self):
        return self._num_classes

    @property
    def num_labels(self):
        return self._num_classes

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class CoraGraphDataset(CitationGraphDataset):
    def __init__(self, **kw):
        super().__init__("cora", **kw)


class CiteseerGraphDataset(CitationGraphDataset):
    def __init__(self, **kw):
        super().__init__("citeseer", **kw)


class PubmedGraphDataset(CitationGraphDataset):
    def __init__(self, **kw):
        super().__init__("pubmed", **kw)
