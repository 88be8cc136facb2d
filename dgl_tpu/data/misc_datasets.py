"""Assorted datasets: Karate club (real, embedded), Reddit/PPI/TU/GIN/
knowledge-graph (synthetic fallback), CSVDataset (real file loader), and the
As*Dataset adapters (reference ``python/dgl/data/adapter.py``)."""
from __future__ import annotations

import csv
import os

import numpy as np
import jax.numpy as jnp

from .dgl_dataset import DGLDataset
from .synthetic_gen import (
    planted_citation_graph,
    planted_graph_classification,
    planted_knowledge_graph,
)
from ..graph.convert import graph as make_graph, heterograph as make_hetero
from ..batch import batch as batch_graphs

# Zachary's karate club (public-domain classic; reference
# ``python/dgl/data/karate.py`` builds the same constant graph).
_KARATE_EDGES = [
    (1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2), (4, 0), (5, 0),
    (6, 0), (6, 4), (6, 5), (7, 0), (7, 1), (7, 2), (7, 3), (8, 0),
    (8, 2), (9, 2), (10, 0), (10, 4), (10, 5), (11, 0), (12, 0), (12, 3),
    (13, 0), (13, 1), (13, 2), (13, 3), (16, 5), (16, 6), (17, 0), (17, 1),
    (19, 0), (19, 1), (21, 0), (21, 1), (25, 23), (25, 24), (27, 2),
    (27, 23), (27, 24), (28, 2), (29, 23), (29, 26), (30, 1), (30, 8),
    (31, 0), (31, 24), (31, 25), (31, 28), (32, 2), (32, 8), (32, 14),
    (32, 15), (32, 18), (32, 20), (32, 22), (32, 23), (32, 29), (32, 30),
    (32, 31), (33, 8), (33, 9), (33, 13), (33, 14), (33, 15), (33, 18),
    (33, 19), (33, 20), (33, 22), (33, 23), (33, 26), (33, 27), (33, 28),
    (33, 29), (33, 30), (33, 31), (33, 32),
]
_KARATE_INSTRUCTOR_SIDE = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17,
                           19, 21}


class KarateClubDataset(DGLDataset):
    def __init__(self, transform=None):
        super().__init__("karate_club", transform=transform)

    def process(self):
        u = np.array([e[0] for e in _KARATE_EDGES] +
                     [e[1] for e in _KARATE_EDGES])
        v = np.array([e[1] for e in _KARATE_EDGES] +
                     [e[0] for e in _KARATE_EDGES])
        g = make_graph((u, v), num_nodes=34)
        label = np.array([0 if i in _KARATE_INSTRUCTOR_SIDE else 1
                          for i in range(34)], np.int32)
        g.ndata["label"] = np.ascontiguousarray(label)
        self._graph = g
        self.num_classes = 2

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class RedditDataset(DGLDataset):
    """Reddit (reference ``python/dgl/data/reddit.py``): 232,965 nodes /
    114M edges / 41 classes.  Synthetic fallback is scaled down unless
    ``full_scale=True`` (bench uses full_scale node/edge counts)."""

    def __init__(self, raw_dir=None, full_scale=False, num_nodes=None,
                 transform=None, self_loop=False):
        self._full = full_scale
        self._n_override = num_nodes
        self._self_loop = self_loop
        super().__init__("reddit", raw_dir=raw_dir, transform=transform)

    def process(self):
        from .real_loaders import reddit_files_exist, load_reddit
        if reddit_files_exist(self.raw_path, self._self_loop):
            (src, dst, feat, labels, train_mask, val_mask,
             test_mask) = load_reddit(self.raw_path, self._self_loop)
            n = feat.shape[0]
            g = make_graph((src, dst), num_nodes=n)
            g.ndata["feat"] = np.ascontiguousarray(feat)
            g.ndata["label"] = np.ascontiguousarray(labels)
            g.ndata["train_mask"] = np.ascontiguousarray(train_mask)
            g.ndata["val_mask"] = np.ascontiguousarray(val_mask)
            g.ndata["test_mask"] = np.ascontiguousarray(test_mask)
            self._graph = g
            self.num_classes = 41
            return
        npz = os.path.join(self.raw_path, "reddit.npz")
        if os.path.exists(npz):
            data = np.load(npz)
            src, dst = data["src"], data["dst"]
            feat, labels = data["feat"], data["label"]
            n = feat.shape[0]
            train_mask, val_mask, test_mask = (data["train_mask"],
                                               data["val_mask"],
                                               data["test_mask"])
        else:
            self.is_synthetic = True
            n = self._n_override or (232965 if self._full else 11648)
            deg = 492.0 if self._full else 50.0
            src, dst, feat, labels, train_mask, val_mask, test_mask = (
                planted_citation_graph(n, 41, 602 if self._full else 64,
                                       avg_degree=deg, seed=7))
        g = make_graph((src, dst), num_nodes=n)
        g.ndata["feat"] = np.ascontiguousarray(feat)
        g.ndata["label"] = np.ascontiguousarray(labels)
        g.ndata["train_mask"] = np.ascontiguousarray(train_mask)
        g.ndata["val_mask"] = np.ascontiguousarray(val_mask)
        g.ndata["test_mask"] = np.ascontiguousarray(test_mask)
        self._graph = g
        self.num_classes = 41

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class PPIDataset(DGLDataset):
    """PPI multi-label (reference ``python/dgl/data/ppi.py``): 20/2/2
    graphs, 121 labels."""

    def __init__(self, mode="train", raw_dir=None, transform=None):
        self._mode = mode
        super().__init__("ppi", raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        count = {"train": 20, "valid": 2, "test": 2}[self._mode]
        rng = np.random.default_rng({"train": 0, "valid": 1,
                                     "test": 2}[self._mode])
        self._graphs = []
        self._labels = []
        for i in range(count):
            n = int(rng.integers(500, 800))
            src, dst, feat, labels, *_ = planted_citation_graph(
                n, 8, 50, avg_degree=12.0, seed=int(rng.integers(1 << 30)))
            g = make_graph((src, dst), num_nodes=n)
            g.ndata["feat"] = np.ascontiguousarray(feat)
            lab = rng.random((n, 121)) < (0.1 + 0.1 * (labels[:, None] % 3))
            g.ndata["label"] = np.ascontiguousarray(lab.astype(np.float32))
            self._graphs.append(g)

    def __getitem__(self, idx):
        return self._g(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)


class TUDataset(DGLDataset):
    """Graph classification (reference ``python/dgl/data/tu.py``)."""

    def __init__(self, name="ENZYMES", raw_dir=None, transform=None):
        self._tu_name = name
        super().__init__(f"tu_{name}", raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        n_graphs = 120
        n_classes = 6 if self._tu_name == "ENZYMES" else 2
        gs, labels = planted_graph_classification(
            n_graphs, n_classes, feat_dim=18,
            seed=hash(self._tu_name) % 2 ** 31)
        self._graphs = []
        for row, col, feat in gs:
            g = make_graph((row, col), num_nodes=feat.shape[0])
            g.ndata["feat"] = np.ascontiguousarray(feat)
            self._graphs.append(g)
        self._labels = np.ascontiguousarray(labels)
        self.num_classes = n_classes

    def __getitem__(self, idx):
        return self._g(self._graphs[idx]), self._labels[idx]

    def __len__(self):
        return len(self._graphs)

    @property
    def num_labels(self):
        return self.num_classes


class GINDataset(TUDataset):
    """Reference ``python/dgl/data/gindt.py`` (degree-as-feature option)."""

    def __init__(self, name="MUTAG", self_loop=False, raw_dir=None,
                 transform=None):
        super().__init__(name=name, raw_dir=raw_dir, transform=transform)


class FB15k237Dataset(DGLDataset):
    """Knowledge-graph link prediction (reference
    ``python/dgl/data/knowledge_graph.py``)."""

    def __init__(self, raw_dir=None, reverse=True, transform=None):
        self._reverse = reverse
        super().__init__("FB15k-237", raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        n, r, e = 2000, 37, 20000
        src, rel, dst, _ = planted_knowledge_graph(n, r, e, seed=15)
        num_train = int(0.8 * e)
        num_valid = int(0.1 * e)
        g = make_graph((src, dst), num_nodes=n)
        g.edata["etype"] = np.ascontiguousarray(rel)
        mask = np.zeros(e, np.int32)
        mask[:num_train] = 1
        g.edata["train_mask"] = np.ascontiguousarray(mask == 1)
        val = np.zeros(e, bool); val[num_train:num_train + num_valid] = True
        g.edata["val_mask"] = np.ascontiguousarray(val)
        tst = np.zeros(e, bool); tst[num_train + num_valid:] = True
        g.edata["test_mask"] = np.ascontiguousarray(tst)
        self._graph = g
        self.num_rels = r * (2 if self._reverse else 1)

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class _EntityDataset(DGLDataset):
    """RDF entity-classification sets aifb/mutag/bgs/am (reference
    ``python/dgl/data/rdf.py``): hetero graph + train/test on one
    category ntype."""

    _SIZES = {"aifb": (4, 90, 8285), "mutag": (2, 46, 27163)}

    def __init__(self, name, raw_dir=None, transform=None, insert_reverse=True):
        self._insert_reverse = insert_reverse
        super().__init__(name, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        c, r, n = self._SIZES.get(self.name, (4, 50, 5000))
        n = min(n, 4000)
        src, rel, dst, cluster = planted_knowledge_graph(
            n, r, n * 6, seed=hash(self.name) % 2 ** 31)
        data_dict = {}
        for rr in range(r):
            m = rel == rr
            if m.sum() == 0:
                continue
            data_dict[("_N", f"rel{rr}", "_N")] = (src[m], dst[m])
            if self._insert_reverse:
                data_dict[("_N", f"rev-rel{rr}", "_N")] = (dst[m], src[m])
        g = make_hetero(data_dict, num_nodes_dict={"_N": n})
        labels = (cluster % c).astype(np.int32)
        rng = np.random.default_rng(0)
        idx = rng.permutation(n)[:400]
        train_idx = idx[:320]
        test_idx = idx[320:]
        train_mask = np.zeros(n, bool); train_mask[train_idx] = True
        test_mask = np.zeros(n, bool); test_mask[test_idx] = True
        g.nodes["_N"].data["label"] = np.ascontiguousarray(labels)
        g.nodes["_N"].data["train_mask"] = np.ascontiguousarray(train_mask)
        g.nodes["_N"].data["test_mask"] = np.ascontiguousarray(test_mask)
        self._graph = g
        self.num_classes = c
        self.predict_category = "_N"

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class AIFBDataset(_EntityDataset):
    def __init__(self, **kw):
        super().__init__("aifb", **kw)


class MUTAGDataset(_EntityDataset):
    def __init__(self, **kw):
        super().__init__("mutag", **kw)


class CSVDataset(DGLDataset):
    """Load a dataset described by nodes/edges CSV files (reference
    ``python/dgl/data/csv_dataset.py``): ``data_path`` containing
    ``nodes.csv`` (node_id[,feat,label,...]) and ``edges.csv``
    (src_id,dst_id[,feat,...]); feat columns are comma-joined floats."""

    def __init__(self, data_path, transform=None):
        self._data_path = data_path
        super().__init__("csv", raw_dir=data_path, transform=transform)

    @staticmethod
    def _parse_feat(s):
        return np.array([float(t) for t in s.split(",")], np.float32)

    def process(self):
        nodes_file = os.path.join(self._data_path, "nodes.csv")
        edges_file = os.path.join(self._data_path, "edges.csv")
        with open(nodes_file) as f:
            rows = list(csv.DictReader(f))
        n = len(rows)
        feats, labels = [], []
        for row in rows:
            if "feat" in row:
                feats.append(self._parse_feat(row["feat"]))
            if "label" in row:
                labels.append(int(row["label"]))
        with open(edges_file) as f:
            erows = list(csv.DictReader(f))
        src = np.array([int(r["src_id"]) for r in erows], np.int32)
        dst = np.array([int(r["dst_id"]) for r in erows], np.int32)
        g = make_graph((src, dst), num_nodes=n)
        if feats:
            g.ndata["feat"] = np.ascontiguousarray(np.stack(feats))
        if labels:
            g.ndata["label"] = np.ascontiguousarray(np.array(labels, np.int32))
        efeats = [self._parse_feat(r["feat"]) for r in erows
                  if "feat" in r]
        if len(efeats) == len(erows) and efeats:
            g.edata["feat"] = np.ascontiguousarray(np.stack(efeats))
        self._graphs = [g]

    def __getitem__(self, idx):
        return self._g(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)


# ---------------------------------------------------------------------------
# adapters (reference ``python/dgl/data/adapter.py``)
# ---------------------------------------------------------------------------


class AsNodePredDataset:
    """Wrap any dataset into node-prediction form with
    train/val/test_idx (reference ``adapter.py AsNodePredDataset``);
    also adapts OGB-style ``(graph, labels)`` datasets."""

    def __init__(self, dataset, split_ratio=None, target_ntype=None):
        if hasattr(dataset, "__getitem__") and hasattr(dataset, "num_classes"):
            g = dataset[0]
            if isinstance(g, tuple):
                g, labels = g
                g.ndata["label"] = np.ascontiguousarray(labels).reshape(-1)
            self.g = g
            self.num_classes = dataset.num_classes
        else:
            raise TypeError("unsupported dataset")
        nd = (self.g.nodes[target_ntype].data if target_ntype
              else self.g.ndata)
        if "train_mask" in nd:
            self.train_idx = jnp.nonzero(np.asarray(nd["train_mask"]))[0]
            self.val_idx = jnp.nonzero(np.asarray(nd["val_mask"]))[0]
            self.test_idx = jnp.nonzero(np.asarray(nd["test_mask"]))[0]
        else:
            n = self.g.num_nodes(target_ntype)
            ratio = split_ratio or [0.8, 0.1, 0.1]
            perm = np.random.default_rng(0).permutation(n)
            a = int(ratio[0] * n); b = int((ratio[0] + ratio[1]) * n)
            self.train_idx = np.ascontiguousarray(perm[:a], jnp.int32)
            self.val_idx = np.ascontiguousarray(perm[a:b], jnp.int32)
            self.test_idx = np.ascontiguousarray(perm[b:], jnp.int32)

    def __getitem__(self, idx):
        assert idx == 0
        return self.g

    def __len__(self):
        return 1


class AsLinkPredDataset:
    """Link-prediction adapter (reference ``adapter.py
    AsLinkPredDataset``): splits edges into train/val/test with sampled
    negatives."""

    def __init__(self, dataset, split_ratio=(0.8, 0.1, 0.1),
                 neg_ratio=1):
        g = dataset[0]
        if isinstance(g, tuple):
            g = g[0]
        E = g.num_edges()
        rng = np.random.default_rng(0)
        perm = rng.permutation(E)
        a = int(split_ratio[0] * E)
        b = int((split_ratio[0] + split_ratio[1]) * E)
        row, col = (np.asarray(x) for x in g.unit().coo())
        from ..graph.subgraph import edge_subgraph
        self.train_graph = edge_subgraph(g, perm[:a], relabel_nodes=False)
        n = g.num_nodes()

        def make_pairs(eids):
            pos = (row[eids], col[eids])
            k = len(eids) * neg_ratio
            neg = (rng.integers(0, n, k).astype(np.int64),
                   rng.integers(0, n, k).astype(np.int64))
            return pos, neg
        self.val_edges = make_pairs(perm[a:b])
        self.test_edges = make_pairs(perm[b:])
        self.g = g

    def __getitem__(self, idx):
        assert idx == 0
        return self.train_graph

    def __len__(self):
        return 1


class AsGraphPredDataset:
    """Graph-property-prediction adapter (reference ``adapter.py``)."""

    def __init__(self, dataset, split_ratio=(0.8, 0.1, 0.1)):
        self.dataset = dataset
        n = len(dataset)
        perm = np.random.default_rng(0).permutation(n)
        a = int(split_ratio[0] * n)
        b = int((split_ratio[0] + split_ratio[1]) * n)
        self.train_idx = perm[:a]
        self.val_idx = perm[a:b]
        self.test_idx = perm[b:]
        self.num_classes = getattr(dataset, "num_classes", None)

    def __getitem__(self, idx):
        return self.dataset[idx]

    def __len__(self):
        return len(self.dataset)
