"""OnDiskDataset: metadata.yaml-described datasets (reference
``python/dgl/graphbolt/impl/ondisk_dataset.py:358-600``).

Layout::

    <root>/metadata.yaml
    <root>/<paths referenced within>

metadata.yaml schema (subset of the reference's):

    dataset_name: foo
    graph:
      nodes: [{num: N}]
      edges: [{path: edges.csv | edges.npy}]   # (src, dst) pairs
    feature_data:
      - {domain: node, name: feat, path: feat.npy, in_memory: true}
    tasks:
      - name: node_classification
        num_classes: C
        train_set: [{name: seeds, path: train.npy}, ...]
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .itemset import ItemSet
from .sampling_graph import CSCSamplingGraph
from .feature_store import (
    ArrayFeature,
    BasicFeatureStore,
    DiskBasedFeature,
)


def _load_array(root, path):
    full = os.path.join(root, path)
    if full.endswith(".npy"):
        return np.load(full)
    if full.endswith(".csv"):
        return np.loadtxt(full, delimiter=",", dtype=np.int64)
    raise ValueError(f"unsupported file {path}")


class OnDiskTask:
    def __init__(self, metadata, train_set, validation_set, test_set):
        self.metadata = metadata
        self.train_set = train_set
        self.validation_set = validation_set
        self.test_set = test_set


class OnDiskDataset:
    def __init__(self, path: str, include_original_edge_id: bool = False):
        self._root = path
        import yaml
        with open(os.path.join(path, "metadata.yaml")) as f:
            self._meta = yaml.safe_load(f)
        self._graph = None
        self._feature = None
        self._tasks = None

    def load(self):
        meta = self._meta
        # graph: build CSC from edge list
        edges_spec = meta["graph"]["edges"][0]
        pairs = _load_array(self._root, edges_spec["path"])
        if pairs.ndim == 1:
            pairs = pairs.reshape(-1, 2)
        num_nodes = meta["graph"]["nodes"][0]["num"]
        src, dst = pairs[:, 0], pairs[:, 1]
        order = np.argsort(dst, kind="stable")
        indptr = np.searchsorted(dst[order], np.arange(num_nodes + 1))
        self._graph = CSCSamplingGraph(indptr, src[order])
        self._graph._orig_eids = order

        feats = {}
        for spec in meta.get("feature_data", []):
            loader = (ArrayFeature(_load_array(self._root, spec["path"]))
                      if spec.get("in_memory", True)
                      else DiskBasedFeature(
                          os.path.join(self._root, spec["path"])))
            feats[(spec["domain"], spec.get("type"), spec["name"])] = loader
        self._feature = BasicFeatureStore(feats)

        self._tasks = []
        for t in meta.get("tasks", []):
            def load_set(key):
                if key not in t:
                    return None
                arrays = []
                names = []
                for item in t[key]:
                    arrays.append(_load_array(self._root, item["path"]))
                    names.append(item.get("name", "seeds"))
                return ItemSet(tuple(arrays), names=tuple(names))
            self._tasks.append(OnDiskTask(
                {k: v for k, v in t.items()
                 if k not in ("train_set", "validation_set", "test_set")},
                load_set("train_set"), load_set("validation_set"),
                load_set("test_set")))
        return self

    @property
    def graph(self) -> CSCSamplingGraph:
        return self._graph

    @property
    def feature(self) -> BasicFeatureStore:
        return self._feature

    @property
    def tasks(self) -> List[OnDiskTask]:
        return self._tasks

    @property
    def dataset_name(self):
        return self._meta.get("dataset_name", "ondisk")


class BuiltinDataset:
    """Named synthetic datasets in graphbolt form (zero-egress stand-in for
    ``gb.BuiltinDataset`` downloads)."""

    def __init__(self, name: str, root: str = "/tmp/dgl_tpu_gb"):
        from ..data import CoraGraphDataset, RedditDataset
        ds = {"cora": CoraGraphDataset, "reddit": RedditDataset}[name]()
        g = ds[0]
        from .sampling_graph import from_dglgraph
        self._graph = from_dglgraph(g)
        feats = {("node", None, "feat"):
                 ArrayFeature(np.asarray(g.ndata["feat"])),
                 ("node", None, "label"):
                 ArrayFeature(np.asarray(g.ndata["label"]))}
        self._feature = BasicFeatureStore(feats)
        train = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
        val = np.nonzero(np.asarray(g.ndata["val_mask"]))[0]
        test = np.nonzero(np.asarray(g.ndata["test_mask"]))[0]
        labels = np.asarray(g.ndata["label"])
        self._tasks = [OnDiskTask(
            {"name": "node_classification",
             "num_classes": ds.num_classes},
            ItemSet((train, labels[train]), names=("seeds", "labels")),
            ItemSet((val, labels[val]), names=("seeds", "labels")),
            ItemSet((test, labels[test]), names=("seeds", "labels")))]

    def load(self):
        return self

    @property
    def graph(self):
        return self._graph

    @property
    def feature(self):
        return self._feature

    @property
    def tasks(self):
        return self._tasks
