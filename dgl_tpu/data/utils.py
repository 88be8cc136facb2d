"""Data utilities: split_dataset, Subset, graph (de)serialization.

Serialization (reference ``python/dgl/data/graph_serialize.py``, C++
``src/graph/serialize/heterograph_serialize.cc:313``): graphs + labels go to
a single ``.npz``-based container — no custom binary format needed on TPU
hosts.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph
from ..graph.unitgraph import UnitGraph


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(np.asarray(indices).tolist())

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def __len__(self):
        return len(self.indices)


def split_dataset(dataset, frac_list=None, shuffle=False, random_state=None):
    """Reference ``dgl.data.utils.split_dataset``."""
    frac_list = frac_list or [0.8, 0.1, 0.1]
    n = len(dataset)
    indices = np.arange(n)
    if shuffle:
        np.random.default_rng(random_state).shuffle(indices)
    points = np.cumsum([int(f * n) for f in frac_list])
    points[-1] = n
    out = []
    start = 0
    for p in points:
        out.append(Subset(dataset, indices[start:p]))
        start = p
    return out


def save_graphs(filename: str, g_list, labels: Optional[Dict] = None):
    """Serialize graphs (+ optional label tensors) to one file."""
    if isinstance(g_list, Graph):
        g_list = [g_list]
    payload = {"num_graphs": len(g_list), "labels": {}}
    arrays = {}
    if labels:
        for k, v in labels.items():
            arrays[f"label/{k}"] = np.asarray(v)
            payload["labels"][k] = f"label/{k}"
    metas = []
    for gi, g in enumerate(g_list):
        meta = {
            "ntypes": g.ntypes,
            "canonical_etypes": [list(c) for c in g.canonical_etypes],
            "num_nodes": g._num_nodes,
            "is_block": g._is_block,
            "block_split": g._block_split,
            "node_fields": [], "edge_fields": [],
        }
        for etid, unit in enumerate(g._units):
            row, col = unit.coo()
            arrays[f"g{gi}/e{etid}/row"] = np.asarray(row)
            arrays[f"g{gi}/e{etid}/col"] = np.asarray(col)
        for nti, frame in enumerate(g._node_frames):
            for k, v in frame.items():
                arrays[f"g{gi}/nf{nti}/{k}"] = np.asarray(v)
                meta["node_fields"].append([nti, k])
        for eti, frame in enumerate(g._edge_frames):
            for k, v in frame.items():
                arrays[f"g{gi}/ef{eti}/{k}"] = np.asarray(v)
                meta["edge_fields"].append([eti, k])
        metas.append(meta)
    payload["graphs"] = metas
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    np.savez_compressed(filename, __meta__=json.dumps(payload), **arrays)
    if not filename.endswith(".npz"):
        os.replace(filename + ".npz", filename)


def load_graphs(filename: str, idx_list=None):
    """Deserialize graphs saved by :func:`save_graphs`."""
    data = np.load(filename, allow_pickle=False)
    payload = json.loads(str(data["__meta__"]))
    graphs = []
    for gi, meta in enumerate(payload["graphs"]):
        if idx_list is not None and gi not in idx_list:
            continue
        units = []
        cets = [tuple(c) for c in meta["canonical_etypes"]]
        ntypes = meta["ntypes"]
        nn = meta["num_nodes"]
        # src/dst sizes per etype
        for etid, cet in enumerate(cets):
            row = data[f"g{gi}/e{etid}/row"]
            col = data[f"g{gi}/e{etid}/col"]
            if meta["block_split"] is not None:
                split = meta["block_split"]
                s_idx = ntypes[:split].index(cet[0])
                d_idx = split + ntypes[split:].index(cet[2])
            else:
                s_idx = ntypes.index(cet[0])
                d_idx = ntypes.index(cet[2])
            units.append(UnitGraph.from_coo(nn[s_idx], nn[d_idx], row, col))
        g = Graph(ntypes, cets, nn, units, is_block=meta["is_block"],
                  block_split=meta["block_split"])
        for nti, k in meta["node_fields"]:
            g._node_frames[nti][k] = jnp.asarray(data[f"g{gi}/nf{nti}/{k}"])
        for eti, k in meta["edge_fields"]:
            g._edge_frames[eti][k] = jnp.asarray(data[f"g{gi}/ef{eti}/{k}"])
        graphs.append(g)
    labels = {k: jnp.asarray(data[v])
              for k, v in payload["labels"].items()}
    return graphs, labels
