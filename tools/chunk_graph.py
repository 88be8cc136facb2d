"""Chunked on-disk graph format (reference ``tools/chunk_graph.py``):
split a graph's edges and features into K chunk files + metadata.json so
downstream partitioning streams one chunk at a time (out-of-core).

Layout: <out>/metadata.json, edges/chunk{i}.npy ((2, e_i) int64),
node_feat/<name>_chunk{i}.npy, edge_feat/<name>_chunk{i}.npy.
"""
from __future__ import annotations

import json
import os

import numpy as np


def chunk_graph(g, name: str, ndata_paths: dict, edata_paths: dict,
                num_chunks: int, output_path: str):
    """``g`` is a dgl_tpu Graph; ndata/edata_paths select feature names
    (reference signature takes file paths; arrays here)."""
    os.makedirs(output_path, exist_ok=True)
    row, col = (np.asarray(a) for a in g.unit().coo())
    E, N = len(row), g.num_nodes()
    os.makedirs(os.path.join(output_path, "edges"), exist_ok=True)
    e_bounds = np.linspace(0, E, num_chunks + 1).astype(np.int64)
    n_bounds = np.linspace(0, N, num_chunks + 1).astype(np.int64)
    for i in range(num_chunks):
        lo, hi = e_bounds[i], e_bounds[i + 1]
        np.save(os.path.join(output_path, "edges", f"chunk{i}.npy"),
                np.stack([row[lo:hi], col[lo:hi]]))
    for kind, names, bounds in (("node_feat", ndata_paths, n_bounds),
                                ("edge_feat", edata_paths, e_bounds)):
        d = os.path.join(output_path, kind)
        os.makedirs(d, exist_ok=True)
        frames = g._node_frames[0] if kind == "node_feat" else \
            g._edge_frames[0]
        for fname in names:
            arr = np.asarray(frames[fname])
            for i in range(num_chunks):
                np.save(os.path.join(d, f"{fname}_chunk{i}.npy"),
                        arr[bounds[i]:bounds[i + 1]])
    meta = {
        "graph_name": name,
        "num_nodes": int(N),
        "num_edges": int(E),
        "num_chunks": int(num_chunks),
        "edge_chunk_sizes": np.diff(e_bounds).tolist(),
        "node_chunk_sizes": np.diff(n_bounds).tolist(),
        "node_feats": list(ndata_paths),
        "edge_feats": list(edata_paths),
    }
    with open(os.path.join(output_path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def chunk_ondisk_dataset(dataset_path: str, num_chunks: int,
                         output_path: str, graph_name: str = None):
    """Ingest a GraphBolt OnDiskDataset (``metadata.yaml`` layout,
    reference ``graphbolt/impl/ondisk_dataset.py:358``) into the chunked
    format, streaming via memory maps — the entry point for partitioning
    ogbn-scale on-disk datasets without loading them whole.

    Node features = ``feature_data`` specs with domain "node"; edge
    features = domain "edge".  Edge order follows the on-disk edge list.
    """
    import yaml
    with open(os.path.join(dataset_path, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    name = graph_name or meta.get("dataset_name", "ondisk")

    edges_spec = meta["graph"]["edges"][0]
    epath = os.path.join(dataset_path, edges_spec["path"])
    if epath.endswith(".npy"):
        pairs = np.load(epath, mmap_mode="r")
    else:
        pairs = np.loadtxt(epath, delimiter=",", dtype=np.int64)
    if pairs.ndim == 1:
        pairs = pairs.reshape(-1, 2)
    # (E, 2) rows or (2, E) columns — normalize to rows (E, 2)
    if pairs.shape[0] == 2 and pairs.shape[1] != 2:
        pairs = pairs.T
    E = pairs.shape[0]
    N = meta["graph"]["nodes"][0]["num"]

    os.makedirs(os.path.join(output_path, "edges"), exist_ok=True)
    e_bounds = np.linspace(0, E, num_chunks + 1).astype(np.int64)
    n_bounds = np.linspace(0, N, num_chunks + 1).astype(np.int64)
    for i in range(num_chunks):
        lo, hi = e_bounds[i], e_bounds[i + 1]
        block = np.asarray(pairs[lo:hi])
        np.save(os.path.join(output_path, "edges", f"chunk{i}.npy"),
                np.stack([block[:, 0], block[:, 1]]).astype(np.int64))

    node_feats, edge_feats = [], []
    for spec in meta.get("feature_data", []):
        fname = spec["name"]
        domain = spec["domain"]
        fpath = os.path.join(dataset_path, spec["path"])
        arr = np.load(fpath, mmap_mode="r")
        kind, bounds, names = (
            ("node_feat", n_bounds, node_feats) if domain == "node"
            else ("edge_feat", e_bounds, edge_feats))
        d = os.path.join(output_path, kind)
        os.makedirs(d, exist_ok=True)
        for i in range(num_chunks):
            np.save(os.path.join(d, f"{fname}_chunk{i}.npy"),
                    np.asarray(arr[bounds[i]:bounds[i + 1]]))
        names.append(fname)

    out_meta = {
        "graph_name": name,
        "num_nodes": int(N),
        "num_edges": int(E),
        "num_chunks": int(num_chunks),
        "edge_chunk_sizes": np.diff(e_bounds).tolist(),
        "node_chunk_sizes": np.diff(n_bounds).tolist(),
        "node_feats": node_feats,
        "edge_feats": edge_feats,
    }
    with open(os.path.join(output_path, "metadata.json"), "w") as f:
        json.dump(out_meta, f, indent=2)
    return out_meta
