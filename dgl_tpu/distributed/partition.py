"""Offline graph partitioning to disk (reference
``python/dgl/distributed/partition.py:648 partition_graph``).

On-disk layout mirrors the reference contract (SURVEY Appendix B):
``<out>/<name>.json`` metadata with per-type ``node_map``/``edge_map``
contiguous ranges after reshuffle, plus ``part{p}/graph.npz`` +
``part{p}/node_feats.npz`` + ``part{p}/edge_feats.npz``.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, NID, EID
from ..graph.convert import graph as make_graph
from ..partition import (
    metis_partition_assignment,
    random_partition_assignment,
    partition_graph_with_halo,
)
from .graph_partition_book import RangePartitionBook


def partition_graph(g: Graph, graph_name: str, num_parts: int, out_path: str,
                    num_hops: int = 1, part_method: str = "metis",
                    balance_ntypes=None, balance_edges: bool = False,
                    return_mapping: bool = False):
    """Partition + reshuffle + write to disk."""
    if not g.is_homogeneous:
        raise NotImplementedError(
            "hetero partitioning lands with the dist training path; "
            "use to_homogeneous first")
    n = g.num_nodes()
    if part_method == "metis":
        parts = np.asarray(metis_partition_assignment(g, num_parts))
    elif part_method == "random":
        parts = np.asarray(random_partition_assignment(g, num_parts))
    else:
        raise ValueError(part_method)

    # reshuffle node ids: partition-major contiguous ranges
    order = np.argsort(parts, kind="stable")      # new -> old
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)                     # old -> new
    counts = np.bincount(parts, minlength=num_parts)
    node_ranges = np.zeros((num_parts, 2), np.int64)
    node_ranges[:, 1] = np.cumsum(counts)
    node_ranges[1:, 0] = node_ranges[:-1, 1]

    row, col = (np.asarray(a) for a in g.unit().coo())
    new_row, new_col = inv[row], inv[col]
    # edges owned by dst partition; reshuffle edge ids partition-major
    e_owner = np.searchsorted(node_ranges[:, 1], new_col, side="right")
    e_order = np.argsort(e_owner, kind="stable")  # new eid -> old eid
    e_counts = np.bincount(e_owner, minlength=num_parts)
    edge_ranges = np.zeros((num_parts, 2), np.int64)
    edge_ranges[:, 1] = np.cumsum(e_counts)
    edge_ranges[1:, 0] = edge_ranges[:-1, 1]

    os.makedirs(out_path, exist_ok=True)
    meta = {
        "graph_name": graph_name,
        "num_parts": num_parts,
        "part_method": part_method,
        "num_hops": num_hops,
        "num_nodes": int(n),
        "num_edges": int(len(row)),
        "node_map": {"_N": node_ranges.tolist()},
        "edge_map": {"_N:_E:_N": edge_ranges.tolist()},
        "ntypes": {"_N": 0},
        "etypes": {"_N:_E:_N": 0},
    }

    node_feats = {k: np.asarray(v) for k, v in g._node_frames[0].items()}
    edge_feats = {k: np.asarray(v) for k, v in g._edge_frames[0].items()}

    for p in range(num_parts):
        part_dir = os.path.join(out_path, f"part{p}")
        os.makedirs(part_dir, exist_ok=True)
        nb, ne = node_ranges[p]
        eb, ee = edge_ranges[p]
        owned_new_nodes = np.arange(nb, ne)
        my_eids_old = e_order[eb:ee]
        my_row_new = new_row[my_eids_old]
        my_col_new = new_col[my_eids_old]
        # halo: src nodes outside [nb, ne)
        halo_new = np.setdiff1d(np.unique(my_row_new), owned_new_nodes)
        local_nodes_new = np.concatenate([owned_new_nodes, halo_new])
        lmap = {int(gid): i for i, gid in enumerate(local_nodes_new)}
        lrow = np.fromiter((lmap[int(x)] for x in my_row_new), np.int64,
                           len(my_row_new))
        lcol = my_col_new - nb
        np.savez_compressed(
            os.path.join(part_dir, "graph.npz"),
            row=lrow.astype(np.int32), col=lcol.astype(np.int32),
            orig_nid=order[local_nodes_new].astype(np.int64),
            global_nid=local_nodes_new.astype(np.int64),
            global_eid=np.arange(eb, ee, dtype=np.int64),
            inner_node=(np.arange(len(local_nodes_new)) <
                        len(owned_new_nodes)),
            num_local_nodes=np.int64(len(local_nodes_new)))
        old_node_ids = order[local_nodes_new]
        np.savez_compressed(
            os.path.join(part_dir, "node_feats.npz"),
            **{k: v[old_node_ids] for k, v in node_feats.items()})
        np.savez_compressed(
            os.path.join(part_dir, "edge_feats.npz"),
            **{k: v[my_eids_old] for k, v in edge_feats.items()})

    with open(os.path.join(out_path, f"{graph_name}.json"), "w") as f:
        json.dump(meta, f, indent=2)
    if return_mapping:
        return jnp.asarray(order.astype(np.int32)), jnp.asarray(
            e_order.astype(np.int32))


def load_partition(part_config: str, part_id: int):
    """Load one partition (reference ``distributed/partition.py
    load_partition``): returns (graph, node_feats, edge_feats, partition
    book, graph_name, ntypes, etypes)."""
    with open(part_config) as f:
        meta = json.load(f)
    out_path = os.path.dirname(os.path.abspath(part_config))
    part_dir = os.path.join(out_path, f"part{part_id}")
    data = np.load(os.path.join(part_dir, "graph.npz"))
    nloc = int(data["num_local_nodes"])
    sg = make_graph((data["row"], data["col"]), num_nodes=nloc)
    sg.ndata[NID] = data["global_nid"].astype(np.int32)
    sg.ndata["orig_id"] = data["orig_nid"].astype(np.int32)
    sg.ndata["inner_node"] = data["inner_node"]
    sg.edata[EID] = data["global_eid"].astype(np.int32)
    nf = dict(np.load(os.path.join(part_dir, "node_feats.npz")))
    ef = dict(np.load(os.path.join(part_dir, "edge_feats.npz")))
    book = RangePartitionBook(
        part_id, meta["num_parts"],
        {k: np.asarray(v) for k, v in meta["node_map"].items()},
        {k: np.asarray(v) for k, v in meta["edge_map"].items()},
        list(meta["ntypes"].keys()), list(meta["etypes"].keys()))
    return (sg, nf, ef, book, meta["graph_name"],
            list(meta["ntypes"].keys()), list(meta["etypes"].keys()))


def load_partition_book(part_config: str, part_id: int):
    with open(part_config) as f:
        meta = json.load(f)
    return RangePartitionBook(
        part_id, meta["num_parts"],
        {k: np.asarray(v) for k, v in meta["node_map"].items()},
        {k: np.asarray(v) for k, v in meta["edge_map"].items()},
        list(meta["ntypes"].keys()), list(meta["etypes"].keys())), \
        meta["graph_name"], list(meta["ntypes"].keys()), \
        list(meta["etypes"].keys())
