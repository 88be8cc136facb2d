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
    """Partition + reshuffle + write to disk.

    Heterographs are flattened through ``to_homogeneous`` (the reference
    does the same, ``distributed/partition.py:807``); the reshuffle
    sorts nodes by (partition, ntype) and edges by (partition, etype) so
    every (partition, type) slice is one contiguous global-id range —
    the ``node_map``/``edge_map`` per-type range contract of SURVEY
    Appendix B.  Per-type features are stored as ``"<type>/<field>"``."""
    from ..graph.graph import NTYPE, ETYPE
    hetero = not g.is_homogeneous
    if hetero:
        from ..convert_hetero import to_homogeneous
        hg = to_homogeneous(g, ndata=[], edata=[], store_type=True)
        ntype_arr = np.asarray(hg.ndata[NTYPE], np.int64)
        etype_arr = np.asarray(hg.edata[ETYPE], np.int64)
        pt_nid = np.asarray(hg.ndata[NID], np.int64)
        pt_eid = np.asarray(hg.edata[EID], np.int64)
        ntypes = list(g.ntypes)
        cetypes = [":".join(c) for c in g.canonical_etypes]
        node_frames = {i: g._node_frames[i] for i in range(len(ntypes))}
        edge_frames = {i: g._edge_frames[i] for i in range(len(cetypes))}
        work = hg
    else:
        ntypes, cetypes = ["_N"], ["_N:_E:_N"]
        work = g
        ntype_arr = np.zeros(g.num_nodes(), np.int64)
        etype_arr = np.zeros(g.num_edges(), np.int64)
        pt_nid = np.arange(g.num_nodes(), dtype=np.int64)
        pt_eid = np.arange(g.num_edges(), dtype=np.int64)
        node_frames = {0: g._node_frames[0]}
        edge_frames = {0: g._edge_frames[0]}
    NT, ET = len(ntypes), len(cetypes)
    n = work.num_nodes()
    if part_method == "metis":
        parts = np.asarray(metis_partition_assignment(work, num_parts))
    elif part_method == "random":
        parts = np.asarray(random_partition_assignment(work, num_parts))
    else:
        raise ValueError(part_method)

    # reshuffle node ids: (partition, ntype)-major contiguous ranges
    order = np.lexsort((ntype_arr, parts))        # new -> old
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)                     # old -> new
    counts = np.bincount(parts, minlength=num_parts)
    node_ranges = np.zeros((num_parts, 2), np.int64)
    node_ranges[:, 1] = np.cumsum(counts)
    node_ranges[1:, 0] = node_ranges[:-1, 1]
    # per-(partition, ntype) ranges
    pt_counts = np.bincount(parts * NT + ntype_arr,
                            minlength=num_parts * NT
                            ).reshape(num_parts, NT)
    pt_ends = node_ranges[:, 0:1] + np.cumsum(pt_counts, axis=1)
    pt_starts = pt_ends - pt_counts
    node_map = {nt: np.stack([pt_starts[:, t], pt_ends[:, t]],
                             axis=1).tolist()
                for t, nt in enumerate(ntypes)}

    row, col = (np.asarray(a) for a in work.unit().coo())
    new_row, new_col = inv[row], inv[col]
    # edges owned by dst partition; (partition, etype)-major eids
    e_owner = np.searchsorted(node_ranges[:, 1], new_col, side="right")
    e_order = np.lexsort((etype_arr, e_owner))    # new eid -> old eid
    e_counts = np.bincount(e_owner, minlength=num_parts)
    edge_ranges = np.zeros((num_parts, 2), np.int64)
    edge_ranges[:, 1] = np.cumsum(e_counts)
    edge_ranges[1:, 0] = edge_ranges[:-1, 1]
    et_counts = np.bincount(e_owner * ET + etype_arr,
                            minlength=num_parts * ET
                            ).reshape(num_parts, ET)
    et_ends = edge_ranges[:, 0:1] + np.cumsum(et_counts, axis=1)
    et_starts = et_ends - et_counts
    edge_map = {cet: np.stack([et_starts[:, t], et_ends[:, t]],
                              axis=1).tolist()
                for t, cet in enumerate(cetypes)}

    os.makedirs(out_path, exist_ok=True)
    meta = {
        "graph_name": graph_name,
        "num_parts": num_parts,
        "part_method": part_method,
        "num_hops": num_hops,
        "num_nodes": int(n),
        "num_edges": int(len(row)),
        "node_map": node_map,
        "edge_map": edge_map,
        "ntypes": {nt: i for i, nt in enumerate(ntypes)},
        "etypes": {cet: i for i, cet in enumerate(cetypes)},
    }

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
        remap = np.full(n, -1, np.int64)
        remap[local_nodes_new] = np.arange(len(local_nodes_new))
        lrow = remap[my_row_new]
        lcol = my_col_new - nb
        old_node_ids = order[local_nodes_new]
        np.savez_compressed(
            os.path.join(part_dir, "graph.npz"),
            row=lrow.astype(np.int32), col=lcol.astype(np.int32),
            orig_nid=old_node_ids.astype(np.int64),
            global_nid=local_nodes_new.astype(np.int64),
            global_eid=np.arange(eb, ee, dtype=np.int64),
            inner_node=(np.arange(len(local_nodes_new)) <
                        len(owned_new_nodes)),
            num_local_nodes=np.int64(len(local_nodes_new)),
            ntype=ntype_arr[old_node_ids].astype(np.int32),
            etype=etype_arr[my_eids_old].astype(np.int32),
            per_type_nid=pt_nid[old_node_ids].astype(np.int64),
            per_type_eid=pt_eid[my_eids_old].astype(np.int64))
        nfeats, efeats = {}, {}
        local_nt = ntype_arr[old_node_ids]
        for t, nt in enumerate(ntypes):
            rows = pt_nid[old_node_ids[local_nt == t]]
            for k, v in node_frames[t].items():
                key = f"{nt}/{k}" if hetero else k
                nfeats[key] = np.asarray(v)[rows]
        local_et = etype_arr[my_eids_old]
        for t, cet in enumerate(cetypes):
            rows = pt_eid[my_eids_old[local_et == t]]
            for k, v in edge_frames[t].items():
                key = f"{cet}/{k}" if hetero else k
                efeats[key] = np.asarray(v)[rows]
        np.savez_compressed(os.path.join(part_dir, "node_feats.npz"),
                            **nfeats)
        np.savez_compressed(os.path.join(part_dir, "edge_feats.npz"),
                            **efeats)

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
    if "ntype" in data.files:       # hetero-flattened partitions
        from ..graph.graph import NTYPE, ETYPE
        sg.ndata[NTYPE] = data["ntype"].astype(np.int32)
        sg.edata[ETYPE] = data["etype"].astype(np.int32)
        sg.ndata["per_type_id"] = data["per_type_nid"].astype(np.int32)
        sg.edata["per_type_id"] = data["per_type_eid"].astype(np.int32)
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
