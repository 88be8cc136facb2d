"""Out-of-core partitioning of a chunked graph (reference
``tools/distpartitioning/``: ParMETIS pre/post + gloo data shuffle,
8.2k LoC — here a single-host streaming pipeline with bounded memory).

Pipeline:
1. assignment — streaming Fennel over edge chunks (degree-penalized
   greedy; the out-of-core stand-in for ParMETIS) or 'random';
2. reshuffle — nodes to partition-major contiguous ranges (the
   RangePartitionBook contract);
3. dispatch — stream edge chunks once more, appending each edge to its
   owner partition's buffers; then split features chunk-wise.

Output is exactly ``distributed.partition_graph``'s on-disk layout, so
``load_partition`` / ``DistGraphServer`` consume it unchanged.
"""
from __future__ import annotations

import json
import os

import numpy as np


def _stream_assignment(chunk_dir: str, meta, num_parts: int,
                       max_degree_nodes: int = 1 << 22):
    """Streaming-Fennel node assignment: one pass to count degrees, one
    pass to greedily assign in chunk order."""
    N = meta["num_nodes"]
    deg = np.zeros(N, np.int64)
    for i in range(meta["num_chunks"]):
        e = np.load(os.path.join(chunk_dir, "edges", f"chunk{i}.npy"))
        np.add.at(deg, e[0], 1)
        np.add.at(deg, e[1], 1)
    part = np.full(N, -1, np.int32)
    sizes = np.zeros(num_parts, np.int64)
    cap = int(1.1 * N / num_parts) + 1
    # affinity accumulators: per-node count of neighbors already in part p
    aff = np.zeros((N, num_parts), np.float32) if N * num_parts < 2e8 \
        else None
    order_seen = []
    for i in range(meta["num_chunks"]):
        e = np.load(os.path.join(chunk_dir, "edges", f"chunk{i}.npy"))
        for u in np.unique(np.concatenate([e[0], e[1]])):
            if part[u] != -1:
                continue
            if aff is not None:
                score = aff[u] - sizes / cap
            else:
                score = -sizes / cap
            score[sizes >= cap] = -np.inf
            p = int(np.argmax(score))
            part[u] = p
            sizes[p] += 1
            order_seen.append(u)
        if aff is not None:
            # update affinities with this chunk's edges
            known = part[e[0]] >= 0
            aff[e[1][known], part[e[0][known]]] += 1.0
            known = part[e[1]] >= 0
            aff[e[0][known], part[e[1][known]]] += 1.0
    un = part == -1
    if un.any():
        part[un] = np.argmin(sizes)
    return part


def dispatch_data(chunk_dir: str, num_parts: int, out_dir: str,
                  part_method: str = "fennel", graph_name: str = None):
    with open(os.path.join(chunk_dir, "metadata.json")) as f:
        meta = json.load(f)
    name = graph_name or meta["graph_name"]
    N, E, K = meta["num_nodes"], meta["num_edges"], meta["num_chunks"]
    if part_method == "random":
        part = np.random.default_rng(0).integers(
            0, num_parts, N).astype(np.int32)
    else:
        part = _stream_assignment(chunk_dir, meta, num_parts)

    # reshuffle: partition-major contiguous node ids
    order = np.argsort(part, kind="stable")          # new -> old
    inv = np.empty(N, np.int64)
    inv[order] = np.arange(N)
    counts = np.bincount(part, minlength=num_parts)
    node_ranges = np.zeros((num_parts, 2), np.int64)
    node_ranges[:, 1] = np.cumsum(counts)
    node_ranges[1:, 0] = node_ranges[:-1, 1]

    # pass 1 over chunks: count edges per partition (dst-owner rule)
    e_counts = np.zeros(num_parts, np.int64)
    for i in range(K):
        e = np.load(os.path.join(chunk_dir, "edges", f"chunk{i}.npy"))
        owner = part[e[1]]
        e_counts += np.bincount(owner, minlength=num_parts)
    edge_ranges = np.zeros((num_parts, 2), np.int64)
    edge_ranges[:, 1] = np.cumsum(e_counts)
    edge_ranges[1:, 0] = edge_ranges[:-1, 1]

    # pass 2: stream-append edges (global new ids) per partition
    os.makedirs(out_dir, exist_ok=True)
    bufs = {p: [] for p in range(num_parts)}      # (new_src,new_dst,old_eid)
    eid_base = 0
    for i in range(K):
        e = np.load(os.path.join(chunk_dir, "edges", f"chunk{i}.npy"))
        old_eid = np.arange(eid_base, eid_base + e.shape[1])
        eid_base += e.shape[1]
        ns, nd = inv[e[0]], inv[e[1]]
        owner = part[e[1]]
        for p in range(num_parts):
            sel = owner == p
            if sel.any():
                bufs[p].append(np.stack([ns[sel], nd[sel],
                                         old_eid[sel]]))

    node_feat_names = meta["node_feats"]
    edge_feat_names = meta["edge_feats"]
    # global new-eid assignment: partition-major in stream order
    e_cursor = edge_ranges[:, 0].copy()
    e_order_global = np.empty(E, np.int64)  # new eid -> old eid
    for p in range(num_parts):
        all_e = np.concatenate(bufs[p], axis=1) if bufs[p] else \
            np.zeros((3, 0), np.int64)
        n_e = all_e.shape[1]
        e_order_global[e_cursor[p]:e_cursor[p] + n_e] = all_e[2]
        nb, ne = node_ranges[p]
        owned_new = np.arange(nb, ne)
        halo = np.setdiff1d(np.unique(all_e[0]), owned_new)
        local_nodes_new = np.concatenate([owned_new, halo])
        lmap = {int(gg): j for j, gg in enumerate(local_nodes_new)}
        lrow = np.fromiter((lmap[int(s)] for s in all_e[0]), np.int64,
                           n_e)
        lcol = all_e[1] - nb
        part_dir = os.path.join(out_dir, f"part{p}")
        os.makedirs(part_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(part_dir, "graph.npz"),
            row=lrow.astype(np.int32), col=lcol.astype(np.int32),
            orig_nid=order[local_nodes_new].astype(np.int64),
            global_nid=local_nodes_new.astype(np.int64),
            global_eid=np.arange(e_cursor[p], e_cursor[p] + n_e,
                                 dtype=np.int64),
            inner_node=(np.arange(len(local_nodes_new)) <
                        len(owned_new)),
            num_local_nodes=np.int64(len(local_nodes_new)))
        # features: gather rows chunk-by-chunk (bounded memory per chunk)
        nf = {}
        old_ids = order[local_nodes_new]
        for fname in node_feat_names:
            nf[fname] = _gather_chunked(
                chunk_dir, "node_feat", fname,
                meta["node_chunk_sizes"], old_ids)
        np.savez_compressed(os.path.join(part_dir, "node_feats.npz"),
                            **nf)
        ef = {}
        for fname in edge_feat_names:
            ef[fname] = _gather_chunked(
                chunk_dir, "edge_feat", fname,
                meta["edge_chunk_sizes"], all_e[2])
        np.savez_compressed(os.path.join(part_dir, "edge_feats.npz"),
                            **ef)

    cfg = {
        "graph_name": name,
        "num_parts": num_parts,
        "part_method": part_method,
        "num_hops": 1,
        "num_nodes": int(N),
        "num_edges": int(E),
        "node_map": {"_N": node_ranges.tolist()},
        "edge_map": {"_N:_E:_N": edge_ranges.tolist()},
        "ntypes": {"_N": 0},
        "etypes": {"_N:_E:_N": 0},
    }
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return order, e_order_global


def _gather_chunked(chunk_dir, kind, fname, chunk_sizes, ids):
    """rows[ids] where rows live in per-chunk files — loads one chunk at
    a time."""
    offsets = np.concatenate([[0], np.cumsum(chunk_sizes)])
    ids = np.asarray(ids)
    out = None
    for i, (lo, hi) in enumerate(zip(offsets[:-1], offsets[1:])):
        sel = (ids >= lo) & (ids < hi)
        if not sel.any():
            continue
        arr = np.load(os.path.join(chunk_dir, kind,
                                   f"{fname}_chunk{i}.npy"))
        if out is None:
            out = np.empty((len(ids),) + arr.shape[1:], arr.dtype)
        out[sel] = arr[ids[sel] - lo]
    if out is None:
        out = np.zeros((len(ids), 0), np.float32)
    return out
