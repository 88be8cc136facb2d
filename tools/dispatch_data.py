"""Out-of-core partitioning of a chunked graph (reference
``tools/distpartitioning/``: ParMETIS pre/post + gloo data shuffle,
8.2k LoC — here a streaming pipeline with bounded memory and optional
multi-process dispatch).

Pipeline:
1. assignment — streaming Fennel over edge chunks (degree-penalized
   greedy; the out-of-core stand-in for ParMETIS) or 'random';
2. reshuffle — nodes to partition-major contiguous ranges (the
   RangePartitionBook contract);
3. dispatch — each partition's writer streams the edge chunks,
   selecting its own edges (dst-owner rule), remaps to local ids, and
   gathers its feature rows chunk-by-chunk.  With ``num_workers > 1``
   the per-partition writers run in parallel processes (the analogue of
   the reference's per-rank gloo shuffle workers,
   ``tools/distpartitioning/data_shuffle.py``); shared arrays
   (assignment, reshuffle permutation) are published once as .npy files
   and memory-mapped by every worker.

Output is exactly ``distributed.partition_graph``'s on-disk layout, so
``load_partition`` / ``DistGraphServer`` consume it unchanged.
"""
from __future__ import annotations

import json
import os
import shutil

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


def _write_partition(chunk_dir: str, out_dir: str, p: int,
                     node_lo: int, node_hi: int, e_base: int):
    """Stream the chunks, pick partition ``p``'s edges, write its
    on-disk partition.  Runs standalone so it can be a pool worker; all
    cross-partition state comes from the ``_shared`` memmaps."""
    with open(os.path.join(chunk_dir, "metadata.json")) as f:
        meta = json.load(f)
    shared = os.path.join(out_dir, "_shared")
    part = np.load(os.path.join(shared, "part.npy"), mmap_mode="r")
    order = np.load(os.path.join(shared, "order.npy"), mmap_mode="r")
    inv = np.load(os.path.join(shared, "inv.npy"), mmap_mode="r")

    bufs = []
    eid_base = 0
    for i in range(meta["num_chunks"]):
        e = np.load(os.path.join(chunk_dir, "edges", f"chunk{i}.npy"))
        old_eid = np.arange(eid_base, eid_base + e.shape[1])
        eid_base += e.shape[1]
        sel = np.asarray(part[e[1]]) == p
        if sel.any():
            bufs.append(np.stack([inv[e[0][sel]], inv[e[1][sel]],
                                  old_eid[sel]]))
    all_e = np.concatenate(bufs, axis=1) if bufs else np.zeros(
        (3, 0), np.int64)
    n_e = all_e.shape[1]
    owned_new = np.arange(node_lo, node_hi)
    halo = np.setdiff1d(np.unique(all_e[0]), owned_new)
    local_nodes_new = np.concatenate([owned_new, halo])
    lmap = {int(gg): j for j, gg in enumerate(local_nodes_new)}
    lrow = np.fromiter((lmap[int(s)] for s in all_e[0]), np.int64, n_e)
    lcol = all_e[1] - node_lo
    part_dir = os.path.join(out_dir, f"part{p}")
    os.makedirs(part_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(part_dir, "graph.npz"),
        row=lrow.astype(np.int32), col=lcol.astype(np.int32),
        orig_nid=np.asarray(order)[local_nodes_new].astype(np.int64),
        global_nid=local_nodes_new.astype(np.int64),
        global_eid=np.arange(e_base, e_base + n_e, dtype=np.int64),
        orig_eid=all_e[2].astype(np.int64),
        inner_node=(np.arange(len(local_nodes_new)) < len(owned_new)),
        num_local_nodes=np.int64(len(local_nodes_new)))
    # features: gather rows chunk-by-chunk (bounded memory per chunk)
    old_ids = np.asarray(order)[local_nodes_new]
    nf = {}
    for fname in meta["node_feats"]:
        nf[fname] = _gather_chunked(
            chunk_dir, "node_feat", fname, meta["node_chunk_sizes"],
            old_ids)
    np.savez_compressed(os.path.join(part_dir, "node_feats.npz"), **nf)
    ef = {}
    for fname in meta["edge_feats"]:
        ef[fname] = _gather_chunked(
            chunk_dir, "edge_feat", fname, meta["edge_chunk_sizes"],
            all_e[2])
    np.savez_compressed(os.path.join(part_dir, "edge_feats.npz"), **ef)
    return p, n_e


def _write_partition_star(args):
    return _write_partition(*args)


def dispatch_data(chunk_dir: str, num_parts: int, out_dir: str,
                  part_method: str = "fennel", graph_name: str = None,
                  num_workers: int = 1):
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

    # publish shared state for the per-partition writers
    os.makedirs(out_dir, exist_ok=True)
    shared = os.path.join(out_dir, "_shared")
    os.makedirs(shared, exist_ok=True)
    np.save(os.path.join(shared, "part.npy"), part)
    np.save(os.path.join(shared, "order.npy"), order)
    np.save(os.path.join(shared, "inv.npy"), inv)

    tasks = [(chunk_dir, out_dir, p, int(node_ranges[p, 0]),
              int(node_ranges[p, 1]), int(edge_ranges[p, 0]))
             for p in range(num_parts)]
    if num_workers > 1:
        import multiprocessing as mp
        with mp.get_context("spawn").Pool(
                min(num_workers, num_parts)) as pool:
            pool.map(_write_partition_star, tasks)
    else:
        for t in tasks:
            _write_partition(*t)

    # assemble the global new->old edge-id permutation from the parts
    e_order_global = np.empty(E, np.int64)
    for p in range(num_parts):
        z = np.load(os.path.join(out_dir, f"part{p}", "graph.npz"))
        e_order_global[z["global_eid"]] = z["orig_eid"]

    shutil.rmtree(shared, ignore_errors=True)
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
