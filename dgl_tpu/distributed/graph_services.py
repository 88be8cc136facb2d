"""Distributed graph services: remote sampling / edge queries.

Reference: ``python/dgl/distributed/graph_services.py:35-255`` —
``sample_neighbors`` splits seeds with the partition book, samples the
local partition directly, sends ``SamplingRequest``s for remote seeds,
and merges the per-partition results into one global-id subgraph.

Server side: the local partition graph stores owned nodes first (local id
= global id − range begin; SURVEY Appendix B reshuffle), halo nodes after,
with ``NID``/``EID`` arrays carrying global ids — so global→local for
seed (dst) nodes is a subtraction and local→global for sampled srcs is a
gather.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import rpc
from ..graph.graph import Graph, NID, EID
from ..graph.convert import graph as make_graph


def _local_sample(local_g: Graph, node_range, global_seeds: np.ndarray,
                  fanout: int, replace: bool, prob: Optional[str]):
    """Sample in-neighbors of owned seeds on a partition; global-id COO."""
    from ..sampling.neighbor import sample_neighbors as _sn
    b = int(node_range[0])
    local_seeds = np.asarray(global_seeds, np.int64) - b
    sub = _sn(local_g, local_seeds, fanout, replace=replace, prob=prob)
    row, col = (np.asarray(x) for x in sub.unit().coo())
    gnid = np.asarray(local_g.ndata[NID])
    eids = np.asarray(sub.edata[EID])
    # sub's edata[EID] are edge positions in local_g; map to global ids
    geid = np.asarray(local_g.edata[EID])[eids] if EID in local_g.edata \
        else eids
    return gnid[row], gnid[col], geid


class SamplingRequest(rpc.Request):
    def __init__(self, seeds: np.ndarray, fanout: int, replace: bool = False,
                 prob: Optional[str] = None):
        self.seeds = seeds
        self.fanout = fanout
        self.replace = replace
        self.prob = prob

    def process_request(self, server_state):
        book = server_state.partition_book
        nrange = book._node_map[book.ntypes[0]][server_state.server_id]
        src, dst, eid = _local_sample(server_state.graph, nrange,
                                      self.seeds, self.fanout,
                                      self.replace, self.prob)
        return SamplingResponse(src, dst, eid)


class SamplingResponse(rpc.Response):
    def __init__(self, src, dst, eid):
        self.src = src
        self.dst = dst
        self.eid = eid


class EdgesRequest(rpc.Request):
    """find_edges on the owning partition (reference
    ``graph_services.py _find_edges``)."""

    def __init__(self, eids: np.ndarray):
        self.eids = eids

    def process_request(self, server_state):
        book = server_state.partition_book
        erange = book._edge_map[book.etypes[0]][server_state.server_id]
        g = server_state.graph
        geid = np.asarray(g.edata[EID])
        order = np.argsort(geid)
        pos = order[np.searchsorted(geid, self.eids, sorter=order)]
        row, col = (np.asarray(x) for x in g.unit().coo())
        gnid = np.asarray(g.ndata[NID])
        return EdgesResponse(gnid[row[pos]], gnid[col[pos]])


class EdgesResponse(rpc.Response):
    def __init__(self, src, dst):
        self.src = src
        self.dst = dst


class InSubgraphRequest(rpc.Request):
    """All in-edges of the given owned seeds (fanout = -1)."""

    def __init__(self, seeds: np.ndarray):
        self.seeds = seeds

    def process_request(self, server_state):
        book = server_state.partition_book
        nrange = book._node_map[book.ntypes[0]][server_state.server_id]
        src, dst, eid = _local_sample(server_state.graph, nrange,
                                      self.seeds, -1, False, None)
        return SamplingResponse(src, dst, eid)


rpc.register_service(rpc.SAMPLING, SamplingRequest, SamplingResponse)
rpc.register_service(rpc.EDGE_SAMPLING, EdgesRequest, EdgesResponse)
rpc.register_service(rpc.IN_SUBGRAPH, InSubgraphRequest, SamplingResponse)


def _merge_to_graph(parts_out: List, num_nodes: int) -> Graph:
    srcs = [p[0] for p in parts_out if len(p[0])]
    dsts = [p[1] for p in parts_out if len(p[0])]
    eids = [p[2] for p in parts_out if len(p[0])]
    if srcs:
        row = np.concatenate(srcs)
        col = np.concatenate(dsts)
        eid = np.concatenate(eids)
    else:
        row = col = eid = np.zeros(0, np.int64)
    g = make_graph((row, col), num_nodes=num_nodes)
    g.edata[EID] = eid.astype(np.int64)
    return g


def sample_neighbors(dist_g, seeds, fanout: int, replace: bool = False,
                     prob: Optional[str] = None) -> Graph:
    """DistDGL ``sample_neighbors``: local fast path + remote RPC merge.

    ``dist_g`` must expose ``get_partition_book()``, ``num_nodes()``, and
    (optionally) ``local_partition`` + ``part_id`` for the local path.
    """
    book = dist_g.get_partition_book()
    seeds = np.asarray(seeds, np.int64).ravel()
    parts = book.nid2partid(seeds)
    results = []
    remote_ids, remote_reqs = [], []
    local_part = getattr(dist_g, "local_partition", None)
    local_id = getattr(dist_g, "part_id", None)
    for p in np.unique(parts):
        p_seeds = seeds[parts == p]
        if local_part is not None and p == local_id:
            nrange = book._node_map[book.ntypes[0]][p]
            results.append(_local_sample(local_part, nrange, p_seeds,
                                         fanout, replace, prob))
        else:
            remote_ids.append(int(p))
            remote_reqs.append(SamplingRequest(p_seeds, fanout, replace,
                                               prob))
    if remote_ids:
        for res in rpc.remote_call_multi(remote_ids, remote_reqs):
            results.append((res.src, res.dst, res.eid))
    return _merge_to_graph(results, dist_g.num_nodes())


def in_subgraph(dist_g, seeds) -> Graph:
    return sample_neighbors(dist_g, seeds, -1)


def find_edges(dist_g, eids):
    """Global (src, dst) endpoints of global edge ids."""
    book = dist_g.get_partition_book()
    eids = np.asarray(eids, np.int64).ravel()
    parts = book.eid2partid(eids)
    src = np.empty(len(eids), np.int64)
    dst = np.empty(len(eids), np.int64)
    server_ids, reqs, slots = [], [], []
    for p in np.unique(parts):
        sel = parts == p
        server_ids.append(int(p))
        reqs.append(EdgesRequest(eids[sel]))
        slots.append(sel)
    for sel, res in zip(slots, rpc.remote_call_multi(server_ids, reqs)):
        src[sel] = res.src
        dst[sel] = res.dst
    return src, dst
