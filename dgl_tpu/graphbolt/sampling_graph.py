"""CSCSamplingGraph — the Stack-B sampling structure.

Re-design of the reference ``FusedCSCSamplingGraph``
(``graphbolt/include/graphbolt/fused_csc_sampling_graph.h:62,295,338``):
one CSC over all nodes with optional per-node-type offset ranges and
``type_per_edge``, host numpy arrays, vectorized pickers.

Exact option contract (SURVEY Appendix A): ``fanouts`` len 1 = across all
etypes, len = num_etypes = per-etype; -1 = all; ``replace``; ``probs_name``
(float probs or bool mask); LABOR variance-reduced mode via
``layer=True`` + random seed.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..utils import np_rng
from ..sampling.neighbor import _rows_pick


@dataclasses.dataclass
class SampledSubgraph:
    """CSC output (reference ``fused_sampled_subgraph.h``): seeds own the
    columns."""
    indptr: np.ndarray               # (num_seeds + 1,)
    indices: np.ndarray              # (nnz,) ORIGINAL src node ids
    original_edge_ids: np.ndarray    # (nnz,)
    original_column_node_ids: np.ndarray   # (num_seeds,) = the seeds
    type_per_edge: Optional[np.ndarray] = None


class CSCSamplingGraph:
    def __init__(self, indptr, indices, node_type_offset=None,
                 type_per_edge=None, node_type_to_id=None,
                 edge_type_to_id=None, edge_attributes=None):
        self.csc_indptr = np.asarray(indptr)
        self.indices = np.asarray(indices)
        self.node_type_offset = (None if node_type_offset is None
                                 else np.asarray(node_type_offset))
        self.type_per_edge = (None if type_per_edge is None
                              else np.asarray(type_per_edge))
        self.node_type_to_id = node_type_to_id
        self.edge_type_to_id = edge_type_to_id
        self.edge_attributes = edge_attributes or {}

    @property
    def total_num_nodes(self):
        return len(self.csc_indptr) - 1

    @property
    def total_num_edges(self):
        return len(self.indices)

    @property
    def num_nodes(self):
        if self.node_type_offset is None or self.node_type_to_id is None:
            return self.total_num_nodes
        return {nt: int(self.node_type_offset[i + 1]
                        - self.node_type_offset[i])
                for nt, i in self.node_type_to_id.items()}

    # ------------------------------------------------------------------
    def in_subgraph(self, seeds) -> SampledSubgraph:
        """All in-edges of seeds (reference ``InSubgraph``)."""
        seeds = np.asarray(seeds).astype(np.int64)
        counts = self.csc_indptr[seeds + 1] - self.csc_indptr[seeds]
        out_indptr = np.zeros(len(seeds) + 1, np.int64)
        out_indptr[1:] = np.cumsum(counts)
        pos = np.concatenate([
            np.arange(self.csc_indptr[s], self.csc_indptr[s + 1])
            for s in seeds]) if len(seeds) else np.zeros(0, np.int64)
        return SampledSubgraph(
            indptr=out_indptr,
            indices=self.indices[pos],
            original_edge_ids=pos,
            original_column_node_ids=seeds,
            type_per_edge=(None if self.type_per_edge is None
                           else self.type_per_edge[pos]))

    def sample_neighbors(self, seeds, fanouts, replace: bool = False,
                         probs_name: Optional[str] = None,
                         layer: bool = False,
                         random_seed=None) -> SampledSubgraph:
        """Reference ``SampleNeighbors`` semantics."""
        rng = (np.random.default_rng(random_seed)
               if random_seed is not None else np_rng())
        seeds = np.asarray(seeds).astype(np.int64)
        fanouts = list(np.atleast_1d(np.asarray(fanouts)))
        weights = None
        if probs_name is not None:
            weights = np.asarray(
                self.edge_attributes[probs_name]).astype(np.float64)
            if weights.dtype == bool:
                weights = weights.astype(np.float64)

        eids_identity = np.arange(self.total_num_edges, dtype=np.int64)
        per_seed_pos: List[np.ndarray] = []

        if len(fanouts) == 1 and self.type_per_edge is None:
            k = int(fanouts[0])
            if layer:
                pos = self._labor_pick(seeds, k, rng, weights)
            else:
                pos = _rows_pick(self.csc_indptr, eids_identity, seeds,
                                 k, replace, rng, weights)
            # group picked positions by their seed's index in ``seeds``
            seed_of_pos = np.searchsorted(self.csc_indptr, pos,
                                          side="right") - 1
            sorter = np.argsort(seeds, kind="stable")
            rank = sorter[np.searchsorted(seeds[sorter], seed_of_pos)]
            order = np.argsort(rank, kind="stable")
            pos = pos[order]
            counts = np.bincount(rank, minlength=len(seeds))
            indptr = np.zeros(len(seeds) + 1, np.int64)
            indptr[1:] = np.cumsum(counts)
        else:
            # per-etype fanouts: sample per seed per type
            chunks = []
            counts = np.zeros(len(seeds), np.int64)
            for i, s in enumerate(seeds):
                lo, hi = self.csc_indptr[s], self.csc_indptr[s + 1]
                if hi == lo:
                    continue
                etypes = (self.type_per_edge[lo:hi]
                          if self.type_per_edge is not None
                          else np.zeros(hi - lo, np.int64))
                picked = []
                for t, k in enumerate(fanouts if len(fanouts) > 1
                                      else fanouts * 1):
                    sel = np.nonzero(etypes == t)[0] if len(fanouts) > 1 \
                        else np.arange(hi - lo)
                    if len(sel) == 0:
                        continue
                    k = int(k)
                    if k < 0 or (not replace and len(sel) <= k):
                        take = sel
                    elif replace:
                        take = sel[rng.integers(0, len(sel), k)]
                    else:
                        take = rng.choice(sel, k, replace=False)
                    if weights is not None:
                        take = take[weights[lo + take] > 0]
                    picked.append(lo + take)
                if picked:
                    ch = np.concatenate(picked)
                    chunks.append(ch)
                    counts[i] = len(ch)
            pos = (np.concatenate(chunks) if chunks
                   else np.zeros(0, np.int64))
            indptr = np.zeros(len(seeds) + 1, np.int64)
            indptr[1:] = np.cumsum(counts)

        return SampledSubgraph(
            indptr=indptr,
            indices=self.indices[pos],
            original_edge_ids=pos,
            original_column_node_ids=seeds,
            type_per_edge=(None if self.type_per_edge is None
                           else self.type_per_edge[pos]))

    def _labor_pick(self, seeds, k, rng, weights):
        r = rng.random(self.total_num_nodes)
        chunks = []
        for s in seeds:
            lo, hi = self.csc_indptr[s], self.csc_indptr[s + 1]
            d = hi - lo
            if d == 0:
                continue
            if k < 0 or d <= k:
                chunks.append(np.arange(lo, hi))
                continue
            pi = k / d
            keep = r[self.indices[lo:hi]] <= pi
            chunks.append(np.arange(lo, hi)[keep])
        return (np.concatenate(chunks) if chunks
                else np.zeros(0, np.int64))

    def temporal_sample_neighbors(self, seeds, timestamps, fanouts,
                                  node_timestamp_attr=None,
                                  edge_timestamp_attr=None,
                                  replace=False) -> SampledSubgraph:
        """Only neighbors with timestamp < seed timestamp are eligible
        (reference ``TemporalSampleNeighbors``)."""
        ts_edge = (np.asarray(self.edge_attributes[edge_timestamp_attr])
                   if edge_timestamp_attr else None)
        ts_node = (np.asarray(self.edge_attributes[node_timestamp_attr])
                   if node_timestamp_attr else None)
        rng = np_rng()
        seeds = np.asarray(seeds).astype(np.int64)
        timestamps = np.asarray(timestamps)
        k = int(np.atleast_1d(fanouts)[0])
        chunks = []
        counts = np.zeros(len(seeds), np.int64)
        for i, (s, t) in enumerate(zip(seeds, timestamps)):
            lo, hi = self.csc_indptr[s], self.csc_indptr[s + 1]
            sel = np.arange(lo, hi)
            if ts_edge is not None:
                sel = sel[ts_edge[sel] < t]
            if ts_node is not None:
                sel = sel[ts_node[self.indices[sel]] < t]
            if k >= 0 and len(sel) > k:
                sel = (sel[rng.integers(0, len(sel), k)] if replace
                       else rng.choice(sel, k, replace=False))
            chunks.append(sel)
            counts[i] = len(sel)
        pos = (np.concatenate(chunks) if chunks else np.zeros(0, np.int64))
        indptr = np.zeros(len(seeds) + 1, np.int64)
        indptr[1:] = np.cumsum(counts)
        return SampledSubgraph(indptr, self.indices[pos], pos, seeds,
                               None if self.type_per_edge is None
                               else self.type_per_edge[pos])


def fused_csc_sampling_graph(indptr, indices, node_type_offset=None,
                             type_per_edge=None, node_type_to_id=None,
                             edge_type_to_id=None, edge_attributes=None):
    """Constructor mirroring ``gb.fused_csc_sampling_graph``."""
    return CSCSamplingGraph(indptr, indices, node_type_offset,
                            type_per_edge, node_type_to_id, edge_type_to_id,
                            edge_attributes)


def from_dglgraph(g, is_homogeneous=True) -> CSCSamplingGraph:
    """Build from a ``dgl_tpu.Graph`` (reference ``gb.from_dglgraph``)."""
    if is_homogeneous and g.is_homogeneous:
        csc = g.unit().csc()
        return CSCSamplingGraph(np.asarray(csc.indptr),
                                np.asarray(csc.indices))
    from ..convert_hetero import to_homogeneous
    from ..graph.graph import NTYPE, ETYPE
    homo = to_homogeneous(g)
    csc = homo.unit().csc()
    indptr = np.asarray(csc.indptr)
    indices = np.asarray(csc.indices)
    eids = np.asarray(csc.eids)
    etype_arr = np.asarray(homo.edata[ETYPE])[eids]
    ntype_arr = np.asarray(homo.ndata[NTYPE])
    offs = np.concatenate([[0], np.cumsum(
        [g.num_nodes(nt) for nt in g.ntypes])])
    return CSCSamplingGraph(
        indptr, indices, node_type_offset=offs, type_per_edge=etype_arr,
        node_type_to_id={nt: i for i, nt in enumerate(g.ntypes)},
        edge_type_to_id={":".join(c): i
                         for i, c in enumerate(g.canonical_etypes)})


def unique_and_compact(node_id_lists):
    """Batched id compaction (reference ``unique_and_compact.cc:121``):
    returns (unique ids, compacted lists)."""
    cat = np.concatenate([np.asarray(x).ravel() for x in node_id_lists]) \
        if node_id_lists else np.zeros(0, np.int64)
    uniq, inv = np.unique(cat, return_inverse=True)
    out = []
    off = 0
    for x in node_id_lists:
        n = np.asarray(x).size
        out.append(inv[off:off + n].reshape(np.asarray(x).shape))
        off += n
    return uniq, out
