"""Partition books: global <-> local id mapping (reference
``python/dgl/distributed/graph_partition_book.py:541 RangePartitionBook``,
``:1140 NodePartitionPolicy``)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp


class RangePartitionBook:
    """Nodes/edges reshuffled so each partition owns a contiguous id range —
    id -> partition is a searchsorted, O(log P) (the property the reference
    preserves on disk; SURVEY Appendix B)."""

    def __init__(self, part_id: int, num_parts: int,
                 node_map: Dict[str, np.ndarray],
                 edge_map: Dict[str, np.ndarray],
                 ntypes: List[str], etypes: List):
        self._part_id = int(part_id)
        self._num_parts = int(num_parts)
        # maps: ntype -> (num_parts, 2) [begin, end) ranges
        self._node_map = {k: np.asarray(v) for k, v in node_map.items()}
        self._edge_map = {k: np.asarray(v) for k, v in edge_map.items()}
        self.ntypes = list(ntypes)
        self.etypes = list(etypes)

    @property
    def part_id(self):
        return self._part_id

    @property
    def num_partitions(self):
        return self._num_parts

    def nid2partid(self, nids, ntype=None):
        ntype = ntype or self.ntypes[0]
        ranges = self._node_map[ntype]
        return np.searchsorted(ranges[:, 1], np.asarray(nids),
                               side="right").astype(np.int32)

    def eid2partid(self, eids, etype=None):
        etype = etype or self.etypes[0]
        ranges = self._edge_map[etype]
        return np.searchsorted(ranges[:, 1], np.asarray(eids),
                               side="right").astype(np.int32)

    def partid2nids(self, partid, ntype=None):
        ntype = ntype or self.ntypes[0]
        b, e = self._node_map[ntype][partid]
        return np.arange(b, e)

    def partid2eids(self, partid, etype=None):
        etype = etype or self.etypes[0]
        b, e = self._edge_map[etype][partid]
        return np.arange(b, e)

    def nid2localnid(self, nids, partid, ntype=None):
        ntype = ntype or self.ntypes[0]
        b, _ = self._node_map[ntype][partid]
        return np.asarray(nids) - b

    def eid2localeid(self, eids, partid, etype=None):
        etype = etype or self.etypes[0]
        b, _ = self._edge_map[etype][partid]
        return np.asarray(eids) - b

    def metadata(self):
        out = []
        nt = self.ntypes[0]
        for p in range(self._num_parts):
            b, e = self._node_map[nt][p]
            out.append({"machine_id": p, "num_nodes": int(e - b)})
        return out


class NodePartitionPolicy:
    """Policy handle used by DistTensor (reference
    ``graph_partition_book.py:1140``)."""

    def __init__(self, partition_book: RangePartitionBook, ntype=None):
        self.partition_book = partition_book
        self.ntype = ntype or partition_book.ntypes[0]
        self.policy_str = f"node~{self.ntype}"

    def to_local(self, ids):
        return self.partition_book.nid2localnid(
            ids, self.partition_book.part_id, self.ntype)

    def to_partid(self, ids):
        return self.partition_book.nid2partid(ids, self.ntype)

    def get_part_size(self):
        pb = self.partition_book
        b, e = pb._node_map[self.ntype][pb.part_id]
        return int(e - b)

    def get_size(self):
        pb = self.partition_book
        return int(pb._node_map[self.ntype][-1, 1])


class EdgePartitionPolicy:
    def __init__(self, partition_book: RangePartitionBook, etype=None):
        self.partition_book = partition_book
        self.etype = etype or partition_book.etypes[0]
        self.policy_str = f"edge~{self.etype}"

    def get_size(self):
        pb = self.partition_book
        return int(pb._edge_map[self.etype][-1, 1])
