"""User-defined-function batch views (reference ``python/dgl/udf.py:5,241``).

``EdgeBatch``: per-edge view with ``.src``/``.dst``/``.data`` feature dicts.
``NodeBatch``: per-node view with ``.data`` and the ``.mailbox`` of incoming
messages shaped (num_nodes_in_bucket, deg, *feat).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


class EdgeBatch:
    """The argument passed to an edge UDF."""

    def __init__(self, graph, eid, etype, src_data: Dict, edge_data: Dict,
                 dst_data: Dict):
        self._graph = graph
        self._eid = eid
        self._etype = etype
        self.src = src_data
        self.dst = dst_data
        self.data = edge_data

    def edges(self):
        """(u, v, eid) triple of this batch."""
        return self._graph.find_edges(self._eid, etype=self._etype) + (
            self._eid,)

    def batch_size(self) -> int:
        return int(self._eid.shape[0])

    def __len__(self) -> int:
        return self.batch_size()

    @property
    def canonical_etype(self):
        return self._graph.to_canonical_etype(self._etype)


class NodeBatch:
    """The argument passed to a node UDF.

    Mailbox padding contract (pow2 bucketing, the default): the mailbox
    degree axis may be padded to the next power of two; padded entries are
    ZERO.  ``mailbox_mask`` is a (batch, deg_padded) bool array (or None
    when the mailbox is exact).  Sum-style reducers need no change; for
    mean divide by ``degrees()``, for max/min mask with ``mailbox_mask``,
    and for sequence reducers (LSTM) read the output at step
    ``degrees() - 1``.  Set config flag ``udf_pow2_bucketing=False`` to
    recover exact per-degree mailboxes (one compile per distinct degree).
    """

    def __init__(self, graph, nodes, ntype, data: Dict,
                 msgs: Optional[Dict] = None, mailbox_mask=None):
        self._graph = graph
        self._nodes = nodes
        self._ntype = ntype
        self.data = data
        self.mailbox = msgs
        self.mailbox_mask = mailbox_mask

    def nodes(self):
        return self._nodes

    def degrees(self):
        """True (unpadded) number of messages per node in this batch, or
        None when there is no mailbox."""
        if self.mailbox is None:
            return None
        some = next(iter(self.mailbox.values()))
        if self.mailbox_mask is None:
            return jnp.full((some.shape[0],), some.shape[1], jnp.int32)
        return self.mailbox_mask.sum(axis=1).astype(jnp.int32)

    def batch_size(self) -> int:
        return int(self._nodes.shape[0])

    def __len__(self) -> int:
        return self.batch_size()

    @property
    def ntype(self):
        return self._ntype
