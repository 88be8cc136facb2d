"""DistGNN split-vertex aggregation with delayed remote combine.

Reference: ``python/dgl/distgnn/partition/libra_partition.py:150-240``
(per-partition graphs with split-node clone databases — ``adj``,
``inner_node``, ``lf``) and the DistGNN paper's cd-0/cd-r delayed-update
training (arXiv:2104.06700).  The vertex-cut places each EDGE in exactly
one partition; high-degree vertices are split into clones, so a full
aggregation = local partial aggregate + cross-clone combine.

TPU-native formulation: the clone database becomes static index maps;
the partial aggregates are ordinary (pallas/XLA) SpMMs over the local
edge sets, and the cross-partition combine is one segment-sum over the
concatenated partials (on a mesh this is exactly the ``all_to_all``
pattern of ``parallel/spmd.py`` — here expressed functionally so it also
runs single-host).  ``delay > 0`` reproduces DistGNN's delayed updates:
remote contributions are refreshed every ``delay`` steps and stale
partials are used in between (bounded staleness, overlap-friendly).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..partition import libra_partition


@dataclasses.dataclass
class VertexCutParts:
    """Static per-partition structures.

    local_src/local_dst[p]: (E_p,) partition-local edge endpoints
    global_of[p]: (N_p,) global node id of each local node
    num_parts, num_nodes; replication = total clones / nodes
    """

    local_src: List[np.ndarray]
    local_dst: List[np.ndarray]
    global_of: List[np.ndarray]
    num_parts: int
    num_nodes: int
    replication: float


def build_vertex_cut(g, num_parts: int) -> VertexCutParts:
    """Libra vertex-cut -> static clone/index maps."""
    epart, rep = libra_partition(g, num_parts)
    epart = np.asarray(epart)
    row, col = (np.asarray(a) for a in g.unit().coo())
    lsrc, ldst, gof = [], [], []
    total_clones = 0
    for p in range(num_parts):
        sel = epart == p
        r, c = row[sel], col[sel]
        uniq = np.unique(np.concatenate([r, c])) if len(r) else \
            np.zeros(0, np.int64)
        remap = np.full(g.num_nodes(), -1, np.int64)
        remap[uniq] = np.arange(len(uniq))
        lsrc.append(remap[r])
        ldst.append(remap[c])
        gof.append(uniq)
        total_clones += len(uniq)
    return VertexCutParts(lsrc, ldst, gof, num_parts, g.num_nodes(),
                          total_clones / max(g.num_nodes(), 1))


def partial_aggregate(parts: VertexCutParts, p: int, x):
    """Local copy_u/sum partial aggregate of partition ``p`` over the
    GLOBAL feature matrix ``x`` (each partition only reads rows for its
    local nodes — O(N_p) rows)."""
    xg = jnp.take(x, jnp.asarray(parts.global_of[p]), axis=0)
    msg = jnp.take(xg, jnp.asarray(parts.local_src[p]), axis=0)
    return jax.ops.segment_sum(
        msg, jnp.asarray(parts.local_dst[p]),
        num_segments=len(parts.global_of[p]))


def combine(parts: VertexCutParts, partials) -> jnp.ndarray:
    """Cross-clone combine: sum every partition's partial into global
    rows (the all_to_all step on a mesh)."""
    feat_shape = partials[0].shape[1:]
    out = jnp.zeros((parts.num_nodes,) + feat_shape, partials[0].dtype)
    for p in range(parts.num_parts):
        out = out.at[jnp.asarray(parts.global_of[p])].add(partials[p])
    return out


class DelayedAggregator:
    """Stateful aggregation with DistGNN-style delayed remote updates.

    ``delay=0``: exact (combine every step).  ``delay=r``: each partition
    re-uses the other partitions' partials from the last refresh for r
    steps (bounded staleness; the remote exchange then amortizes over r
    steps, the overlap trick of arXiv:2104.06700 §4.3)."""

    def __init__(self, parts: VertexCutParts, delay: int = 0):
        self.parts = parts
        self.delay = int(delay)
        self._step = 0
        self._stale_remote: Optional[List] = None

    def __call__(self, x):
        parts = self.parts
        partials = [partial_aggregate(parts, p, x)
                    for p in range(parts.num_parts)]
        if self.delay == 0:
            return combine(parts, partials)
        refresh = (self._stale_remote is None
                   or self._step % self.delay == 0)
        if refresh:
            # remote[p] = combined sum MINUS own partial, gathered back
            # to p's local rows
            full = combine(parts, partials)
            self._stale_remote = [
                jnp.take(full, jnp.asarray(parts.global_of[p]), axis=0)
                - partials[p]
                for p in range(parts.num_parts)]
        self._step += 1
        # local-fresh + remote-stale, scattered back (clones average out
        # to the same value at refresh steps)
        feat_shape = partials[0].shape[1:]
        out = jnp.zeros((parts.num_nodes,) + feat_shape,
                        partials[0].dtype)
        counts = np.zeros(parts.num_nodes, np.float32)
        for p in range(parts.num_parts):
            out = out.at[jnp.asarray(parts.global_of[p])].add(
                partials[p] + self._stale_remote[p])
            np.add.at(counts, parts.global_of[p], 1.0)
        scale = jnp.asarray(1.0 / np.maximum(counts, 1.0))
        return out * scale.reshape((-1,) + (1,) * len(feat_shape))
