"""SPMD graph-partition parallelism over a device mesh.

TPU-native replacement for DistDGL's partition + KVStore + RPC training
path (reference ``python/dgl/distributed/``): instead of remote feature
pulls over TCP (``kvstore.py:962``), node features are **row-sharded
jax.Arrays** over a mesh axis, the graph's edges are partitioned by
destination, and cross-partition neighborhood access is an XLA collective
over ICI — the design SURVEY §2.6 calls for.

v1 collective strategy: ``all_gather`` of the (bf16) feature matrix per
layer, then local gather + segment-sum.  This is DistDGL's halo-replication
taken to its logical SPMD form; a dst-partition-aware ``all_to_all`` halo
exchange is the planned refinement (the partition book already records halo
rows).

Layout contract (static per graph):
* nodes are permuted so each partition owns a contiguous range
  (RangePartitionBook semantics, reference ``graph_partition_book.py:541``);
* per-partition edge lists are padded to the max count so every device runs
  the same program (SPMD) — pad edges point at the partition's dummy slot.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.graph import Graph
from ..partition import metis_partition_assignment


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedGraph:
    """Edge-partitioned graph for SPMD execution.

    Arrays (leading axis = partition):
      src_global: (P, E_max) int32 — global src id of each local edge
      dst_local:  (P, E_max) int32 — dst id *within* the partition
                   (== global id - node_offset[p]); padding points at
                   ``nodes_per_part`` (one dummy row)
      edge_mask:  (P, E_max) bool
      eid:        (P, E_max) int32 — original edge id (or -1 padding)
    Static:
      num_nodes, nodes_per_part (equal split; last part padded),
      num_parts, perm/inv_perm (host arrays mapping original <-> sharded
      node order)
    """

    src_global: jnp.ndarray
    dst_local: jnp.ndarray
    edge_mask: jnp.ndarray
    eid: jnp.ndarray
    num_nodes: int
    nodes_per_part: int
    num_parts: int

    def tree_flatten(self):
        return ((self.src_global, self.dst_local, self.edge_mask, self.eid),
                (self.num_nodes, self.nodes_per_part, self.num_parts))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_sharded_graph(g: Graph, num_parts: int,
                        partition: Optional[np.ndarray] = None,
                        part_method: str = "contiguous"):
    """Partition + reshuffle a homogeneous graph for a ``num_parts`` mesh.

    Returns (sharded_graph, perm) where ``perm`` maps new node id -> old
    node id (apply to features: ``x_sharded = x[perm]``).
    """
    n = g.num_nodes()
    unit = g.unit()
    row, col = (np.asarray(a) for a in unit.coo())

    if partition is not None:
        parts = np.asarray(partition)
    elif part_method == "metis":
        parts = np.asarray(metis_partition_assignment(g, num_parts))
    else:  # contiguous ranges of the existing order (use reorder_graph
        # upstream for locality)
        parts = np.minimum(
            np.arange(n) * num_parts // max(n, 1), num_parts - 1)

    order = np.argsort(parts, kind="stable")  # new -> old
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)                 # old -> new

    nodes_per_part = (n + num_parts - 1) // num_parts
    # re-balance into equal ranges: partition p owns rows
    # [p*npp, (p+1)*npp) of the *new* order (pad the tail virtually)
    new_row = inv[row]
    new_col = inv[col]
    owner = np.minimum(new_col // nodes_per_part, num_parts - 1)

    counts = np.bincount(owner, minlength=num_parts)
    e_max = int(counts.max()) if len(counts) else 1
    e_max = max(e_max, 1)
    src_g = np.zeros((num_parts, e_max), np.int32)
    dst_l = np.full((num_parts, e_max), nodes_per_part, np.int32)
    mask = np.zeros((num_parts, e_max), bool)
    eid = np.full((num_parts, e_max), -1, np.int32)
    fill = np.zeros(num_parts, np.int64)
    order_e = np.argsort(owner, kind="stable")
    start = 0
    for p in range(num_parts):
        cnt = counts[p]
        sel = order_e[start:start + cnt]
        start += cnt
        src_g[p, :cnt] = new_row[sel]
        dst_l[p, :cnt] = new_col[sel] - p * nodes_per_part
        mask[p, :cnt] = True
        eid[p, :cnt] = sel
    sg = ShardedGraph(
        src_global=jnp.asarray(src_g),
        dst_local=jnp.asarray(dst_l),
        edge_mask=jnp.asarray(mask),
        eid=jnp.asarray(eid),
        num_nodes=n,
        nodes_per_part=nodes_per_part,
        num_parts=num_parts,
    )
    return sg, order


def shard_graph_arrays(sg: ShardedGraph, mesh: Mesh, axis: str = "data"):
    """Place the per-partition arrays so partition p lives on device p."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec) if hasattr(x, "shape") and
        x.ndim >= 1 else x, sg)


def pad_node_features(x, sg: ShardedGraph):
    """Pad features to num_parts * nodes_per_part rows (sharding-friendly)."""
    total = sg.num_parts * sg.nodes_per_part
    pad = total - x.shape[0]
    if pad > 0:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def sharded_spmm_sum(sg: ShardedGraph, x, mesh: Mesh, axis: str = "data"):
    """copy_u/sum SpMM over the mesh.

    ``x``: (num_parts*nodes_per_part, F) sharded P(axis).  Output same
    layout.  Inside shard_map each device all-gathers x (bf16 on the wire),
    gathers its edges' src rows, and segment-sums into its own dst range.
    """
    npp = sg.nodes_per_part

    def local_fn(x_local, src_g, dst_l, emask):
        # x_local: (npp, F); gather the full feature matrix over ICI
        xg = jax.lax.all_gather(x_local, axis, tiled=True)  # (N_pad, F)
        src = src_g[0]
        dst = dst_l[0]
        msg = jnp.take(xg, src, axis=0)
        msg = jnp.where(emask[0][:, None], msg, 0)
        out = jax.ops.segment_sum(msg, dst, num_segments=npp + 1)
        return out[:npp]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return fn(x, sg.src_global, sg.dst_local, sg.edge_mask)


def sharded_degrees(sg: ShardedGraph, mesh: Mesh, axis: str = "data",
                    direction: str = "in"):
    """Node degrees in the sharded layout."""
    npp = sg.nodes_per_part

    def local_fn(dst_l, emask, src_g):
        if direction == "in":
            ones = emask[0].astype(jnp.float32)
            out = jax.ops.segment_sum(ones, dst_l[0],
                                      num_segments=npp + 1)[:npp]
            return out
        # out-degree: scatter by global src then psum-scatter
        ones = emask[0].astype(jnp.float32)
        total = sg.num_parts * npp
        full = jax.ops.segment_sum(ones, src_g[0], num_segments=total)
        full = jax.lax.psum(full, axis)
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(full, i * npp, npp)

    fn = jax.shard_map(local_fn, mesh=mesh,
                        in_specs=(P(axis), P(axis), P(axis)),
                        out_specs=P(axis))
    return fn(sg.dst_local, sg.edge_mask, sg.src_global)
