"""SPMD graph-partition parallelism over a device mesh.

TPU-native replacement for DistDGL's partition + KVStore + RPC training
path (reference ``python/dgl/distributed/``): instead of remote feature
pulls over TCP (``kvstore.py:962``), node features are **row-sharded
jax.Arrays** over a mesh axis, the graph's edges are partitioned by
destination, and cross-partition neighborhood access is an XLA collective
over ICI — the design SURVEY §2.6 calls for.

Two collective strategies:

* **v1 (``build_sharded_graph`` + ``sharded_spmm_sum``)** — ``all_gather``
  of the full (bf16) feature matrix per layer.  O(N·F) memory per chip;
  kept as the simple baseline and the correctness oracle.
* **v2 (``build_halo_sharded_graph`` + ``halo_spmm_sum``)** — the real
  multi-chip design (reference ``python/dgl/partition.py:139``
  ``partition_graph_with_halo``, ``distributed/partition.py:648`` halo
  hops, ``kvstore.py:962`` pull-only-what-you-need; SURVEY §5.7): each
  partition precomputes, per peer, the unique boundary rows the peer
  needs; per layer one ``all_to_all`` moves ONLY those rows over ICI
  while the local-edge SpMM runs concurrently (XLA's async collectives
  overlap the two).  Per-chip memory is O(N/P + halo).

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


# ---------------------------------------------------------------------------
# v2: halo all_to_all partition parallelism
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloShardedGraph:
    """Partitioned graph whose cross-partition src rows ride a per-layer
    ``all_to_all`` halo exchange instead of a full ``all_gather``.

    Edges are split per partition into *local* (src owned by the same
    partition) and *halo* (src owned elsewhere).  Halo src indices point
    into the received (P·H_max, F) halo block; ``send_idx[q, p]`` lists
    the rows (q-local ids) that q must ship to p.  All shapes are static:
    edge lists padded to the max partition count (pad edges aim at the
    dummy dst slot ``npp``), send lists padded to ``h_max`` (pad rows
    gather row 0 — never referenced by any halo edge).

    Arrays (leading axis = partition p):
      lsrc, ldst: (P, EL) int32 — local edges, partition-local ids
      hsrc, hdst: (P, EH) int32 — halo edges; hsrc indexes the flattened
                   (P·H_max) halo receive block
      send_idx:   (P, P, H_max) int32 — rows of partition p's x to send
                   to each peer
      l_eid, h_eid: (P, EL)/(P, EH) int32 — canonical (original) edge id
                   of each plane slot, -1 at padding; the map that moves
                   edge features between canonical (E, F) order and the
                   partitioned plane layout (``halo_ops.EdgePlanes``)
      in_deg/out_deg: (P, npp) float32 — static degree tables (global
                   graph degrees, sliced per partition)
    """

    lsrc: jnp.ndarray
    ldst: jnp.ndarray
    hsrc: jnp.ndarray
    hdst: jnp.ndarray
    send_idx: jnp.ndarray
    in_deg: jnp.ndarray
    out_deg: jnp.ndarray
    l_eid: jnp.ndarray
    h_eid: jnp.ndarray
    num_nodes: int
    nodes_per_part: int
    num_parts: int
    h_max: int
    halo_rows_total: int  # true (unpadded) boundary rows moved per layer
    num_edges: int = 0    # canonical edge count
    # exchange plan: "a2a" = one all_to_all padded to (P, P, h_max);
    # "ppermute" = size-grouped collective-permute rounds: the ordered
    # peer pairs are greedily edge-colored into rounds so that a pair
    # only joins a round whose capacity is within 2x of its own row
    # count — padded wire bytes are therefore <= 2x useful by
    # construction, and a single hot pair inflates only its own round
    # instead of all P^2 lanes (scale-hardening of the max-padded table;
    # reference halo lists are per-peer ragged,
    # ``python/dgl/partition.py:139``).  ``send_rag[r]``: (P, h_caps[r])
    # rows device q ships in round r; ``perms[r]``: the (src, dst) pairs
    # active in round r (ppermute moves only those).
    exchange: str = "a2a"
    send_rag: Optional[tuple] = None
    h_caps: Optional[tuple] = None
    perms: Optional[tuple] = None
    # bipartite relations (hetero mesh plane): separate src node space.
    # None means homogeneous (src space == dst space) — the round-3
    # layout, kept as the default so existing pytrees stay valid.
    src_nodes_per_part: Optional[int] = None
    num_src_nodes: Optional[int] = None

    def tree_flatten(self):
        return ((self.lsrc, self.ldst, self.hsrc, self.hdst, self.send_idx,
                 self.in_deg, self.out_deg, self.l_eid, self.h_eid,
                 self.send_rag),
                (self.num_nodes, self.nodes_per_part, self.num_parts,
                 self.h_max, self.halo_rows_total, self.num_edges,
                 self.exchange, self.h_caps, self.perms,
                 self.src_nodes_per_part, self.num_src_nodes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:9], *aux[:6], send_rag=children[9],
                   h_caps=aux[7], exchange=aux[6], perms=aux[8],
                   src_nodes_per_part=aux[9], num_src_nodes=aux[10])

    @property
    def npp_src(self) -> int:
        """Rows of the per-device SRC feature block (== nodes_per_part
        unless the relation is bipartite)."""
        return (self.nodes_per_part if self.src_nodes_per_part is None
                else self.src_nodes_per_part)

    @property
    def n_src_nodes(self) -> int:
        return (self.num_nodes if self.num_src_nodes is None
                else self.num_src_nodes)

    @property
    def h_total(self) -> int:
        """Flat halo receive-block length per device."""
        if self.exchange == "ppermute":
            return int(sum(self.h_caps)) if self.h_caps else 1
        return self.num_parts * self.h_max

    def comm_stats(self, feat_dim: int, dtype_bytes: int = 4):
        """Per-layer halo exchange volume (padded wire bytes + useful)."""
        p = self.num_parts
        if self.exchange == "ppermute":
            wire_rows = int(sum(len(pm) * c for pm, c in
                                zip(self.perms or (), self.h_caps or ())))
        else:
            wire_rows = p * p * self.h_max
        return {
            "exchange": self.exchange,
            "halo_rows": self.halo_rows_total,
            "wire_rows_padded": wire_rows,
            "bytes_useful": self.halo_rows_total * feat_dim * dtype_bytes,
            "bytes_wire": wire_rows * feat_dim * dtype_bytes,
            "allgather_bytes_equiv": self.num_nodes * feat_dim *
            dtype_bytes * p,
            "table_rows_per_device": self.nodes_per_part + self.h_total,
        }


def _plan_exchange_rounds(needed, num_parts):
    """Greedy size-grouped edge coloring of the boundary pairs.

    Pairs (q -> p, rows) are visited largest-first; a pair joins the
    first round where (a) q is free as a sender and p as a receiver
    (each round is a partial permutation = one ppermute), and (b) its
    row count is >= half the round's capacity (so padding never exceeds
    2x).  Returns [(perm_pairs, capacity, pairs)] — wire rows =
    sum(len(perm) * cap) <= 2x useful rows by construction, vs the
    all_to_all's P^2 * max."""
    pairs = []
    for p in range(num_parts):
        for q in range(num_parts):
            u = needed[p][q]
            if u is not None and len(u):
                pairs.append((len(u), q, p))
    if not pairs:
        return [(((0, 0),), 1, ())] if num_parts else []
    pairs.sort(reverse=True)
    rounds = []   # [(src_used set, dst_used set, cap, pair list)]
    for cnt, q, p in pairs:
        placed = False
        for su, du, cap, lst in rounds:
            if q not in su and p not in du and 2 * cnt >= cap:
                su.add(q)
                du.add(p)
                lst.append((q, p))
                placed = True
                break
        if not placed:
            rounds.append(({q}, {p}, cnt, [(q, p)]))
    return [(tuple(lst), cap, tuple(lst))
            for su, du, cap, lst in rounds]


def build_halo_sharded_graph(g: Graph, num_parts: int,
                             partition: Optional[np.ndarray] = None,
                             part_method: str = "metis",
                             exchange: str = "auto"):
    """Partition + reshuffle + precompute halo send/recv index lists.

    Returns (halo_graph, perm) with ``perm`` mapping new node id -> old
    (apply to features: ``x_sharded = x[perm]``).  Reference semantics:
    ``partition_graph_with_halo`` (``python/dgl/partition.py:139``) with
    halo_hops=1, re-designed as static SPMD index maps.

    ``exchange``: "a2a" (one all_to_all, (P, P, h_max) max-padded),
    "ppermute" (size-grouped collective-permute rounds with per-round
    capacities — wire <= 2x useful rows by construction, resilient to
    skewed boundaries), or "auto" (ppermute when it cuts padded wire
    rows by >=1.3x and P > 2).
    """
    n = g.num_nodes()
    unit = g.unit()
    row, col = (np.asarray(a) for a in unit.coo())

    if partition is not None:
        parts = np.asarray(partition)
    elif part_method == "metis" and n > num_parts:
        parts = np.asarray(metis_partition_assignment(g, num_parts))
    else:
        parts = np.minimum(np.arange(n) * num_parts // max(n, 1),
                           num_parts - 1)

    order = np.argsort(parts, kind="stable")      # new -> old
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)                     # old -> new
    npp = (n + num_parts - 1) // num_parts
    hg = _build_halo_plane(inv[row], inv[col], n, n, npp, npp,
                           num_parts, exchange, len(row))
    return hg, order


def build_halo_bipartite(row, col, n_src: int, n_dst: int,
                         num_parts: int,
                         src_partition: Optional[np.ndarray] = None,
                         dst_partition: Optional[np.ndarray] = None,
                         exchange: str = "auto"):
    """Halo plane for a BIPARTITE relation (hetero mesh plane): src and
    dst live in separate node spaces, each with its own partition
    assignment (None = contiguous ranges).  Edges are partitioned by
    dst owner; the exchange ships boundary rows of the SRC space.

    Returns (halo_graph, perm_src, perm_dst) — perms map new node id ->
    original id per space (reference semantics: per-ntype partition
    books, ``distributed/graph_partition_book.py:541``)."""
    row = np.asarray(row)
    col = np.asarray(col)

    def reshuffle(n, parts):
        if parts is None:
            parts = np.minimum(np.arange(n) * num_parts // max(n, 1),
                               num_parts - 1)
        else:
            parts = np.asarray(parts)
        order = np.argsort(parts, kind="stable")
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        return order, inv

    perm_src, inv_src = reshuffle(n_src, src_partition)
    perm_dst, inv_dst = reshuffle(n_dst, dst_partition)
    npp_src = (n_src + num_parts - 1) // num_parts
    npp_dst = (n_dst + num_parts - 1) // num_parts
    hg = _build_halo_plane(inv_src[row], inv_dst[col], n_src, n_dst,
                           npp_src, npp_dst, num_parts, exchange,
                           len(row))
    return hg, perm_src, perm_dst


def _build_halo_plane(new_row, new_col, n_src, n_dst, npp_src, npp_dst,
                      num_parts, exchange, num_edges):
    """Core halo-plane construction over already-reshuffled edge ids.

    ``new_row`` lives in the src space (partition p owns rows
    [p*npp_src, (p+1)*npp_src)), ``new_col`` in the dst space; edges are
    assigned to their dst owner, halo edges' src rows ride the
    exchange."""
    npp = npp_dst       # dst space: pad slots, segment counts
    own_src = np.minimum(new_row // npp_src, num_parts - 1)
    own_dst = np.minimum(new_col // npp_dst, num_parts - 1)

    is_local = own_src == own_dst
    # ---- per-partition local edges ------------------------------------
    l_counts = np.bincount(own_dst[is_local], minlength=num_parts)
    h_counts = np.bincount(own_dst[~is_local], minlength=num_parts)
    el_max = max(int(l_counts.max()) if len(l_counts) else 0, 1)
    eh_max = max(int(h_counts.max()) if len(h_counts) else 0, 1)

    lsrc = np.zeros((num_parts, el_max), np.int32)
    ldst = np.full((num_parts, el_max), npp, np.int32)
    l_eid = np.full((num_parts, el_max), -1, np.int32)
    h_eid = np.full((num_parts, eh_max), -1, np.int32)
    hsrc_parts = []   # per p: (eh,) flat halo index — fill after h_max known
    hdst_parts = []
    needed = [[None] * num_parts for _ in range(num_parts)]  # [p][q]
    halo_rows_total = 0
    h_max = 1
    for p in range(num_parts):
        sel_l = np.nonzero(is_local & (own_dst == p))[0]
        lsrc[p, :len(sel_l)] = new_row[sel_l] - p * npp_src
        ldst[p, :len(sel_l)] = new_col[sel_l] - p * npp
        l_eid[p, :len(sel_l)] = sel_l
        sel_h = np.nonzero((~is_local) & (own_dst == p))[0]
        h_eid[p, :len(sel_h)] = sel_h
        hq = own_src[sel_h]
        hrow = new_row[sel_h]
        pos = np.empty(len(sel_h), np.int64)
        for q in np.unique(hq):
            m = hq == q
            uniq = np.unique(hrow[m])             # sorted q-owned globals
            needed[p][q] = uniq - q * npp_src     # q-local row ids
            halo_rows_total += len(uniq)
            h_max = max(h_max, len(uniq))
            pos[m] = np.searchsorted(uniq, hrow[m])
        hsrc_parts.append((hq, pos))
        hdst_parts.append(new_col[sel_h] - p * npp)

    # pick the exchange plan from the per-pair boundary-row counts
    plan = None
    if exchange in ("auto", "ppermute") and num_parts > 1:
        plan = _plan_exchange_rounds(needed, num_parts)
    if exchange == "auto":
        wire_pp = (sum(len(pm) * c for pm, c, _ in plan)
                   if plan else 1 << 62)
        wire_a2a = num_parts * num_parts * h_max
        exchange = "ppermute" if (plan and num_parts > 2
                                  and wire_pp * 13 < wire_a2a * 10) \
            else "a2a"

    hsrc = np.zeros((num_parts, eh_max), np.int32)
    hdst = np.full((num_parts, eh_max), npp, np.int32)
    send_rag = None
    h_caps = None
    perms = None
    if exchange == "ppermute":
        perms = tuple(tuple(pm) for pm, _, _ in plan)
        h_caps = tuple(int(c) for _, c, _ in plan)
        off = np.concatenate([[0], np.cumsum(h_caps)]).astype(np.int64)
        r_of = {}                     # (q, p) -> round index
        send_rag = []
        for r, (pm, cap, pairs) in enumerate(plan):
            tab = np.zeros((num_parts, cap), np.int32)
            for (q, p) in pairs:
                u = needed[p][q]
                tab[q, :len(u)] = u
                r_of[(q, p)] = r
            send_rag.append(jnp.asarray(tab))
        send_rag = tuple(send_rag)
        for p in range(num_parts):
            hq, pos = hsrc_parts[p]
            r_idx = np.array([r_of[(int(q), p)] for q in hq], np.int64) \
                if len(hq) else np.zeros(0, np.int64)
            hsrc[p, :len(pos)] = off[r_idx] + pos
            hdst[p, :len(pos)] = hdst_parts[p]
        send_idx = np.zeros((num_parts, 1, 1), np.int32)  # unused (a2a)
    else:
        send_idx = np.zeros((num_parts, num_parts, h_max), np.int32)
        for p in range(num_parts):
            hq, pos = hsrc_parts[p]
            hsrc[p, :len(pos)] = hq * h_max + pos
            hdst[p, :len(pos)] = hdst_parts[p]
            for q in range(num_parts):
                u = needed[p][q]
                if u is not None:
                    send_idx[q, p, :len(u)] = u

    # static degree tables in the reshuffled order, padded per space
    deg_in = np.bincount(new_col, minlength=num_parts * npp_dst).astype(
        np.float32)
    deg_out = np.bincount(new_row, minlength=num_parts * npp_src).astype(
        np.float32)
    bipartite = (npp_src != npp_dst) or (n_src != n_dst)
    hg = HaloShardedGraph(
        lsrc=jnp.asarray(lsrc), ldst=jnp.asarray(ldst),
        hsrc=jnp.asarray(hsrc), hdst=jnp.asarray(hdst),
        send_idx=jnp.asarray(send_idx),
        in_deg=jnp.asarray(deg_in.reshape(num_parts, npp_dst)),
        out_deg=jnp.asarray(deg_out.reshape(num_parts, npp_src)),
        l_eid=jnp.asarray(l_eid), h_eid=jnp.asarray(h_eid),
        num_nodes=n_dst, nodes_per_part=npp_dst, num_parts=num_parts,
        h_max=h_max, halo_rows_total=halo_rows_total,
        num_edges=num_edges, exchange=exchange, send_rag=send_rag,
        h_caps=h_caps, perms=perms,
        src_nodes_per_part=npp_src if bipartite else None,
        num_src_nodes=n_src if bipartite else None)
    return hg


def shard_halo_graph(hg: HaloShardedGraph, mesh: Mesh, axis: str = "data"):
    """Place per-partition arrays so partition p lives on device p."""
    spec = NamedSharding(mesh, P(axis))
    def put(x):
        return jax.device_put(x, spec) if hasattr(x, "ndim") else x
    return jax.tree_util.tree_map(put, hg)


def exchange_operands(hg: HaloShardedGraph):
    """Arrays the in-shard exchange needs (appended as shard_map
    operands, every one leading-axis partitioned)."""
    if hg.exchange == "ppermute":
        return list(hg.send_rag or ())
    return [hg.send_idx]


def make_exchange(hg: HaloShardedGraph, blocks, axis: str):
    """Build the per-device exchange closure from the shard_map BLOCKS
    of :func:`exchange_operands` (each with its leading size-1 partition
    dim still on).  Returns x_local (npp, *F) -> recv (h_total, *F)."""
    if hg.exchange == "ppermute":
        perms = hg.perms or ()

        def ex(x_local):
            outs = []
            for r, sk in enumerate(blocks):
                rows = jnp.take(x_local, sk[0], axis=0)   # (cap_r, *F)
                outs.append(jax.lax.ppermute(rows, axis,
                                             list(perms[r])))
            if not outs:
                return jnp.zeros((1,) + x_local.shape[1:], x_local.dtype)
            return jnp.concatenate(outs)
        return ex

    sidx = blocks[0]

    def ex(x_local):
        send = jnp.take(x_local, sidx[0], axis=0)         # (P, H, *F)
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
        return recv.reshape((-1,) + x_local.shape[1:])
    return ex


def make_exchange_transpose(hg: HaloShardedGraph, blocks, axis: str,
                            npp: int):
    """The exchange's linear transpose for hand-written VJPs:
    drecv (h_total, *F) -> dx contribution (npp, *F).  (JAX AD derives
    this automatically for the take/collective composition; Pallas fast
    paths need it explicitly.)"""
    if hg.exchange == "ppermute":
        caps = hg.h_caps or ()
        perms = hg.perms or ()

        def exT(drecv):
            out = jnp.zeros((npp,) + drecv.shape[1:], drecv.dtype)
            off = 0
            for r, sk in enumerate(blocks):
                blk = jax.lax.dynamic_slice_in_dim(
                    drecv, off, caps[r], axis=0)
                off += caps[r]
                inv = [(d, s) for (s, d) in perms[r]]
                back = jax.lax.ppermute(blk, axis, inv)
                out = out.at[sk[0]].add(back)
            return out
        return exT

    sidx = blocks[0]
    Pn, H = hg.num_parts, hg.h_max

    def exT(drecv):
        back = jax.lax.all_to_all(
            drecv.reshape((Pn, H) + drecv.shape[1:]), axis, 0, 0,
            tiled=True)
        return jnp.zeros((npp,) + drecv.shape[1:], drecv.dtype).at[
            sidx[0].reshape(-1)].add(
                back.reshape((Pn * H,) + drecv.shape[1:]))
    return exT


def halo_spmm_sum(hg: HaloShardedGraph, x, mesh: Mesh, axis: str = "data"):
    """copy_u/sum SpMM over the halo plane (the v2 collective).

    ``x``: (P*npp, F) row-sharded ``P(axis)``; output in the same layout.
    Per device: ship the per-peer boundary rows over ICI (all_to_all or
    per-distance ppermute rounds, per ``hg.exchange``) and segment-sum
    the LOCAL edges while the exchange is in flight (XLA overlaps the
    independent collective with the local compute); then accumulate the
    halo edges from the received block.  Differentiable: the AD
    transpose of the exchange is the reverse exchange.
    """
    npp = hg.nodes_per_part
    n_ex = len(exchange_operands(hg))

    def local_fn(x_local, lsrc, ldst, hsrc, hdst, *ex_blocks):
        recv = make_exchange(hg, list(ex_blocks), axis)(x_local)
        # local contribution — independent of the collective, overlaps
        lmsg = jnp.take(x_local, lsrc[0], axis=0)
        out = jax.ops.segment_sum(lmsg, ldst[0], num_segments=npp + 1)
        hmsg = jnp.take(recv, hsrc[0], axis=0)
        out = out + jax.ops.segment_sum(hmsg, hdst[0],
                                        num_segments=npp + 1)
        return out[:npp]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * (5 + n_ex),
        out_specs=P(axis))
    return fn(x, hg.lsrc, hg.ldst, hg.hsrc, hg.hdst,
              *exchange_operands(hg))


def halo_degrees(hg: HaloShardedGraph, mesh: Mesh, axis: str = "data",
                 direction: str = "in"):
    """(P*npp,) degree vector sharded over the mesh (static tables)."""
    spec = NamedSharding(mesh, P(axis))
    tab = hg.in_deg if direction == "in" else hg.out_deg
    return jax.device_put(tab.reshape(-1), spec)
