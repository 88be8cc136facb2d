"""Sampled-minibatch training on the mesh plane (TPU-native DistDGL).

The reference's distributed training regime is: sample blocks from a
partitioned graph via per-partition services, pull the input frontier's
features from the KVStore, train data-parallel (reference
``python/dgl/distributed/graph_services.py:35-255`` sample_neighbors,
``dist_graph.py:519`` DistGraph, ``dataloading/dist_dataloader.py``).
This module re-designs that loop as ONE SPMD program over a
``jax.sharding.Mesh`` — no RPC, no host round-trip:

* the graph's CSC lives row-sharded over the mesh (``MeshCSC``; each
  device owns the in-edges of its dst range — the same dst partition as
  the halo plane);
* **sampling** routes every frontier node to its owner with an
  ``all_gather`` of the id list, runs the jittable per-device sampler
  (``sampling/device.py`` — exact without-replacement Fisher-Yates),
  and returns each requester its ``(M, fanout)`` table with a
  ``psum_scatter`` (reduce_scatter).  Fanout-sampled neighborhoods are
  REGULAR, so blocks are dense ``(M, k)`` tensors — the TPU answer to
  the reference's ragged ``MFG`` blocks;
* **feature pull** is the classic distributed embedding lookup:
  ``all_gather`` the wanted ids, mask-gather locally, ``psum_scatter``
  the rows back (the KVStore ``pull`` of ``kvstore.py:962`` as one
  collective pair);
* frontiers NEST as prefixes (level l+1 = [level l, its sampled
  neighbors]), so one feature gather at the innermost frontier feeds
  every layer positionally — ``block_mean`` reduces a level's neighbor
  slab back onto the previous level.

Everything is static-shape and jit/scan-safe: the whole train step
(sample + gather + fwd + bwd + psum grads) is one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling.device import sample_neighbors_device


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MeshCSC:
    """Row-sharded CSC: device p holds the in-edges of dst range
    [p*npp, (p+1)*npp) with GLOBAL (reshuffled-order) src ids.

    indptr:  (P, npp+1) int32
    indices: (P, E_max) int32 — global new-order src ids, 0-padded
    """

    indptr: jnp.ndarray
    indices: jnp.ndarray
    num_nodes: int
    nodes_per_part: int
    num_parts: int

    def tree_flatten(self):
        return ((self.indptr, self.indices),
                (self.num_nodes, self.nodes_per_part, self.num_parts))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _pack_mesh_csc(new_row, new_col, n, npp, num_parts):
    """Shared CSC packing: edges in RESHUFFLED (new-order) ids ->
    (indptr (P, npp+1), indices (P, E_max)) numpy arrays.

    Capacity contract (docs/capacity.md): global node ids are int32
    (n < 2^31 — guarded), and each SHARD's local edge count must stay
    under 2^31 (per-shard indptr is int32); the TOTAL edge count is
    unbounded — this is the per-shard local-id contract that carries
    papers100M-class graphs (3.2B directed edges ~ 400M/shard over 8)."""
    from ..graph.unitgraph import INT32_MAX
    if n > INT32_MAX:
        raise ValueError(
            f"build_mesh_csc: {n} nodes exceeds int32 global node ids "
            f"(2^31-1); see docs/capacity.md")
    own = np.minimum(new_col // npp, num_parts - 1)
    counts = np.bincount(own, minlength=num_parts)
    if len(counts) and int(counts.max()) > INT32_MAX:
        raise ValueError(
            f"build_mesh_csc: shard {int(counts.argmax())} holds "
            f"{int(counts.max())} edges > 2^31-1 (per-shard indptr is "
            f"int32); increase num_parts (see docs/capacity.md)")
    e_max = max(int(counts.max()) if len(counts) else 0, 1)
    indptr = np.zeros((num_parts, npp + 1), np.int32)
    indices = np.zeros((num_parts, e_max), np.int32)
    order = np.argsort(own * np.int64(n + 1) + new_col, kind="stable")
    start = 0
    for p in range(num_parts):
        sel = order[start:start + counts[p]]
        start += counts[p]
        lc = new_col[sel] - p * npp
        indptr[p, 1:] = np.cumsum(np.bincount(lc, minlength=npp))
        indices[p, :len(sel)] = new_row[sel]
    return indptr, indices


def _place_mesh_csc(indptr, indices, n, npp, num_parts, mesh, axis):
    mcsc = MeshCSC(jnp.asarray(indptr), jnp.asarray(indices), n, npp,
                   num_parts)
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec) if hasattr(x, "ndim") else x,
        mcsc)


def build_mesh_csc(g, mg, mesh: Optional[Mesh] = None,
                   axis: str = "data") -> MeshCSC:
    """Build the sharded CSC for ``g`` in ``mg``'s partition layout
    (``mg`` = the MeshGraph from ``shard_graph``; its ``perm`` fixes the
    node reshuffle so features staged with ``shard_node_array`` line
    up).  Reference counterpart: the per-partition ``local_partition``
    graphs served by ``DistGraphServer``."""
    mesh = mesh or mg.mesh
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    inv = np.empty(n, np.int64)
    inv[np.asarray(mg.perm)] = np.arange(n)
    new_row = inv[row]
    new_col = inv[col]
    npp = mg.hg.nodes_per_part
    num_parts = mg.hg.num_parts
    indptr, indices = _pack_mesh_csc(new_row, new_col, n, npp, num_parts)
    return _place_mesh_csc(indptr, indices, n, npp, num_parts, mesh, axis)


def build_mesh_csc_edges(row, col, num_nodes: int, mesh: Mesh,
                         axis: str = "data",
                         partition: Optional[np.ndarray] = None):
    """Standalone sampled-plane build — the memory-light road to
    papers100M-class graphs.  Unlike :func:`build_mesh_csc` (which
    rides a ``MeshGraph`` and therefore the full-batch halo plane),
    this packs the sharded CSC DIRECTLY from an edge list: per-device
    state is O(E/P + N/P) — the MeshCSC indices slice (~E/P * 4 B) +
    indptr (~N/P * 4 B) — with no halo plane, no dense kernel formats.

    ``partition``: optional (num_nodes,) part assignment (e.g. METIS);
    nodes are reshuffled so each partition is a contiguous new-id range
    (the RangePartitionBook contract, reference
    ``distributed/partition.py:648`` id reshuffle).  Default: contiguous
    ranges in original order (perm = identity).

    Returns ``(mcsc, perm)`` where ``perm[new_id] = original_id``;
    stage features with ``mesh_shard_rows(x, perm, mcsc, mesh)``."""
    num_parts = int(mesh.shape[axis])
    n = int(num_nodes)
    row = np.asarray(row)
    col = np.asarray(col)
    if partition is None:
        perm = np.arange(n, dtype=np.int64)
        new_row, new_col = row.astype(np.int64), col.astype(np.int64)
    else:
        perm = np.argsort(np.asarray(partition), kind="stable")
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        new_row = inv[row]
        new_col = inv[col]
    npp = -(-n // num_parts)
    indptr, indices = _pack_mesh_csc(new_row, new_col, n, npp, num_parts)
    return _place_mesh_csc(indptr, indices, n, npp, num_parts, mesh,
                           axis), perm


def mesh_shard_rows(x, perm, mcsc: MeshCSC, mesh: Mesh,
                    axis: str = "data"):
    """Permute + pad + device_put an original-order (num_nodes, *F)
    array into the sampled plane's row-sharded (P*npp, *F) layout."""
    x = np.asarray(x)[np.asarray(perm)]
    total = mcsc.num_parts * mcsc.nodes_per_part
    pad = total - x.shape[0]
    if pad > 0:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(jnp.asarray(x),
                          NamedSharding(mesh, P(axis)))


# ---------------------------------------------------------------------------
# in-shard distributed primitives (call inside shard_map)
# ---------------------------------------------------------------------------


def _owner_route(ids, npp, axis):
    """all_gather the id list; return (all_ids, local_id, mine-mask)."""
    all_ids = jax.lax.all_gather(ids, axis, tiled=True)      # (P*M,)
    me = jax.lax.axis_index(axis)
    lid = all_ids - me * npp
    mine = (lid >= 0) & (lid < npp)
    return all_ids, jnp.clip(lid, 0, npp - 1), mine


def dist_gather_rows(x_local, ids, npp, axis):
    """Distributed row gather (KVStore pull as collectives): ``ids``
    (M,) global ids on THIS device -> (M, *F) rows pulled from their
    owners.  x_local: (npp, *F)."""
    _, lid, mine = _owner_route(ids, npp, axis)
    rows = jnp.take(x_local, lid, axis=0)
    m = mine.reshape(mine.shape + (1,) * (rows.ndim - 1))
    rows = jnp.where(m, rows, 0)
    return jax.lax.psum_scatter(rows, axis, scatter_dimension=0,
                                tiled=True)


def dist_sample_neighbors(indptr_local, indices_local, ids, fanout: int,
                          key, npp, axis, replace: bool = False):
    """Distributed fanout sampling: each frontier id is sampled by the
    device owning its in-edges; requesters get dense (M, fanout) tables.

    Returns (nbrs, mask): global new-order neighbor ids, validity (False
    where degree < fanout without replacement, or degree == 0)."""
    _, lid, mine = _owner_route(ids, npp, axis)
    key = jax.random.fold_in(key, jax.lax.axis_index(axis))
    nbrs, _, mask = sample_neighbors_device(
        indptr_local, indices_local, lid, fanout, key, replace=replace)
    mask = mask & mine[:, None]
    nbrs = jnp.where(mask, nbrs, 0)
    nbrs = jax.lax.psum_scatter(nbrs, axis, scatter_dimension=0,
                                tiled=True)
    mask = jax.lax.psum_scatter(mask.astype(jnp.int32), axis,
                                scatter_dimension=0, tiled=True) > 0
    return nbrs, mask


# ---------------------------------------------------------------------------
# blocks: nested frontiers + positional reduction
# ---------------------------------------------------------------------------


def _apply_exclusion(nbrs, mask, ids, excl_src, excl_dst,
                     chunk: int = 256):
    """Invalidate sampled edges (nbrs[i, j] -> ids[i]) that appear in
    the exclusion pair list (link-prediction leakage removal, reference
    ``dataloading/base.py:164-658`` ``exclude_eids``).  Exact
    value-based matching, scanned over fixed-size exclusion chunks so
    the (M, k, X) compare never materializes."""
    x = excl_src.shape[0]
    pad = (-x) % chunk
    es = jnp.concatenate(
        [excl_src, jnp.full((pad,), -1, jnp.int32)]).reshape(-1, chunk)
    ed = jnp.concatenate(
        [excl_dst, jnp.full((pad,), -1, jnp.int32)]).reshape(-1, chunk)

    def body(hit, se):
        s, d = se
        h = ((nbrs[:, :, None] == s[None, None, :])
             & (ids[:, None, None] == d[None, None, :])).any(-1)
        return hit | h, None

    # initial carry derives from nbrs so its varying-manual-axes type
    # matches the body output under shard_map (nbrs is always >= 0)
    hit, _ = jax.lax.scan(body, nbrs < 0, (es, ed))
    return mask & ~hit


def sample_seed_edges(mcsc: MeshCSC, s_per_dev: int, key, mesh: Mesh,
                      axis: str = "data"):
    """Uniform positive seed edges for link prediction: each device
    draws ``s_per_dev`` edges from ITS local edge set (dst-owned CSC
    rows).  Returns (src, dst) — (P, S) global new-order ids.
    Reference: seed-edge minibatches of ``as_edge_prediction_sampler``
    (``dataloading/base.py:164``)."""
    npp = mcsc.nodes_per_part

    def local_fn(indptr, indices):
        indptr, indices = indptr[0], indices[0]
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key, me)
        el = indptr[-1]
        pos = jax.random.randint(k, (s_per_dev,), 0,
                                 jnp.maximum(el, 1), jnp.int32)
        dst_l = jnp.searchsorted(indptr, pos, side="right").astype(
            jnp.int32) - 1
        src = jnp.take(indices, pos)
        return src[None], (dst_l + me * npp)[None]

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis)),
                       out_specs=(P(axis), P(axis)))
    return fn(mcsc.indptr, mcsc.indices)


def edge_minibatch_seeds(pos_src, pos_dst, neg_dst):
    """Node-frontier seeds for an edge-prediction minibatch: the layout
    is [pos_src | pos_dst | neg_dst (flattened)] per device, so scoring
    slices are positional prefixes.  pos_* (P, S); neg_dst (P, S, K)."""
    p, s = pos_src.shape
    return jnp.concatenate(
        [pos_src, pos_dst, neg_dst.reshape(p, -1)], axis=1)


def frontier_sizes(num_seeds: int, fanouts: Sequence[int]):
    """Level sizes M_0..M_L for nested frontiers (M_{l+1} =
    M_l * (1 + k_l))."""
    sizes = [num_seeds]
    for k in fanouts:
        sizes.append(sizes[-1] * (1 + k))
    return sizes


def sample_frontier(mcsc: MeshCSC, seeds, fanouts: Sequence[int], key,
                    mesh: Mesh, axis: str = "data",
                    replace: bool = False, exclude=None):
    """SPMD minibatch sampling: ``seeds`` (P, S) global new-order ids
    (any device may ask for any node).  Returns
    (ids (P, M_L), masks tuple of (P, M_l, k_l)) — level l+1's ids are
    [level l's ids, its neighbor slab], so slicing prefixes recovers
    every layer's dst list.

    ``exclude``: optional ``(excl_src, excl_dst)`` (P, X) global-id
    pairs — the whole global batch's seed edges (all_gathered
    internally) are removed from EVERY layer's sampled frontier, the
    reference's link-prediction leakage removal
    (``dataloading/base.py:164-658`` ``exclude_eids``; pass reversed
    copies too for ``exclude="reverse_id"`` semantics)."""
    npp = mcsc.nodes_per_part

    def local_fn(indptr, indices, seeds, *excl):
        ids = seeds[0]
        if excl:
            ex_s = jax.lax.all_gather(excl[0][0], axis, tiled=True)
            ex_d = jax.lax.all_gather(excl[1][0], axis, tiled=True)
        masks = []
        for i, k in enumerate(fanouts):
            nbrs, m = dist_sample_neighbors(
                indptr[0], indices[0], ids, int(k),
                jax.random.fold_in(key, i), npp, axis, replace=replace)
            if excl:
                m = _apply_exclusion(nbrs, m, ids, ex_s, ex_d)
                nbrs = jnp.where(m, nbrs, 0)
            masks.append(m[None])
            ids = jnp.concatenate([ids, nbrs.reshape(-1)])
        return (ids[None],) + tuple(masks)

    operands = [mcsc.indptr, mcsc.indices, jnp.asarray(seeds, jnp.int32)]
    if exclude is not None:
        operands += [jnp.asarray(exclude[0], jnp.int32),
                     jnp.asarray(exclude[1], jnp.int32)]
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis),) * len(operands),
                       out_specs=(P(axis),) * (1 + len(fanouts)))
    out = fn(*operands)
    return out[0], tuple(out[1:])


def gather_frontier(x, ids, mcsc: MeshCSC, mesh: Mesh,
                    axis: str = "data"):
    """Pull rows of the row-sharded node array ``x`` (P*npp, *F) for the
    per-device id lists ``ids`` (P, M) -> (P, M, *F)."""
    npp = mcsc.nodes_per_part

    def local_fn(x_local, ids_b):
        return dist_gather_rows(x_local, ids_b[0], npp, axis)[None]

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis)), out_specs=P(axis))
    return fn(x, jnp.asarray(ids, jnp.int32))


# ---------------------------------------------------------------------------
# heterogeneous minibatches: typed frontiers over per-etype CSCs
# ---------------------------------------------------------------------------


def build_hetero_mesh_csc(g, hmg, mesh: Optional[Mesh] = None,
                          axis: str = "data"):
    """Per-etype row-sharded CSCs for a :class:`HeteroMeshGraph` —
    device p holds the in-edges of its range of each dst space, with
    GLOBAL (reshuffled) src ids of the SRC space.  Returns
    ({cet: MeshCSC}, {ntype: nodes_per_part}).  Reference: the
    per-partition hetero graphs served by ``DistGraphServer``
    (``distributed/dist_graph.py:519``)."""
    mesh = mesh or hmg.mesh
    num_parts = int(mesh.shape[axis])
    npp = {nt: hmg._num_nodes[hmg.get_ntype_id(nt)] // num_parts
           for nt in hmg.ntypes}
    invs = {}
    for nt in hmg.ntypes:
        n = hmg._num_orig[nt]
        inv = np.empty(n, np.int64)
        inv[np.asarray(hmg.perms[nt])] = np.arange(n)
        invs[nt] = inv
    spec = NamedSharding(mesh, P(axis))
    cscs = {}
    for etid, cet in enumerate(hmg.canonical_etypes):
        st, _, dt = cet
        row, col = (np.asarray(a) for a in g._units[etid].coo())
        new_row = invs[st][row]
        new_col = invs[dt][col]
        npp_d = npp[dt]
        own = np.minimum(new_col // npp_d, num_parts - 1)
        counts = np.bincount(own, minlength=num_parts)
        e_max = max(int(counts.max()) if len(counts) else 0, 1)
        indptr = np.zeros((num_parts, npp_d + 1), np.int32)
        indices = np.zeros((num_parts, e_max), np.int32)
        order = np.argsort(own * (hmg._num_orig[dt] + 1) + new_col,
                           kind="stable")
        start = 0
        for p in range(num_parts):
            sel = order[start:start + counts[p]]
            start += counts[p]
            lc = new_col[sel] - p * npp_d
            indptr[p, 1:] = np.cumsum(np.bincount(lc, minlength=npp_d))
            indices[p, :len(sel)] = new_row[sel]
        mcsc = MeshCSC(jnp.asarray(indptr), jnp.asarray(indices),
                       hmg._num_orig[dt], npp_d, num_parts)
        cscs[cet] = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec) if hasattr(x, "ndim")
            else x, mcsc)
    return cscs, npp


def hetero_frontier_sizes(seed_counts, fanouts):
    """Per-level typed frontier sizes.  ``seed_counts``: {ntype: S};
    ``fanouts``: list over layers of {cet: k}.  Level l+1's ids for
    ntype st are [level l's st ids, one (M_l[dt] * k) slab per cet with
    src == st, in sorted-cet order] — the typed version of the nested
    prefix layout."""
    sizes = [dict(seed_counts)]
    for layer in fanouts:
        cur = sizes[-1]
        nxt = dict(cur)
        for cet in sorted(layer):
            st, _, dt = cet
            nxt[st] = nxt.get(st, 0) + cur.get(dt, 0) * int(layer[cet])
        sizes.append(nxt)
    return sizes


def hetero_sample_frontier(cscs, seeds, fanouts, key, mesh: Mesh,
                           axis: str = "data", replace: bool = False):
    """SPMD heterogeneous minibatch sampling: ``seeds`` {ntype: (P, S)}
    global new-order ids, ``fanouts`` list over layers of {canonical
    etype: fanout}.  Per layer, every etype samples in-neighbors of the
    current dt frontier from its own sharded CSC (owner-routed).

    Returns (ids {ntype: (P, M_final)}, masks {(layer, cet):
    (P, M_l[dt], k)}) in the layout of :func:`hetero_frontier_sizes`.
    Reference: per-etype ``sample_neighbors`` fan-out in
    ``distributed/graph_services.py:35-255``."""
    ids = {nt: jnp.asarray(v, jnp.int32) for nt, v in seeds.items()}
    masks = {}
    for li, layer in enumerate(fanouts):
        slabs = {nt: [ids[nt]] for nt in ids}
        for cet_i, cet in enumerate(sorted(layer)):
            st, _, dt = cet
            if dt not in ids:
                continue
            k = int(layer[cet])
            mcsc = cscs[cet]
            npp = mcsc.nodes_per_part

            def local_fn(indptr, indices, cur, *, _k=k, _npp=npp,
                         _key=jax.random.fold_in(key, 7 * li + 1),
                         _cet_i=cet_i):
                nbrs, m = dist_sample_neighbors(
                    indptr[0], indices[0], cur[0], _k,
                    jax.random.fold_in(_key, _cet_i), _npp, axis,
                    replace=replace)
                return nbrs[None], m[None]

            fn = jax.shard_map(local_fn, mesh=mesh,
                               in_specs=(P(axis),) * 3,
                               out_specs=(P(axis), P(axis)))
            nbrs, m = fn(mcsc.indptr, mcsc.indices, ids[dt])
            masks[(li, cet)] = m
            slabs.setdefault(st, []).append(
                nbrs.reshape(nbrs.shape[0], -1))
        ids = {nt: jnp.concatenate(v, axis=1) for nt, v in slabs.items()}
    return ids, masks


def hetero_gather_frontier(xs, ids, npp, mesh: Mesh, axis: str = "data"):
    """Pull rows per ntype: ``xs``/``ids``/``npp`` keyed by ntype."""
    out = {}
    for nt, id_tab in ids.items():
        if nt not in xs:
            continue

        def local_fn(x_local, ids_b, *, _npp=npp[nt]):
            return dist_gather_rows(x_local, ids_b[0], _npp, axis)[None]

        fn = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(P(axis), P(axis)),
                           out_specs=P(axis))
        out[nt] = fn(xs[nt], jnp.asarray(id_tab, jnp.int32))
    return out


def hetero_block_reduce(h_by_nt, masks, sizes, fanouts, layer: int,
                        combine, raw_slabs: bool = False):
    """Reduce one layer of typed nested frontiers: for each ntype nt,
    ``combine(nt, h_dst (..., M, F), {cet: (mean (..., M, F), mask)})``
    -> new dst features.  Walks the sorted-cet slab layout of
    :func:`hetero_sample_frontier`.  Returns {ntype: (..., M_l[nt], F')}.

    ``raw_slabs=True`` skips the built-in mean and hands combine the
    positional slab itself: ``{cet: (slab (..., M, k, F),
    mask (..., M, k))}`` — per-relation attention (typed GAT/HGT on
    sampled blocks) is then a dense masked softmax over the k axis,
    exactly as in :func:`block_gat`."""
    cur = sizes[layer]
    offs = {nt: cur.get(nt, 0) for nt in h_by_nt}
    slabs = {}
    for cet in sorted(fanouts[layer]):
        st, _, dt = cet
        if dt not in cur or st not in h_by_nt:
            continue
        k = int(fanouts[layer][cet])
        m_dt = cur.get(dt, 0)
        h = h_by_nt[st]
        lead = h.shape[:-2]
        f = h.shape[-1]
        slab = h[..., offs[st]: offs[st] + m_dt * k, :].reshape(
            lead + (m_dt, k, f))
        offs[st] += m_dt * k
        mask = masks[(layer, cet)]
        if raw_slabs:
            slabs.setdefault(dt, {})[cet] = (slab, mask)
            continue
        mk = mask.astype(h.dtype)[..., None]
        mean = (slab * mk).sum(-2) / jnp.maximum(mk.sum(-2), 1.0)
        slabs.setdefault(dt, {})[cet] = mean
    out = {}
    for nt, h in h_by_nt.items():
        m_nt = cur.get(nt, 0)
        if m_nt == 0:
            continue
        out[nt] = combine(nt, h[..., :m_nt, :], slabs.get(nt, {}))
    return out


def block_mean(h, mask, m_prev: int, fanout: int):
    """Reduce one nested level: ``h`` (..., M_l*(1+k), F) positional
    frontier features -> (dst (..., M_l, F), neigh-mean (..., M_l, F)).
    ``mask`` (..., M_l, k)."""
    lead = h.shape[:-2]
    f = h.shape[-1]
    dst = h[..., :m_prev, :]
    nbr = h[..., m_prev:, :].reshape(lead + (m_prev, fanout, f))
    mk = mask.astype(h.dtype)[..., None]
    s = (nbr * mk).sum(-2)
    cnt = jnp.maximum(mk.sum(-2), 1.0)
    return dst, s / cnt


def block_gat(ft, el, er, mask, m_prev: int, fanout: int,
              negative_slope: float = 0.2, include_self: bool = True):
    """GAT attention reduce over one nested level — the attention
    counterpart of :func:`block_mean` (reference GATConv on sampled MFG
    blocks, ``python/dgl/nn/pytorch/conv/gatconv.py`` forward on a
    block).  Because fanout-sampled neighborhoods are REGULAR here, the
    per-dst softmax is a dense softmax over the fanout axis — no edge
    scatter, no segment ids, pure VPU.

    ``ft``   (..., M_l*(1+k), H, D)  projected frontier features
    ``el``   (..., M_l*(1+k), H)     per-src attention logits (a_l . ft)
    ``er``   same shape              per-dst logits (a_r . ft)
    ``mask`` (..., M_l, k)           sampled-slot validity

    Returns (..., M_l, H, D): for each dst, softmax over its k sampled
    neighbors (+ itself when ``include_self``, the reference's
    self-loop convention) of leaky_relu(el_src + er_dst), then the
    attention-weighted sum of neighbor features."""
    lead = ft.shape[:-3]
    h, d = ft.shape[-2:]
    nbr_ft = ft[..., m_prev:, :, :].reshape(
        lead + (m_prev, fanout, h, d))
    el_n = el[..., m_prev:, :].reshape(lead + (m_prev, fanout, h))
    er_d = er[..., :m_prev, :][..., :, None, :]        # (..., M, 1, H)
    logits = jax.nn.leaky_relu(el_n + er_d, negative_slope)
    neg = jnp.asarray(-1e9, ft.dtype)
    logits = jnp.where(mask[..., None], logits, neg)
    if include_self:
        self_lg = jax.nn.leaky_relu(
            el[..., :m_prev, :] + er[..., :m_prev, :],
            negative_slope)[..., :, None, :]           # (..., M, 1, H)
        logits = jnp.concatenate([self_lg, logits], axis=-2)
    mx = logits.max(-2, keepdims=True)
    a = jnp.exp(logits - mx)
    a = a / jnp.maximum(a.sum(-2, keepdims=True), 1e-9)
    if include_self:
        a_self, a_nbr = a[..., :1, :], a[..., 1:, :]
        dst_ft = ft[..., :m_prev, :, :]
        out = (a_nbr[..., None] * nbr_ft).sum(-3) \
            + a_self[..., 0, :, None] * dst_ft
    else:
        out = (a[..., None] * nbr_ft).sum(-3)
    return out
