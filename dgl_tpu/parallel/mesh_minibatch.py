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
    own = np.minimum(new_col // npp, num_parts - 1)
    counts = np.bincount(own, minlength=num_parts)
    e_max = max(int(counts.max()) if len(counts) else 0, 1)
    indptr = np.zeros((num_parts, npp + 1), np.int32)
    indices = np.zeros((num_parts, e_max), np.int32)
    order = np.argsort(own * (n + 1) + new_col, kind="stable")
    start = 0
    for p in range(num_parts):
        sel = order[start:start + counts[p]]
        start += counts[p]
        lc = new_col[sel] - p * npp
        indptr[p, 1:] = np.cumsum(np.bincount(lc, minlength=npp))
        indices[p, :len(sel)] = new_row[sel]
    mcsc = MeshCSC(jnp.asarray(indptr), jnp.asarray(indices), n, npp,
                   num_parts)
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec) if hasattr(x, "ndim") else x,
        mcsc)


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


def frontier_sizes(num_seeds: int, fanouts: Sequence[int]):
    """Level sizes M_0..M_L for nested frontiers (M_{l+1} =
    M_l * (1 + k_l))."""
    sizes = [num_seeds]
    for k in fanouts:
        sizes.append(sizes[-1] * (1 + k))
    return sizes


def sample_frontier(mcsc: MeshCSC, seeds, fanouts: Sequence[int], key,
                    mesh: Mesh, axis: str = "data",
                    replace: bool = False):
    """SPMD minibatch sampling: ``seeds`` (P, S) global new-order ids
    (any device may ask for any node).  Returns
    (ids (P, M_L), masks tuple of (P, M_l, k_l)) — level l+1's ids are
    [level l's ids, its neighbor slab], so slicing prefixes recovers
    every layer's dst list."""
    npp = mcsc.nodes_per_part

    def local_fn(indptr, indices, seeds):
        ids = seeds[0]
        masks = []
        for i, k in enumerate(fanouts):
            nbrs, m = dist_sample_neighbors(
                indptr[0], indices[0], ids, int(k),
                jax.random.fold_in(key, i), npp, axis, replace=replace)
            masks.append(m[None])
            ids = jnp.concatenate([ids, nbrs.reshape(-1)])
        return (ids[None],) + tuple(masks)

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=(P(axis),) * (1 + len(fanouts)))
    out = fn(mcsc.indptr, mcsc.indices, jnp.asarray(seeds, jnp.int32))
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
