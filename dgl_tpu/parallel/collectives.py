"""Sparse all-to-all collectives over the device mesh.

Reference: ``python/dgl/cuda/nccl.py:7-60`` (``sparse_all_to_all_push``
/ ``_pull``) used by the sharded-embedding optimizers
(``optim/pytorch/sparse_optim.py:184``).  The NCCL plane becomes XLA
``lax.all_to_all`` over an ICI mesh axis; ragged per-destination counts
become static ``capacity`` slots + validity masks (the price of XLA's
static shapes — pick capacity ≥ max items one device sends to one peer).

All functions are written per-shard (for use inside ``shard_map``); the
``*_sharded`` wrappers run them over a mesh for you.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _bucket_by_owner(idx, val, valid, owner, num_parts: int,
                     capacity: int):
    """Scatter items into (num_parts, capacity) slots by destination.

    Returns (idx_out, val_out, valid_out); items beyond ``capacity`` for
    a destination are dropped (mirrors a too-small NCCL buffer — size
    capacity generously)."""
    n = idx.shape[0]
    owner = jnp.where(valid, owner, num_parts)          # parked lane
    # position of each item within its destination group
    one_hot = (owner[:, None] == jnp.arange(num_parts + 1)[None]
               ).astype(jnp.int32)
    pos_in_group = jnp.cumsum(one_hot, axis=0) - 1      # (n, P+1)
    pos = jnp.take_along_axis(pos_in_group, owner[:, None],
                              axis=1).squeeze(1)
    keep = valid & (pos < capacity)
    slot = jnp.where(keep, owner * capacity + pos, num_parts * capacity)
    idx_out = jnp.zeros((num_parts * capacity + 1,), idx.dtype)
    idx_out = idx_out.at[slot].set(jnp.where(keep, idx, 0))[:-1]
    val_out = jnp.zeros((num_parts * capacity + 1,) + val.shape[1:],
                        val.dtype)
    val_out = val_out.at[slot].set(
        jnp.where(keep[(...,) + (None,) * (val.ndim - 1)], val, 0))[:-1]
    valid_out = jnp.zeros((num_parts * capacity + 1,), bool)
    valid_out = valid_out.at[slot].set(keep)[:-1]
    return (idx_out.reshape(num_parts, capacity),
            val_out.reshape((num_parts, capacity) + val.shape[1:]),
            valid_out.reshape(num_parts, capacity))


def sparse_all_to_all_push(idx, val, valid, owner, axis: str,
                           num_parts: int, capacity: int):
    """Per-shard push (inside shard_map): route (idx, val) rows to the
    device given by ``owner``; returns what THIS device received:
    (idx (P*cap,), val (P*cap, F), valid (P*cap,))."""
    bi, bv, bm = _bucket_by_owner(idx, val, valid, owner, num_parts,
                                  capacity)
    ri = jax.lax.all_to_all(bi, axis, 0, 0, tiled=False)
    rv = jax.lax.all_to_all(bv, axis, 0, 0, tiled=False)
    rm = jax.lax.all_to_all(bm, axis, 0, 0, tiled=False)
    flat = lambda a: a.reshape((num_parts * capacity,) + a.shape[2:])
    return flat(ri), flat(rv), flat(rm)


def sparse_all_to_all_pull(req_idx, valid, owner, local_table, axis: str,
                           num_parts: int, capacity: int,
                           range_start):
    """Per-shard pull: request rows of a partition-sharded table by
    global id.  Returns values aligned with ``req_idx`` (zeros where
    invalid/dropped).

    Implementation = push of requests + gather on the owner + reverse
    all_to_all using the same slot layout (so responses land back in the
    requesting slots deterministically)."""
    n = req_idx.shape[0]
    # remember each request's slot so we can unscatter the response
    bi, bslot, bm = _bucket_by_owner(
        req_idx, jnp.arange(n, dtype=jnp.int32)[:, None], valid, owner,
        num_parts, capacity)
    ri = jax.lax.all_to_all(bi, axis, 0, 0, tiled=False)
    rm = jax.lax.all_to_all(bm, axis, 0, 0, tiled=False)
    # serve: gather local rows for received requests
    local_ids = ri.reshape(-1) - range_start
    local_ids = jnp.clip(local_ids, 0, local_table.shape[0] - 1)
    served = jnp.take(local_table, local_ids, axis=0)
    served = served * rm.reshape(-1)[(...,) + (None,) * (
        served.ndim - 1)].astype(served.dtype)
    served = served.reshape((num_parts, capacity) + served.shape[1:])
    # reverse route: all_to_all is its own inverse for this layout
    back = jax.lax.all_to_all(served, axis, 0, 0, tiled=False)
    back = back.reshape((num_parts * capacity,) + back.shape[2:])
    slots = bslot.reshape(num_parts * capacity).astype(jnp.int32)
    mask = bm.reshape(num_parts * capacity)
    out = jnp.zeros((n,) + back.shape[1:], back.dtype)
    out = out.at[jnp.where(mask, slots, n)].set(
        back, mode="drop")
    return out


def _owner_of(idx, part_size: int):
    return (idx // part_size).astype(jnp.int32)


def push_sharded(mesh: Mesh, axis: str, idx, val, owner,
                 capacity: int):
    """Host-level wrapper: ``idx``/``val``/``owner`` are (P, n) arrays
    (leading axis = device); returns per-device received triples."""
    from jax.experimental.shard_map import shard_map
    num_parts = mesh.shape[axis]
    valid = owner >= 0

    def body(i, v, m, o):
        ri, rv, rm = sparse_all_to_all_push(
            i[0], v[0], m[0], o[0], axis, num_parts, capacity)
        return ri[None], rv[None], rm[None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis)),
                   out_specs=P(axis))
    # each output row d = what device d received (P*capacity slots)
    ri, rv, rm = fn(idx, val, valid, jnp.maximum(owner, 0))
    return ri, rv, rm


def pull_sharded(mesh: Mesh, axis: str, req_idx, table,
                 capacity: int):
    """Pull rows of a row-sharded ``table`` ((P*rows_per, F), sharded on
    axis) by global ids ``req_idx`` ((P, n), per-device requests)."""
    from jax.experimental.shard_map import shard_map
    num_parts = mesh.shape[axis]
    rows_per = table.shape[0] // num_parts
    owner = (req_idx // rows_per).astype(jnp.int32)
    valid = (req_idx >= 0) & (req_idx < table.shape[0])

    def body(i, m, o, tbl):
        start = jax.lax.axis_index(axis) * rows_per
        return sparse_all_to_all_pull(i[0], m[0], o[0], tbl, axis,
                                      num_parts, capacity, start)[None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis)),
                   out_specs=P(axis))
    return fn(req_idx, valid, owner, table)
