"""Fully on-device minibatch sampling: frontier -> compacted block ->
feature rows, all inside one jitted step.

The reference's fastest pipeline samples on the GPU from a pinned graph
(UVA mode, ``dataloading/dataloader.py:727-735``; GraphBolt CUDA
``neighbor_sampler.cu`` + ``unique_and_compact_impl.cu``).  The TPU
analog keeps the CSC **in HBM** and runs the whole minibatch expansion
inside the compiled step — zero host round-trips per batch; the host
only feeds seed ids.

Everything is static-shape (XLA): ``fanout`` picks per seed with a
validity mask, frontier ids compacted into a fixed ``capacity`` buffer
(the padded-block contract of ``dataloading/pad.py``), neighbor indices
remapped block-locally by a binary search over the sorted unique ids.

Sizing: ``capacity`` must cover the worst-case distinct frontier,
``min(S*(fanout+1), num_nodes)`` — enforced with a static check at
trace time; the actual unique count is returned for monitoring.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..sampling.device import sample_neighbors_device, unique_with_capacity


class DeviceBlock(NamedTuple):
    """A compacted one-layer message-flow block living on device.

    src_ids:     (capacity,) int32 — sorted unique global ids of the
                 block's source nodes (seeds included), -1 padded
    num_src:     () int32 — number of valid src_ids
    seeds_local: (S,) int32 — each seed's row in src_ids
    nbr_local:   (S, fanout) int32 — sampled neighbors as src_ids rows
    mask:        (S, fanout) bool
    eids:        (S, fanout) int32 — CSC edge positions (-1 invalid)
    """

    src_ids: jnp.ndarray
    num_src: jnp.ndarray
    seeds_local: jnp.ndarray
    nbr_local: jnp.ndarray
    mask: jnp.ndarray
    eids: jnp.ndarray


@partial(jax.jit, static_argnames=("fanout", "capacity", "replace"))
def sample_block_device(indptr, indices, seeds, fanout: int,
                        capacity: int, key, replace: bool = False,
                        probs=None) -> DeviceBlock:
    """Sample one MFG layer on device (reference `to_block` contract:
    dst nodes = seeds, src = seeds + sampled neighbors, `transforms/
    to_block.py:28` — here as static-shape tensors).

    ``probs``: optional (num_edges,) weights or bool mask in CSC edge
    order — routes to the weighted device sampler (``probs_or_mask``
    parity, reference ``fused_csc_sampling_graph.h:296-345``)."""
    s = seeds.shape[0]
    # static safety bound: distinct frontier ids <= seeds + all picks,
    # and never more than the node count — an undersized capacity would
    # silently drop ids and remap neighbors to WRONG feature rows
    n_upper = indptr.shape[0] - 1
    need = min(s * (fanout + 1), n_upper)
    if capacity < need:
        raise ValueError(
            f"capacity={capacity} < worst-case distinct frontier {need} "
            f"(seeds {s} x (fanout {fanout} + 1), graph has {n_upper} "
            f"nodes)")
    if probs is None:
        nbrs, eids, mask = sample_neighbors_device(
            indptr, indices, seeds, fanout, key, replace)
    else:
        from ..sampling.device import sample_neighbors_prob_device
        nbrs, eids, mask = sample_neighbors_prob_device(
            indptr, indices, probs, seeds, fanout, key, replace=replace)
    all_ids = jnp.concatenate([seeds.astype(jnp.int32),
                               nbrs.reshape(-1)])
    all_mask = jnp.concatenate([jnp.ones((s,), bool), mask.reshape(-1)])
    src_ids, num_src = unique_with_capacity(all_ids, all_mask, capacity)
    # -1 padding sits at the tail; swap to +inf for a sorted search key
    big = jnp.iinfo(jnp.int32).max
    search = jnp.where(src_ids < 0, big, src_ids)
    seeds_local = jnp.searchsorted(search, seeds).astype(jnp.int32)
    nbr_local = jnp.searchsorted(
        search, nbrs.reshape(-1)).astype(jnp.int32).reshape(s, fanout)
    nbr_local = jnp.where(mask, nbr_local, 0)
    return DeviceBlock(src_ids, num_src, seeds_local, nbr_local, mask,
                       eids)


def sample_blocks_device(indptr, indices, seeds, fanouts, capacities,
                         key, replace: bool = False, probs=None):
    """Multi-layer device sampling with the `NeighborSampler.sample_blocks`
    contract (reference ``dataloading/neighbor_sampler.py:11``): blocks
    come back OUTERMOST FIRST (blocks[0] is the input layer), each
    layer's seeds are the previous block's src nodes.

    ``fanouts``/``capacities`` are per-layer, listed like the reference
    (layer 0 = input layer).  Returns a tuple of ``DeviceBlock``s.
    """
    assert len(fanouts) == len(capacities)
    blocks = []
    cur = seeds
    for fo, cap in zip(reversed(fanouts), reversed(capacities)):
        key, sub = jax.random.split(key)
        blk = sample_block_device(indptr, indices, cur, fo, cap, sub,
                                  replace, probs=probs)
        blocks.append(blk)
        cur = jnp.where(blk.src_ids >= 0, blk.src_ids, 0)
    return tuple(reversed(blocks))


def gather_block_features(block: DeviceBlock, x):
    """(capacity, F) feature rows for the block's src nodes (zero rows
    for padding) — the on-device FeatureFetcher."""
    safe = jnp.where(block.src_ids >= 0, block.src_ids, 0)
    feats = jnp.take(x, safe, axis=0)
    return jnp.where((block.src_ids >= 0)[:, None], feats, 0)


def mean_aggregate(block: DeviceBlock, h_src):
    """(S, F) masked mean over each seed's sampled neighbors of the
    block-local features ``h_src`` (capacity, F) — the SAGE-mean
    aggregation for device blocks."""
    msgs = jnp.take(h_src, block.nbr_local.reshape(-1), axis=0)
    msgs = msgs.reshape(block.nbr_local.shape + (h_src.shape[-1],))
    msgs = jnp.where(block.mask[..., None], msgs, 0)
    cnt = jnp.maximum(block.mask.sum(axis=1, keepdims=True), 1)
    return msgs.sum(axis=1) / cnt


def seed_features(block: DeviceBlock, h_src):
    """(S, F) block-local rows of the seeds themselves."""
    return jnp.take(h_src, block.seeds_local, axis=0)
