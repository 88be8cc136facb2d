"""Pipeline stages (reference graphbolt datapipes: ``item_sampler.py:109``,
``impl/neighbor_sampler.py:27-156``, ``feature_fetcher.py:20``,
``dataloader.py:23-60``).

Stages are composable iterables over :class:`MiniBatch`; ``DataLoader``
runs the chain with a background prefetch thread and ships padded pytrees
to the device — the TPU equivalent of graphbolt's multiprocessing +
side-stream overlap.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .itemset import ItemSet, ItemSetDict
from .minibatch import MiniBatch
from .sampling_graph import CSCSamplingGraph, unique_and_compact
from ..utils import np_rng


class _Pipe:
    """Base: iterable of MiniBatch with fluent composition helpers."""

    def __iter__(self):
        raise NotImplementedError

    # fluent API (reference datapipe style)
    def sample_neighbor(self, graph, fanouts, replace=False,
                        prob_name=None):
        return NeighborSampler(self, graph, fanouts, replace=replace,
                               prob_name=prob_name)

    def sample_layer_neighbor(self, graph, fanouts):
        return NeighborSampler(self, graph, fanouts, layer=True)

    def fetch_feature(self, feature_store, node_feature_keys,
                      edge_feature_keys=None):
        return FeatureFetcher(self, feature_store, node_feature_keys,
                              edge_feature_keys)

    def sample_uniform_negative(self, graph, negative_ratio):
        return UniformNegativeSampler(self, graph, negative_ratio)

    def copy_to(self, device):
        return CopyTo(self, device)

    def transform(self, fn):
        return Transform(self, fn)

    def to_blocks(self, pad=True):
        return ToBlocks(self, pad=pad)


class ItemSampler(_Pipe):
    """Epoch shuffling + minibatch seed generation (reference
    ``item_sampler.py:109``)."""

    def __init__(self, item_set, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, rank: int = 0,
                 world_size: int = 1):
        self.item_set = item_set
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size

    def __iter__(self):
        n = len(self.item_set)
        idx = np.arange(n)
        if self.shuffle:
            np_rng().shuffle(idx)
        if self.world_size > 1:
            idx = idx[self.rank::self.world_size]
        names = self.item_set.names or ("seeds",)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            got = self.item_set[chunk]
            mb = MiniBatch()
            if isinstance(got, tuple):
                for name, arr in zip(names, got):
                    setattr(mb, name, arr)
            else:
                setattr(mb, names[0], got)
            yield mb

    def __len__(self):
        n = len(self.item_set) // max(self.world_size, 1)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


DistributedItemSampler = ItemSampler


class NeighborSampler(_Pipe):
    """Per-layer sampling producing CSC sampled subgraphs + compaction
    (reference ``impl/neighbor_sampler.py``)."""

    def __init__(self, source: _Pipe, graph: CSCSamplingGraph,
                 fanouts: Sequence, replace=False, prob_name=None,
                 layer=False):
        self.source = source
        self.graph = graph
        self.fanouts = list(fanouts)
        self.replace = replace
        self.prob_name = prob_name
        self.layer = layer

    def __iter__(self):
        for mb in self.source:
            seeds = np.asarray(mb.seeds)
            if seeds.ndim == 2:   # seed edges (pairs): endpoints as seeds
                flat = np.unique(seeds.reshape(-1))
                if mb.negative_srcs is not None:
                    flat = np.unique(np.concatenate(
                        [flat, np.asarray(mb.negative_srcs).ravel(),
                         np.asarray(mb.negative_dsts).ravel()]))
                layer_seeds = flat
            else:
                layer_seeds = seeds
            subgraphs = []
            for fanout in reversed(self.fanouts):
                sg = self.graph.sample_neighbors(
                    layer_seeds, [fanout], replace=self.replace,
                    probs_name=self.prob_name, layer=self.layer)
                subgraphs.insert(0, sg)
                layer_seeds = np.unique(np.concatenate(
                    [sg.original_column_node_ids, sg.indices]))
            mb.sampled_subgraphs = subgraphs
            mb.input_nodes = subgraphs[0] and np.unique(np.concatenate(
                [subgraphs[0].original_column_node_ids,
                 subgraphs[0].indices]))
            yield mb


LayerNeighborSampler = NeighborSampler


class UniformNegativeSampler(_Pipe):
    """Negative sampling for link prediction (reference
    ``impl/uniform_negative_sampler.py``)."""

    def __init__(self, source, graph: CSCSamplingGraph, negative_ratio: int):
        self.source = source
        self.graph = graph
        self.negative_ratio = negative_ratio

    def __iter__(self):
        rng = np_rng()
        n = self.graph.total_num_nodes
        for mb in self.source:
            pairs = np.asarray(mb.seeds)
            k = len(pairs) * self.negative_ratio
            mb.negative_srcs = np.repeat(pairs[:, 0], self.negative_ratio)
            mb.negative_dsts = rng.integers(0, n, k)
            yield mb


class FeatureFetcher(_Pipe):
    """Attach node/edge features (reference ``feature_fetcher.py:20``)."""

    def __init__(self, source, feature_store, node_feature_keys,
                 edge_feature_keys=None):
        self.source = source
        self.store = feature_store
        self.node_keys = node_feature_keys
        self.edge_keys = edge_feature_keys or []

    def __iter__(self):
        for mb in self.source:
            ids = mb.input_nodes
            if ids is None and mb.sampled_subgraphs:
                sg = mb.sampled_subgraphs[0]
                ids = np.unique(np.concatenate(
                    [sg.original_column_node_ids, sg.indices]))
            mb.node_features = {
                k: self.store.read("node", None, k, ids)
                for k in self.node_keys}
            if self.edge_keys and mb.sampled_subgraphs:
                mb.edge_features = [
                    {k: self.store.read("edge", None, k,
                                        sg.original_edge_ids)
                     for k in self.edge_keys}
                    for sg in mb.sampled_subgraphs]
            yield mb


class ToBlocks(_Pipe):
    """Convert sampled CSC subgraphs into padded dgl_tpu blocks so the
    model side is identical to the classic stack."""

    def __init__(self, source, pad=True):
        self.source = source
        self.pad = pad

    def __iter__(self):
        from ..graph.convert import create_block
        from ..dataloading.pad import pad_block
        from ..graph.graph import NID, EID
        for mb in self.source:
            blocks = []
            for sg in mb.sampled_subgraphs or []:
                seeds = sg.original_column_node_ids
                uniq, (comp_ind, comp_seeds) = (
                    _compact(sg.indices, seeds))
                nnz = len(sg.indices)
                dst_per_edge = np.repeat(
                    np.arange(len(seeds)), np.diff(sg.indptr))
                blk = create_block(
                    (comp_ind, dst_per_edge),
                    num_src_nodes=len(uniq), num_dst_nodes=len(seeds))
                blk.srcdata[NID] = uniq.astype(np.int32)
                blk.dstdata[NID] = seeds.astype(np.int32)
                blk.edata[EID] = sg.original_edge_ids.astype(np.int32)
                if self.pad:
                    blk = pad_block(blk)
                blocks.append(blk)
            mb.blocks = blocks
            yield mb


def _compact(indices, seeds):
    """seeds keep their prefix positions; new srcs appended (to_block
    contract)."""
    all_ids = np.concatenate([seeds, indices])
    uniq_order = []
    pos = {}
    for x in all_ids.tolist():
        if x not in pos:
            pos[x] = len(uniq_order)
            uniq_order.append(x)
    uniq = np.asarray(uniq_order, np.int64)
    comp_ind = np.asarray([pos[x] for x in indices.tolist()], np.int64)
    comp_seeds = np.arange(len(seeds))
    return uniq, (comp_ind, comp_seeds)


class CopyTo(_Pipe):
    def __init__(self, source, device):
        self.source = source
        self.device = device

    def __iter__(self):
        for mb in self.source:
            yield jax.device_put(mb, self.device) if self.device else mb


class Transform(_Pipe):
    def __init__(self, source, fn):
        self.source = source
        self.fn = fn

    def __iter__(self):
        for mb in self.source:
            yield self.fn(mb)


class DataLoader:
    """Run the pipe with a background prefetch thread (reference
    ``graphbolt/dataloader.py``)."""

    def __init__(self, datapipe: _Pipe, num_workers: int = 0,
                 prefetch: int = 2):
        self.datapipe = datapipe
        self.prefetch = prefetch

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self.datapipe
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()
        err = []
        stop = threading.Event()

        def worker():
            try:
                for mb in self.datapipe:
                    # bounded put that notices consumer abandonment, so
                    # the thread exits cleanly if iteration stops early
                    # (a thread blocked in put() at interpreter exit
                    # aborts with 'FATAL: exception not rethrown')
                    while not stop.is_set():
                        try:
                            q.put(mb, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:
                err.append(e)
            finally:
                # deliver DONE reliably (a dropped sentinel deadlocks the
                # consumer); give up only if the consumer abandoned us
                while not stop.is_set():
                    try:
                        q.put(DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                yield item
        finally:
            stop.set()
            t.join(timeout=10)
        if err:
            raise err[0]

    def __len__(self):
        return len(self.datapipe)


def exclude_seed_edges(minibatch, include_reverse_edges: bool = False):
    """Remove the minibatch's seed edges from its sampled subgraphs
    (reference ``gb.exclude_seed_edges`` — link-prediction leakage
    removal).  ``minibatch.seeds`` must be an (n, 2) seed-edge array."""
    from .sampling_graph import SampledSubgraph
    pairs = np.asarray(minibatch.seeds)
    if pairs.ndim != 2:
        return minibatch
    def keys(u, v):
        return u.astype(np.int64) * (1 << 31) + v.astype(np.int64)
    banned = set(keys(pairs[:, 0], pairs[:, 1]).tolist())
    if include_reverse_edges:
        banned |= set(keys(pairs[:, 1], pairs[:, 0]).tolist())
    new_subgraphs = []
    for sg in minibatch.sampled_subgraphs or []:
        dst = np.repeat(sg.original_column_node_ids,
                        np.diff(sg.indptr))
        src = sg.indices
        k = keys(src, dst)
        keep = ~np.isin(k, np.fromiter(banned, np.int64,
                                       len(banned)))
        counts = np.zeros(len(sg.indptr) - 1, np.int64)
        np.add.at(counts, np.repeat(np.arange(len(sg.indptr) - 1),
                                    np.diff(sg.indptr)), keep)
        new_indptr = np.concatenate([[0], np.cumsum(counts)])
        new_subgraphs.append(SampledSubgraph(
            indptr=new_indptr,
            indices=src[keep],
            original_edge_ids=sg.original_edge_ids[keep],
            original_column_node_ids=sg.original_column_node_ids,
            type_per_edge=(None if sg.type_per_edge is None
                           else sg.type_per_edge[keep])))
    minibatch.sampled_subgraphs = new_subgraphs
    return minibatch
