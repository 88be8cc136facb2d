"""Legacy collator API + tensorized index datasets (reference
``python/dgl/dataloading/dataloader.py`` pre-2.0 surface: ``Collator``,
``NodeCollator``, ``EdgeCollator``, ``GraphCollator``,
``TensorizedDataset``, ``DDPTensorizedDataset``).

The modern path is ``DataLoader`` + samplers; these wrappers keep the
reference's collate-style call signatures working.
"""
from __future__ import annotations

import math

import numpy as np

from .base import as_edge_prediction_sampler


class Collator:
    """Abstract collator (reference ``Collator``): ``dataset`` +
    ``collate(items)``."""

    @property
    def dataset(self):
        raise NotImplementedError

    def collate(self, items):
        raise NotImplementedError


class NodeCollator(Collator):
    """Minibatch collator for node classification (reference
    ``NodeCollator``): collate(seed node ids) ->
    (input_nodes, output_nodes, blocks)."""

    def __init__(self, g, nids, graph_sampler):
        self.g = g
        self._dataset = np.asarray(nids)
        self.graph_sampler = graph_sampler

    @property
    def dataset(self):
        return self._dataset

    def collate(self, items):
        return self.graph_sampler.sample(self.g, np.asarray(items))


class EdgeCollator(Collator):
    """Minibatch collator for edge tasks (reference ``EdgeCollator``):
    collate(seed edge ids) -> (input_nodes, pair_graph[, neg_pair_graph],
    blocks)."""

    def __init__(self, g, eids, graph_sampler, exclude=None,
                 reverse_eids=None, reverse_etypes=None,
                 negative_sampler=None):
        self.g = g
        self._dataset = np.asarray(eids)
        self.graph_sampler = as_edge_prediction_sampler(
            graph_sampler, exclude=exclude, reverse_eids=reverse_eids,
            reverse_etypes=reverse_etypes,
            negative_sampler=negative_sampler)

    @property
    def dataset(self):
        return self._dataset

    def collate(self, items):
        return self.graph_sampler.sample(self.g, np.asarray(items))


class GraphCollator(Collator):
    """Batches whole graphs + labels (reference ``GraphCollator``)."""

    def collate(self, items):
        from .. import batch as _batch
        import jax.numpy as jnp
        if isinstance(items[0], tuple):
            graphs = [it[0] for it in items]
            labels = jnp.asarray(np.asarray([it[1] for it in items]))
            return _batch(graphs), labels
        return _batch(list(items))


class TensorizedDataset:
    """Index dataset yielding batched id slices (reference
    ``TensorizedDataset``)."""

    def __init__(self, indices, batch_size, drop_last=False,
                 shuffle=False):
        self._indices = np.asarray(indices)
        self.batch_size = int(batch_size)
        self.drop_last = bool(drop_last)
        self.shuffle = bool(shuffle)

    def __len__(self):
        n = len(self._indices) / self.batch_size
        return math.floor(n) if self.drop_last else math.ceil(n)

    def __iter__(self):
        idx = self._indices
        if self.shuffle:
            from ..utils import np_rng
            idx = np_rng().permutation(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk


class DDPTensorizedDataset(TensorizedDataset):
    """Rank-sharded variant (reference ``DDPTensorizedDataset``): each
    process iterates its contiguous shard of the permuted indices."""

    def __init__(self, indices, batch_size, drop_last=False,
                 shuffle=False, rank=0, world_size=1):
        super().__init__(indices, batch_size, drop_last, shuffle)
        per = -(-len(self._indices) // world_size)
        self._indices = self._indices[rank * per:(rank + 1) * per]
        self.rank = rank
        self.world_size = world_size


def create_tensorized_dataset(indices, batch_size, drop_last=False,
                              shuffle=False, use_ddp=False, rank=0,
                              world_size=1):
    """Factory matching the reference helper."""
    if use_ddp:
        return DDPTensorizedDataset(indices, batch_size, drop_last,
                                    shuffle, rank, world_size)
    return TensorizedDataset(indices, batch_size, drop_last, shuffle)


# --- lazy-feature plumbing (reference dataloading/base.py helpers) -----

class LazyFeature:
    """Marker requesting a feature be fetched at collate time (reference
    ``frame.py LazyFeature``)."""

    __slots__ = ("name", "id_")

    def __init__(self, name=None, id_=None):
        self.name = name
        self.id_ = id_


def set_node_lazy_features(g, lazy_features):
    """Mark node features for deferred fetch (reference
    ``set_node_lazy_features``)."""
    if lazy_features:
        for k in lazy_features:
            g.ndata[k] = LazyFeature(k)
    return g


def set_edge_lazy_features(g, lazy_features):
    if lazy_features:
        for k in lazy_features:
            g.edata[k] = LazyFeature(k)
    return g


def set_src_lazy_features(g, lazy_features):
    if lazy_features:
        for k in lazy_features:
            g.srcdata[k] = LazyFeature(k)
    return g


def set_dst_lazy_features(g, lazy_features):
    if lazy_features:
        for k in lazy_features:
            g.dstdata[k] = LazyFeature(k)
    return g


def remove_parent_storage_columns(item, g):
    """Strip columns that alias the parent graph's storage before IPC
    (reference ``remove_parent_storage_columns``); our frames hold
    materialized arrays, so this is the identity."""
    return item


def restore_parent_storage_columns(item, g):
    return item


class WorkerInitWrapper:
    """Invoke the user's worker_init_fn after framework setup (reference
    ``WorkerInitWrapper``)."""

    def __init__(self, func=None):
        self.func = func

    def __call__(self, worker_id):
        if self.func is not None:
            self.func(worker_id)


class CollateWrapper:
    """Pairs a collate function with graph/device bookkeeping (reference
    ``CollateWrapper``)."""

    def __init__(self, sample_func, g):
        self.sample_func = sample_func
        self.g = g

    def __call__(self, items):
        return self.sample_func(self.g, np.asarray(items))
