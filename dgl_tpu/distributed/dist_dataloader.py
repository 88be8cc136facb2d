"""Distributed dataloaders (reference ``python/dgl/distributed/
dist_dataloader.py`` + ``dataloading/dist_dataloader.py:675
DistNodeDataLoader``).

Yields message-flow-graph block lists built from *distributed* neighbor
sampling: each batch's multi-layer frontier is sampled partition-locally
+ via RPC (``graph_services.sample_neighbors``), compacted to blocks with
the same contract as the single-machine loader, and its input features
pulled from the KVStore.  A background thread prefetches the next batch
while the device consumes the current one (the reference overlaps the
same way with its sampler-worker pool).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

import numpy as np

from ..graph.graph import NID
from .graph_services import sample_neighbors as dist_sample_neighbors


class DistDataLoader:
    """Generic batched loader over a collate function (reference
    ``distributed/dist_dataloader.py DistDataLoader``)."""

    def __init__(self, dataset, batch_size: int,
                 collate_fn: Callable, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 queue_size: int = 2):
        self.dataset = np.asarray(dataset)
        self.batch_size = int(batch_size)
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.queue_size = max(1, queue_size)
        self._rng = np.random.default_rng(seed)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        n = len(idx)
        stop = (n - n % self.batch_size) if self.drop_last else n
        for b in range(0, stop, self.batch_size):
            yield self.dataset[idx[b:b + self.batch_size]]

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.queue_size)
        DONE = object()
        err = []
        abandoned = threading.Event()

        def producer():
            try:
                for seeds in self._batches():
                    item = self.collate_fn(seeds)
                    # abandonment-aware put (see dataloading/dataloader.py)
                    while not abandoned.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            except Exception as e:  # surface in consumer
                err.append(e)
            finally:
                # deliver DONE reliably (a dropped sentinel deadlocks the
                # consumer); give up only if the consumer abandoned us
                while not abandoned.is_set():
                    try:
                        q.put(DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                yield item
        finally:
            abandoned.set()
            t.join(timeout=10)
        if err:
            raise err[0]


class DistNodeDataLoader(DistDataLoader):
    """Node-classification loader: seeds -> multi-layer blocks
    (reference ``dataloading/dist_dataloader.py:675``).  ``sampler`` is a
    ``dgl_tpu.dataloading.NeighborSampler``-style object with ``fanouts``;
    blocks reuse the single-machine padded-block builder so the device
    step compiles once."""

    def __init__(self, dist_graph, nids, sampler, batch_size: int = 1024,
                 shuffle: bool = False, drop_last: bool = False, **kw):
        self.g = dist_graph
        self.sampler = sampler
        super().__init__(nids, batch_size, self._collate, shuffle=shuffle,
                         drop_last=drop_last, **kw)

    def _collate(self, seeds):
        from ..graph.convert import to_block
        seeds = np.asarray(seeds, np.int64)
        blocks = []
        for fanout in reversed(list(self.sampler.fanouts)):
            frontier = dist_sample_neighbors(self.g, seeds, fanout)
            block = to_block(frontier, seeds)
            seeds = np.asarray(block.srcdata[NID])
            blocks.insert(0, block)
        input_nodes = seeds
        output_nodes = np.asarray(blocks[-1].dstdata[NID])
        return input_nodes, output_nodes, blocks


class DistEdgeDataLoader(DistDataLoader):
    """Edge-task loader over a DistGraph (reference
    ``dataloading/dist_dataloader.py`` DistEdgeDataLoader): seed edges ->
    (input_nodes, pair_graph[, neg_pair_graph], blocks) via distributed
    endpoint sampling + the single-machine edge-prediction assembly."""

    def __init__(self, dist_graph, eids, sampler, batch_size: int = 1024,
                 shuffle: bool = False, drop_last: bool = False,
                 exclude=None, reverse_eids=None, negative_sampler=None,
                 **kw):
        self.g = dist_graph
        self.sampler = sampler
        self.exclude = exclude
        self.reverse_eids = reverse_eids
        self.negative_sampler = negative_sampler
        super().__init__(eids, batch_size, self._collate, shuffle=shuffle,
                         drop_last=drop_last, **kw)

    def _collate(self, seed_edges):
        from ..graph.convert import to_block, graph as make_graph
        import jax.numpy as jnp
        seed_edges = np.asarray(seed_edges, np.int64)
        from .graph_services import find_edges as dist_find_edges
        u, v = dist_find_edges(self.g, seed_edges)
        u = np.asarray(u)
        v = np.asarray(v)
        pair_graph = make_graph((u, v), num_nodes=self.g.num_nodes())
        pair_graph.edata["_ID"] = jnp.asarray(seed_edges.astype(np.int32))
        neg_pair_graph = None
        if self.negative_sampler is not None:
            ns, nd = self.negative_sampler(pair_graph,
                                           np.arange(len(seed_edges)))
            neg_pair_graph = make_graph(
                (np.asarray(ns), np.asarray(nd)),
                num_nodes=self.g.num_nodes())
        seeds = np.unique(np.concatenate(
            [u, v] + ([np.asarray(neg_pair_graph.unit().coo()[0]),
                       np.asarray(neg_pair_graph.unit().coo()[1])]
                      if neg_pair_graph is not None else [])))
        blocks = []
        cur = seeds
        for fanout in reversed(list(self.sampler.fanouts)):
            frontier = dist_sample_neighbors(self.g, cur, fanout)
            block = to_block(frontier, cur)
            cur = np.asarray(block.srcdata[NID])
            blocks.insert(0, block)
        from ..transforms.functional import compact_graphs
        if neg_pair_graph is not None:
            pair_graph, neg_pair_graph = compact_graphs(
                [pair_graph, neg_pair_graph])
            return cur, pair_graph, neg_pair_graph, blocks
        pair_graph = compact_graphs(pair_graph)
        return cur, pair_graph, blocks
