"""DataLoader: seed batching + sampler + padding + device transfer with a
host prefetch thread.

Reference: ``python/dgl/dataloading/dataloader.py:623,722,788`` — torch
DataLoader workers + prefetch thread + alternate CUDA streams.  TPU-native
shape: sampling is host work (numpy), so the loader runs the sampler on a
background thread ahead of the training step and ships *padded* pytrees to
device with ``jax.device_put``; XLA's async dispatch overlaps the H2D copy
with the previous step's compute, playing the role of the reference's side
stream.

Measured (2026-08-17, 1M nodes / 20M edges / fanout [10,10]): leaving
``device=None`` and letting jit batch the H2D transfer gives 8.8
steps/s end-to-end; ``device=jax.devices()[0]`` (eager per-array
device_put on the prefetch thread) drops to 1.1 steps/s over the axon
tunnel — each block carries dozens of structural arrays and every
device_put pays a tunnel round trip.  Use ``device=`` only on directly
attached hosts.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .pad import pad_block, pad_graph, next_bucket
from ..graph.graph import Graph
from ..utils import np_rng


class DataLoader:
    """Iterate minibatches of ``(input_nodes, output_nodes, blocks)``.

    Args mirror the reference: ``graph``, ``indices`` (seed nodes or seed
    edges), ``graph_sampler``; plus TPU knobs: ``pad`` (bucket shapes;
    default True), ``bucket_mode`` ('pow2' | 'multiple128'),
    ``num_prefetch`` (queue depth; 0 disables the prefetch thread).
    """

    def __init__(self, graph: Graph, indices, graph_sampler,
                 device=None, use_ddp: bool = False, ddp_seed: int = 0,
                 batch_size: int = 1024, drop_last: bool = False,
                 shuffle: bool = False, use_prefetch_thread: bool = True,
                 num_workers: int = 0, use_uva: bool = False,
                 pad: bool = True, bucket_mode: str = "pow2",
                 num_prefetch: int = 2, rank: int = 0, world_size: int = 1):
        self.graph = graph
        self.indices = np.asarray(indices)
        self.graph_sampler = graph_sampler
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.device = device
        self.pad = pad
        self.bucket_mode = bucket_mode
        self.num_prefetch = num_prefetch if use_prefetch_thread else 0
        # DDP-style sharding of seeds across ranks (reference
        # ``dataloader.py:263-273``)
        if world_size > 1:
            self.indices = self.indices[rank::world_size]
        self._epoch = 0

    def _batches(self):
        idx = self.indices.copy()
        if self.shuffle:
            np_rng().shuffle(idx)
        n = len(idx)
        for s in range(0, n, self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _produce(self, seeds):
        out = self.graph_sampler.sample(self.graph, seeds)
        if self.pad and len(out) == 3 and isinstance(out[2], (list, tuple)):
            input_nodes, output_nodes, blocks = out
            blocks = [
                pad_block(b, mode=self.bucket_mode) for b in blocks]
            out = (input_nodes, output_nodes, blocks)
        if self.device is not None:
            out = jax.device_put(out, self.device)
        return out

    def __iter__(self):
        if self.num_prefetch <= 0:
            for seeds in self._batches():
                yield self._produce(seeds)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.num_prefetch)
        DONE = object()
        err = []
        stop = threading.Event()

        def worker():
            try:
                for seeds in self._batches():
                    item = self._produce(seeds)
                    # abandonment-aware put: a thread blocked in put() at
                    # interpreter exit aborts the process
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in main thread
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
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


NodeDataLoader = DataLoader
EdgeDataLoader = DataLoader


class GraphDataLoader:
    """Batched graph-classification loader (reference
    ``dgl.dataloading.GraphDataLoader``): yields ``(batched_graph,
    labels)``."""

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 **kwargs):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last

    def __iter__(self):
        from ..batch import batch as batch_graphs
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np_rng().shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            items = [self.dataset[int(i)] for i in chunk]
            if isinstance(items[0], tuple):
                graphs = [it[0] for it in items]
                labels = jnp.asarray(np.array([np.asarray(it[1])
                                               for it in items]))
                yield batch_graphs(graphs), labels
            else:
                yield batch_graphs(items)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size
