"""Layer-wise full-neighbor offline inference.

The reference's minibatch-trained models compute exact all-node
embeddings by propagating one FULL layer at a time over node batches
(``examples/pytorch/graphsage/node_classification.py:40``
``SAGE.inference``; same pattern in every sampling example) — this
avoids the fanout^L neighbor explosion that makes naive minibatch
inference O(N * fanout^L).

TPU formulation: a full layer is ONE gather-free SpMM over the whole
graph, and the bitmask/tiled families stream Reddit-scale adjacency on
a single chip — so the DEFAULT path here is simply per-layer full-graph
application (no dataloader at all).  Pass ``batch_size`` when a full
layer does not fit: either the feature matrices outgrow HBM, or no
dense format fits the graph and the XLA fallback's (E, F) message
tensor is the blocker (e.g. a uniform 1M-node / 20M-edge graph at
F=128 materializes a 10 GiB padded message array — measured OOM).
Batched dst nodes run as padded static-shape full-neighbor blocks
(pow2 buckets bound recompiles) with per-layer outputs buffered on
host, mirroring the reference loop; both paths are exactly equal.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax.numpy as jnp


def layerwise_inference(g, layer_fns: Sequence[Callable], feat, *,
                        batch_size: Optional[int] = None,
                        feat_key: str = "_infer_h"):
    """Exact all-node embeddings for a layer stack, one layer at a time.

    ``layer_fns``: one callable per layer, ``fn(graph_or_block, x) -> h``
    (include activations inside each fn, as the reference does between
    layers).  ``batch_size=None`` runs each layer as one full-graph
    pass; an int runs the reference's batched loop with
    ``MultiLayerFullNeighborSampler(1)`` + padded blocks, buffering each
    layer's output on host.

    Reference: ``examples/pytorch/graphsage/node_classification.py:40``.
    """
    if batch_size is None:
        h = feat
        for fn in layer_fns:
            h = fn(g, h)
        return h

    from .. import NID
    from .dataloader import DataLoader
    from .neighbor_sampler import MultiLayerFullNeighborSampler
    from .pad import PAD_MASK

    n = g.num_nodes()
    ids = np.arange(n)
    sampler = MultiLayerFullNeighborSampler(1)
    h = feat
    for fn in layer_fns:
        g.ndata[feat_key] = jnp.asarray(h)
        loader = DataLoader(g, ids, sampler, batch_size=batch_size,
                            shuffle=False)
        out = None
        try:
            for input_nodes, output_nodes, blocks in loader:
                blk = blocks[0]
                y = fn(blk, blk.srcdata[feat_key])
                mask = np.asarray(blk.dstdata[PAD_MASK]).astype(bool)
                rows = np.asarray(blk.dstdata[NID])[mask]
                yh = np.asarray(y)[mask]
                if out is None:
                    out = np.empty((n,) + yh.shape[1:], yh.dtype)
                out[rows] = yh
        finally:
            g.ndata.pop(feat_key, None)
        h = out
    return jnp.asarray(h)
