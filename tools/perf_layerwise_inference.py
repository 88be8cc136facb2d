"""Offline layer-wise inference at 1M nodes / 20M edges (reference
``examples/pytorch/graphsage/node_classification.py:40``).

Measured 2026-08-20 (v5e, 1-core host): BATCHED mode (batch 65536)
computes all-node embeddings for a 128->128->64 SAGE stack in 429 s —
host-bound: each full-neighbor sample + to_block + pad runs on the
single host core (~13 s/batch); the device work per block is ms-scale.
FULL-GRAPH mode OOMs at this shape: a uniform 1M-node graph fits no
dense format (bitmask N^2/8 = 125 GB; tiled = 954k near-empty tile
pairs — and create_tiled_format device-OOMs building it), so the XLA
fallback materializes a padded 10 GiB (21M, 64) message temp.  On
format-able graphs (Reddit: 233k nodes / 114M edges) the full path is
the right one — 2 SpMMs total.  Params must be initialized on a TINY
graph: `init` runs a forward, and a full-graph forward at this shape
is itself the OOM (that cost one debugging round — see PERF_NOTES).

Usage: PYTHONPATH=/root/repo python tools/perf_layerwise_inference.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.dataloading import layerwise_inference


def main():
    rng = np.random.default_rng(0)
    n, e, F = 1_000_000, 20_000_000, 128
    t0 = time.time()
    g = dgl.add_self_loop(dgl.graph(
        (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n))
    g.create_formats_()
    print(f"# graph+formats {time.time()-t0:.0f}s", flush=True)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    gt = dgl.add_self_loop(dgl.graph(
        (np.arange(4), np.roll(np.arange(4), 1))))
    c1 = dglnn.SAGEConv(F, 128, "mean")
    c2 = dglnn.SAGEConv(128, 64, "mean")
    p1 = c1.init(jax.random.PRNGKey(0), gt, jnp.zeros((4, F)))
    p2 = c2.init(jax.random.PRNGKey(1), gt, jnp.zeros((4, 128)))
    fns = [lambda gg, h: jax.nn.relu(c1.apply(p1, gg, h)),
           lambda gg, h: c2.apply(p2, gg, h)]
    t0 = time.time()
    emb = layerwise_inference(g, fns, x, batch_size=65536)
    print(f"BATCHED layerwise inference (1M/20M, 128->128->64, "
          f"batch 65536): {time.time()-t0:.1f}s for all 1M nodes "
          f"(host-bound on 1 core)", flush=True)
    assert bool(jnp.isfinite(emb).all())


if __name__ == "__main__":
    main()
