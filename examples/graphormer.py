"""Graphormer graph classification (reference examples/core/Graphormer):
degree encoding + shortest-path spatial bias + biased-MHA transformer
layers over dense-batched graphs.  MiniGC topology classes."""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def dense_batch(graphs, max_n):
    """Pad each graph to (max_n) nodes; returns feats (B, N, 1) degree,
    spd (B, N, N), mask (B, N)."""
    B = len(graphs)
    deg = np.zeros((B, max_n), np.int32)
    spd = np.full((B, max_n, max_n), -1, np.int32)
    mask = np.zeros((B, max_n), bool)
    for i, g in enumerate(graphs):
        n = g.num_nodes()
        deg[i, :n] = np.asarray(g.unit().in_degrees())
        d = np.asarray(dgl.shortest_dist(g))
        spd[i, :n, :n] = d
        mask[i, :n] = True
    return deg, spd, mask


def main(epochs=60, bf16=False):
    ds = dgl.data.MiniGCDataset(num_graphs=80, min_num_v=8, max_num_v=14)
    items = [ds[i] for i in range(len(ds))]
    graphs = [t[0] for t in items]
    labels = jnp.asarray(np.array([int(t[1]) for t in items]))
    max_n = max(g.num_nodes() for g in graphs)
    deg, spd, mask = dense_batch(graphs, max_n)
    deg = jnp.asarray(deg)
    spd = jnp.asarray(spd)
    maskj = jnp.asarray(mask)
    D, H = 32, 4

    # dtype=bf16 computes the attention/FFN GEMMs in bfloat16 (params,
    # softmax, outputs stay f32) — a 1.75x win once N reaches ~512
    # (neutral at small N; docs/performance.md)
    dt = jnp.bfloat16 if bf16 else None

    class Graphormer(nn.Module):
        @nn.compact
        def __call__(self, deg, spd, mask):
            h = nn.Embed(32, D, name="deg_emb")(jnp.minimum(deg, 31))
            bias = dglnn.SpatialEncoder(max_dist=8, num_heads=H)(spd)
            attn_mask = mask[:, None, :] & mask[:, :, None]
            for i in range(2):
                h = dglnn.GraphormerLayer(
                    D, 2 * D, H, dtype=dt, name=f"layer{i}")(
                        h, attn_bias=bias,
                        attn_mask=attn_mask)
            pooled = (h * mask[..., None]).sum(1) / \
                mask.sum(1, keepdims=True)
            return nn.Dense(ds.num_classes)(pooled)

    model = Graphormer()
    params = model.init(jax.random.PRNGKey(0), deg, spd, maskj)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, deg, spd, maskj)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    acc = (np.asarray(model.apply(params, deg, spd, maskj).argmax(-1)) ==
           np.asarray(labels)).mean()
    print("train accuracy", acc)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--bf16", action="store_true")
    a = ap.parse_args()
    main(a.epochs, a.bf16)
