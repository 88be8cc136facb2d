"""Distributed GraphSAGE trainer (reference examples/distributed/
graphsage/node_classification.py).  Run under the launcher:

    python -m dgl_tpu.distributed.launch --workspace . \
        --ip_config ip_config.txt --part_config data/g.json \
        --num_trainers 1 "python examples/dist_graphsage.py"

Env (set by the launcher): DGL_TPU_IP_CONFIG, DGL_TPU_PART_CONFIG,
DGL_TPU_CLIENT_ID, DGL_TPU_NUM_CLIENTS.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.dataloading import NeighborSampler


def main():
    dgl.distributed.initialize()          # reads env
    part_config = os.environ["DGL_TPU_PART_CONFIG"]
    g = dgl.distributed.DistGraph("g", part_config)
    n = g.num_nodes()
    classes = int(np.asarray(g.ndata["label"][np.arange(n)]).max()) + 1
    sampler = NeighborSampler([10, 10])
    loader = dgl.distributed.DistNodeDataLoader(
        g, np.arange(n), sampler, batch_size=512, shuffle=True)

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], 64,
                                           "mean")(blocks[0], x))
            return dglnn.SAGEConv(64, classes, "mean")(blocks[1], h)

    model = SAGE()
    tx = optax.adam(3e-3)
    params = opt = None
    for epoch in range(3):
        for input_nodes, output_nodes, blocks in loader:
            x = jnp.asarray(g.ndata["feat"][input_nodes])
            y = jnp.asarray(g.ndata["label"][output_nodes]).astype(
                jnp.int32).reshape(-1)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), blocks, x)
                opt = tx.init(params)

            def loss_fn(p):
                logits = model.apply(p, blocks, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, up)
        print(f"epoch {epoch} loss {float(loss):.4f}", flush=True)
    dgl.distributed.exit_client()


if __name__ == "__main__":
    main()
