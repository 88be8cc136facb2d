"""Multi-chip GNN training with MeshGraph — unchanged nn modules on a
device mesh.

The sharded counterpart of the single-chip GCN/GAT examples: partition
the graph over a ``jax.sharding.Mesh`` with ``shard_graph`` and train
standard ``dgl_tpu.nn`` layers; every kernel runs on the halo SPMD
plane (boundary-row exchange over ICI, partition-local aggregation).
Reference counterpart: DistDGL's partitioned training
(``python/dgl/distributed/``), re-designed as SPMD collectives.

Run on a host with N devices (or a virtual CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/meshgraph_training.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from jax.sharding import Mesh

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.parallel import shard_graph


def make_graph(n=4096, deg=16, classes=8, feat=64, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.arange(n) * classes // n).astype(np.int32)
    src = np.repeat(np.arange(n), deg)
    block = n // classes
    dst = np.where(rng.uniform(size=len(src)) < 0.85,
                   (y[src] * block + rng.integers(0, block, len(src))),
                   rng.integers(0, n, len(src)))
    g = dgl.graph((src, dst), num_nodes=n)
    x = (rng.normal(size=(n, feat))
         + np.eye(classes)[y] @ rng.normal(size=(classes, feat)) * 2
         ).astype(np.float32)
    return g, x, y, classes


class Net(nn.Module):
    classes: int

    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GATConv(x.shape[-1], 16, num_heads=4)(g, x)
        h = jax.nn.relu(h.reshape(h.shape[0], -1))
        return dglnn.GraphConv(64, self.classes)(g, h)


def main():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    g, x, y, classes = make_graph()
    print(f"{len(devs)}-device mesh; graph {g.num_nodes()} nodes / "
          f"{g.num_edges()} edges")

    mg = shard_graph(g, mesh)                  # METIS partition
    stats = mg.hg.comm_stats(feat_dim=64)
    print(f"halo exchange: {stats['exchange']}, "
          f"{stats['halo_rows']} boundary rows/layer, "
          f"{stats['bytes_wire']} wire bytes "
          f"(all_gather equiv {stats['allgather_bytes_equiv']})")
    # optional: Pallas local kernels for the copy_u/sum fast path
    kind = mg.create_pallas_format(kind="auto")
    print(f"partition-local Pallas format: {kind}")

    xs = mg.shard_node_array(x)                # permute + pad + shard
    ys = mg.shard_node_array(y[:, None])[:, 0]

    net = Net(classes)
    params = net.init(jax.random.PRNGKey(0), mg.local_var(), xs)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, xs, ys):
        def loss_fn(p):
            logits = net.apply(p, mg.local_var(), xs)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ys).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt2, loss

    for epoch in range(30):
        params, opt, loss = train_step(params, opt, xs, ys)
        if epoch % 10 == 9:
            logits = net.apply(params, mg.local_var(), xs)
            pred = mg.unshard_node_array(np.asarray(logits)).argmax(1)
            acc = float((pred == y).mean())
            print(f"epoch {epoch + 1}: loss {float(loss):.4f} "
                  f"acc {acc:.3f}")


if __name__ == "__main__":
    main()
