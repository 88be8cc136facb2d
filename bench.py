"""Benchmark: GCN full-graph training throughput (edges/s) on the device.

North-star metric per SURVEY §6: edges/s/chip for SpMM-driven GCN training.
Baseline anchor: reference DGL trains 200-epoch GCN on Reddit (233k nodes /
114M edges) in 28.6 s on a single GPU (``docs/source/performance.rst:53``)
= ~230M edge-updates/s counting 2 SpMM fwd + 2 SpMM bwd... we report raw
*training* edges/s = num_edges * epochs / time for a 2-layer GCN, the same
quantity implied by the reference table.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import optax
    import dgl_tpu as dgl
    from dgl_tpu.ops import gspmm

    # Reddit-scale synthetic graph (full Reddit: 233k nodes, 114M edges —
    # we use the same node count with reduced degree if memory-bound).
    num_nodes = 232_965
    num_edges = 23_000_000  # ~10% of reddit edges; reported per-edge
    feat = 128
    hidden = 128
    classes = 41

    rng = np.random.default_rng(0)
    row = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    col = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=num_nodes)
    g.create_tiled_format()   # Pallas tile-dense SpMM fast path
    g.create_formats_()

    x = jnp.asarray(rng.normal(size=(num_nodes, feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, num_nodes).astype(np.int32))
    unit = g.unit()
    deg = jnp.maximum(unit.in_degrees(), 1).astype(jnp.float32)[:, None]

    params = {
        "w1": jnp.asarray(rng.normal(size=(feat, hidden),
                                     scale=0.1).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(hidden, classes),
                                     scale=0.1).astype(np.float32)),
    }
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def model(p, unit, x):
        h = gspmm(unit, "copy_lhs", "sum", x @ p["w1"], None) / deg
        h = jax.nn.relu(h)
        return gspmm(unit, "copy_lhs", "sum", h @ p["w2"], None) / deg

    @jax.jit
    def step(params, opt_state, unit, x, y):
        def loss_fn(p):
            logits = model(p, unit, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup/compile
    params, opt_state, loss = step(params, opt_state, unit, x, y)
    loss.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state, unit, x, y)
        loss.block_until_ready()
    dt = time.perf_counter() - t0

    edges_per_s = num_edges * iters / dt
    # Baseline: reference GCN Reddit 200 epochs in 28.6 s -> 114.6M edges *
    # 200 / 28.6 s = 801M training-epoch-edges/s on a V100-era GPU.
    baseline = 114_615_892 * 200 / 28.6
    print(json.dumps({
        "metric": "gcn_train_edges_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
