"""On-chip drive of the SPMD mesh-minibatch loop (parallel/mesh_minibatch).

Same workload class as perf_device_pipeline.py (2-layer SAGE, batch
1024, fanout [10, 10], 1M nodes / 20M edges) but through the
mesh-plane primitives (owner-routed sample_frontier + gather_frontier
+ positional block_mean), mesh = the one real chip.  Measures the
per-step cost three ways:

  single  — one jitted step per host dispatch (the r4 verify-drive
            number, 160 ms/step at 8k nodes, was dispatch-bound)
  scan    — 10 steps under lax.scan, fresh seeds + samples inside the
            scan body (the production shape; amortizes dispatch)

Usage: PYTHONPATH=/root/repo python tools/perf_mesh_minibatch.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dgl_tpu as dgl
from dgl_tpu.parallel import shard_graph
from dgl_tpu.parallel.mesh_minibatch import (
    build_mesh_csc, sample_frontier, gather_frontier, frontier_sizes,
    block_mean)

N, E, FEAT, CLASSES = 1_000_000, 20_000_000, 128, 41
S, FANOUTS = 1024, [10, 10]


def main():
    rng = np.random.default_rng(0)
    print("# generating graph...", flush=True)
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    g = dgl.graph((src, dst), num_nodes=N)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    P_ = 1
    print("# building mesh CSC + shards...", flush=True)
    # trivial partition at mesh=1 (skip the metis pass; the measurement
    # targets the SPMD loop, not the partitioner)
    mg = shard_graph(g, mesh, partition=np.zeros(N, np.int32))
    mcsc = build_mesh_csc(g, mg, mesh)
    x = rng.normal(size=(N, FEAT)).astype(np.float32)
    y = rng.integers(0, CLASSES, N).astype(np.int32)
    xs = mg.shard_node_array(x)
    ys = mg.shard_node_array(y[:, None])[:, 0]
    jax.block_until_ready((mcsc.indptr, xs))
    sizes = frontier_sizes(S, FANOUTS)
    print(f"# frontier sizes {sizes}", flush=True)

    params = {
        "w1": jnp.asarray(rng.normal(size=(FEAT, 16), scale=0.1),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(16, CLASSES), scale=0.1),
                          jnp.float32),
    }
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def fwd(p, feats, masks):
        h = feats
        for li in reversed(range(len(FANOUTS))):
            dstv, mean = block_mean(h, masks[li], sizes[li], FANOUTS[li])
            w = p["w1"] if li == len(FANOUTS) - 1 else p["w2"]
            h = (dstv + mean) @ w
            if li == len(FANOUTS) - 1:
                h = jax.nn.relu(h)
        return h

    def one_step(carry, key, mcsc, xs, ys):
        params, opt = carry
        seeds = jax.random.randint(key, (P_, S), 0, N, jnp.int32)
        ids, masks = sample_frontier(mcsc, seeds, FANOUTS, key, mesh)
        feats = gather_frontier(xs, ids, mcsc, mesh)
        yb = gather_frontier(ys[:, None].astype(jnp.float32),
                             ids[:, :S], mcsc, mesh)[..., 0].astype(
                                 jnp.int32)

        def loss_fn(p):
            logits = fwd(p, feats, masks)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        l, gr = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(gr, opt)
        return (optax.apply_updates(params, up), opt), l

    @jax.jit
    def step_single(params, opt, mcsc, xs, ys, key):
        (params, opt), l = one_step((params, opt), key, mcsc, xs, ys)
        return params, opt, l

    @jax.jit
    def step_scan(params, opt, mcsc, xs, ys, key):
        keys = jax.random.split(key, 10)
        (params, opt), ls = jax.lax.scan(
            lambda c, k: one_step(c, k, mcsc, xs, ys), (params, opt),
            keys)
        return params, opt, ls

    print("# compiling single-step...", flush=True)
    t0 = time.time()
    p1, o1, l = step_single(params, opt, mcsc, xs, ys,
                            jax.random.PRNGKey(0))
    _ = float(l)
    print(f"# compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    reps = 10
    for i in range(reps):
        p1, o1, l = step_single(p1, o1, mcsc, xs, ys,
                                jax.random.PRNGKey(i + 1))
    _ = float(l)
    dt = (time.time() - t0) / reps
    print(f"single: {dt*1e3:7.1f} ms/step = {S/dt:8.0f} seeds/s",
          flush=True)

    print("# compiling scan...", flush=True)
    t0 = time.time()
    p2, o2, ls = step_scan(params, opt, mcsc, xs, ys,
                           jax.random.PRNGKey(100))
    _ = float(ls[-1])
    print(f"# compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(3):
        p2, o2, ls = step_scan(p2, o2, mcsc, xs, ys,
                               jax.random.PRNGKey(200 + i))
    _ = float(ls[-1])
    dt = (time.time() - t0) / 30
    print(f"scan:   {dt*1e3:7.1f} ms/step = {S/dt:8.0f} seeds/s",
          flush=True)


if __name__ == "__main__":
    main()
