"""Benchmark: GCN full-graph training throughput (edges/s) on the device.

North-star metric per SURVEY §6: training edges/s/chip for SpMM-driven
GCN.  Baseline anchor: reference DGL trains a 2-layer GCN (hidden 16) on
REAL Reddit (232,965 nodes / 114.6M edges, avg degree 492, heavy-tailed)
for 200 epochs in 28.6 s on a V100 (``docs/source/performance.rst:53``)
= ~801M training-edges/s.

This bench matches that workload's statistics honestly
(``dgl_tpu/data/synth_reddit.py reddit_like_graph_sym``: same node/edge
counts, SYMMETRIC like the real graph — both directions of 57.3M
undirected edges, in-degree == out-degree ~ zipf, 41 communities,
degree-corrected SBM) and the same model config (hidden 16, 41
classes).  By default it runs the bit-packed full-dense SpMM
(``ops/pallas/bitmm.py``): the whole boolean adjacency at 1 bit/entry
(6.8 GB), one streaming kernel, VJP == forward (A == A^T).
``DGL_TPU_BENCH_FORMAT=hybrid`` selects the symmetric int8 hub-block +
tiled-remainder path instead (``ops/pallas/hybrid.py``), with
``DGL_TPU_BENCH_K`` overriding the hub-block size (default 32768).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Scale down with DGL_TPU_BENCH_EDGES for smoke runs.
"""
import json
import os
import sys

# Re-exec with glibc serving huge allocations from the heap instead of
# fresh mmaps: this guest's first-touch minor faults cost ~5-15 s/GB
# (measured; Firecracker lazy backing), so every multi-GB numpy temp in
# the generator/bit-packer pipeline pays it again under the default
# allocator.  Heap-recycled pages stay mapped: 7 GB alloc+fill drops
# from 9-127 s to 1.4 s after the first.  Must be set before glibc
# init, hence exec rather than putenv.
if os.environ.get("DGL_TPU_MALLOC_TUNED") != "1" and sys.platform == "linux":
    env = dict(os.environ,
               DGL_TPU_MALLOC_TUNED="1",
               MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="17179869184")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import optax
    import dgl_tpu as dgl
    from dgl_tpu.ops import gspmm
    from dgl_tpu.data.synth_reddit import reddit_like_graph_sym

    num_nodes = 232_965
    num_edges = int(os.environ.get("DGL_TPU_BENCH_EDGES", 114_615_892))
    k_dense = int(os.environ.get("DGL_TPU_BENCH_K", 32768))
    feat, hidden, classes = 602, 16, 41

    t0 = time.time()
    # Disk-cache the generated graph + built format: the single-core build
    # at 114.6M edges takes ~35 min; identical across runs (fixed seed).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # v2 = simple-graph generator (dedup + weighted top-up, 525c5e6)
    gpath = os.path.join(cache_dir,
                         f"reddit_sym_v2_{num_nodes}_{num_edges}_s0.npz")
    if os.path.exists(gpath):
        z = np.load(gpath)
        row, col = z["row"], z["col"]
    else:
        row, col = reddit_like_graph_sym(num_nodes=num_nodes,
                                         num_edges=num_edges, seed=0)
        with open(gpath + ".tmp", "wb") as f:
            np.savez(f, row=row, col=col)
        os.replace(gpath + ".tmp", gpath)
    print(f"# setup: graph ready in {time.time() - t0:.0f}s", flush=True)
    num_edges = len(row)           # sym generator emits 2*(E//2)
    g = dgl.graph((row, col), num_nodes=num_nodes)
    fmt = os.environ.get("DGL_TPU_BENCH_FORMAT", "bit")
    if fmt == "bit":
        # whole adjacency as a 1-bit matrix (N^2/8 = 6.8 GB): one
        # streaming kernel, no remainder (ops/pallas/bitmm.py).
        # Built ON DEVICE (jitted scatter-add from the COO): ships
        # 0.9 GB over the tunnel instead of 6.9 GB, no host bit-pack,
        # no multi-GB disk cache — the cold-start path the driver sees.
        # assume_simple: reddit_like_graph_sym dedups by construction.
        g.unit().create_bitmask_format(
            symmetric=True, on_device=True, assume_simple=True)
    else:
        # symmetric hybrid: one int8 hub block serves rows AND columns
        g.unit().create_hybrid_format(
            k_dense=k_dense, min_degree=96, symmetric=True,
            cache_path=os.path.join(
                cache_dir, f"hybrid_sym_v2_{num_nodes}_{num_edges}_s0_"
                           f"k{k_dense}_t1024.npz"))
    print(f"# setup: graph+formats in {time.time() - t0:.0f}s",
          flush=True)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(num_nodes, feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, num_nodes).astype(np.int32))
    unit = g.unit()
    # bincount, NOT unit.in_degrees(): the latter materializes CSC via a
    # 114.6M-edge sort the bit/hybrid kernels never need (cold-start cost)
    deg = jnp.maximum(
        jnp.asarray(np.bincount(col, minlength=num_nodes)), 1
    ).astype(jnp.float32)[:, None]

    params = {
        "w1": jnp.asarray(rng.normal(size=(feat, hidden),
                                     scale=0.1).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(hidden, classes),
                                     scale=0.1).astype(np.float32)),
    }
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def model(p, unit, x):
        # reference GraphConv's mat_order optimization (SURVEY App. C,
        # ``graphconv.py:448-460``): W applied on the narrow side of the
        # aggregation — layer 1 projects 602->16 BEFORE the SpMM, layer 2
        # projects 16->41 AFTER, so every SpMM runs at F=16.
        h = gspmm(unit, "copy_lhs", "sum", x @ p["w1"], None) / deg
        h = jax.nn.relu(h)
        return (gspmm(unit, "copy_lhs", "sum", h, None) / deg) @ p["w2"]

    def loss_fn(p, unit, x, y):
        logits = model(p, unit, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step(params, opt_state, unit, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, unit, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    iters = int(os.environ.get("DGL_TPU_BENCH_ITERS", 10))

    @jax.jit
    def steps(params, opt_state, unit, x, y):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, unit, x, y)
            up, o = tx.update(grads, o)
            return (optax.apply_updates(p, up), o), loss
        (params, opt_state), ls = jax.lax.scan(
            body, (params, opt_state), None, length=iters)
        return params, opt_state, ls[-1]

    if fmt == "bit":
        # whole-loop scan: no per-step host dispatch (the reference's
        # CUDA-queue training loop has none either). The tiled kernel
        # still hangs the remote compiler under scan — bit format only.
        t0 = time.perf_counter()
        params, opt_state, loss = steps(params, opt_state, unit, x, y)
        _ = float(loss)     # compile + warmup; value fetch = real sync
        print(f"# compile+warmup: {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        params, opt_state, loss = steps(params, opt_state, unit, x, y)
        _ = float(loss)
        dt = time.perf_counter() - t0
    else:
        # warmup/compile; fetch a VALUE — block_until_ready alone can
        # return before remote completion through the tunnel
        params, opt_state, loss = step(params, opt_state, unit, x, y)
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss = step(params, opt_state, unit, x, y)
        # one sync at the end: the params chain serializes the steps, and
        # fetching the final loss VALUE forces the whole chain through
        _ = float(loss)
        dt = time.perf_counter() - t0

    edges_per_s = num_edges * iters / dt
    baseline = 114_615_892 * 200 / 28.6
    print(json.dumps({
        "metric": "gcn_train_edges_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
