"""Close the r2->r4 benchmark-drift question (VERDICT r4 #7) with the
interleaved discipline of perf_halo_bisect.py.

Drifted entries (benchmarks/results_r4b_tpu.json vs results_r2_tpu.json):
  bench_batch bs=64:            1.437 -> 1.782 s   (1.24x)
  bench_batch bs=256:           0.990 -> 1.534 s   (1.55x)
  bench_gspmm_u_mul_e_sum 10k:  0.0311 -> 0.0415 s (1.33x)
  bench_gcn_epoch:              0.0280 -> 0.0326 s (1.16x)

Method: construct each workload once, compile once, then run the three
timed regions INTERLEAVED x 6 reps in one session; cold (first-call)
times are recorded separately.  bench_batch is pure host-side Python —
its suite timing is ONE-SHOT (no warmup), so the cold/warm split here
decides artifact vs regression directly.

Usage: PYTHONPATH=/root/repo python tools/perf_drift_bisect.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu.ops import gspmm


def _graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    return dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                     num_nodes=n)


def main():
    # ---- bench_batch (host-side) ----
    for bs in (64, 256):
        gs = [_graph(30, 120, seed=i) for i in range(bs)]
        t0 = time.perf_counter()
        dgl.batch(gs)
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(6):
            t0 = time.perf_counter()
            dgl.batch(gs)
            warm.append(time.perf_counter() - t0)
        print(f"bench_batch bs={bs}: cold {cold:.3f}s, warm "
              f"{[f'{t:.3f}' for t in warm]} (min {min(warm):.3f})",
              flush=True)

    # ---- device workloads: compile once, interleave ----
    n, feat = 10_000, 64
    g1 = _graph(n, n * 10)
    x1 = jnp.ones((n, feat), jnp.float32)
    w1 = jnp.ones((n * 10, 1), jnp.float32)
    u1 = g1.unit()
    f_spmm = jax.jit(lambda x, w: gspmm(u1, "mul", "sum", x, w))

    import optax
    import flax.linen as nn  # noqa: F401
    from dgl_tpu import nn as dglnn

    g2 = _graph(20_000, 200_000)
    g2 = dgl.add_self_loop(g2)
    g2.create_formats_()
    g2.create_tiled_format()
    x2 = jnp.asarray(np.random.default_rng(0).normal(
        size=(20_000, 64)).astype(np.float32))
    y2 = jnp.asarray(np.random.default_rng(0).integers(
        0, 8, 20_000).astype(np.int32))

    import flax.linen as fnn

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, g, x):
            h = dglnn.GraphConv(64, 128, activation=jax.nn.relu)(g, x)
            return dglnn.GraphConv(128, 8)(g, h)

    model = GCN()
    params = model.init(jax.random.PRNGKey(0), g2, x2)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def gcn_step(params, opt, x2):
        def loss_fn(p):
            import optax as ox
            return ox.softmax_cross_entropy_with_integer_labels(
                model.apply(p, g2, x2), y2).mean()
        l, gr = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(gr, opt)
        return optax.apply_updates(params, up), opt, l

    def sync(v):
        _ = float(jnp.asarray(v).reshape(-1)[0])

    sync(f_spmm(x1, w1))
    p, o, l = gcn_step(params, opt, x2)
    sync(l)
    res = {"gspmm_10k": [], "gcn_epoch": []}
    for i in range(1, 7):
        t0 = time.perf_counter()
        sync(f_spmm(x1 * (1 + 0.01 * i), w1))
        res["gspmm_10k"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        p, o, l = gcn_step(p, o, x2 * (1 + 0.01 * i))
        sync(l)
        res["gcn_epoch"].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k}: {[f'{t*1e3:.1f}' for t in v]} ms "
              f"(min {min(v)*1e3:.1f})", flush=True)
    print("# r2 recorded: gspmm_10k 31.1 ms, gcn_epoch 28.0 ms; "
          "r4b recorded: 41.5 / 32.6 ms", flush=True)


if __name__ == "__main__":
    main()
