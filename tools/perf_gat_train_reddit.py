"""FULL-MODEL GAT training at Reddit scale on the bitgat path.

2-layer GAT (602 -> H=4 x D=32 -> 41 classes, the classic GAT shape on
the bench's Reddit-statistics graph), cross-entropy + adam, 10-step
lax.scan — the GAT analogue of bench.py's GCN headline.  Both layers
ride the dense bit-masked flash-attention kernel (H*D <= 128).

Round 5: also measures the REFERENCE training recipe — attn_drop=0.6
(``examples/pytorch/gat/train.py:24``) — with the in-kernel hash-mask
dropout (VERDICT r4 #2; bar: <= 1.3x the dropout-free step).  The two
configurations compile once each and run INTERLEAVED.

Usage: PYTHONPATH=/root/repo python tools/perf_gat_train_reddit.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

import dgl_tpu as dgl
from dgl_tpu.nn import GATConv


class GAT(nn.Module):
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, g, x, *, deterministic=True):
        h = GATConv(602, 32, num_heads=4, attn_drop=self.attn_drop)(
            g, x, deterministic=deterministic)        # bitgat, H*D=128
        h = jax.nn.elu(h.reshape(h.shape[0], -1))
        h = GATConv(128, 41, num_heads=1, attn_drop=self.attn_drop)(
            g, h, deterministic=deterministic)        # bitgat, H*D=41
        return h.reshape(h.shape[0], -1)


def main():
    from dgl_tpu.data.synth_reddit import reddit_like_graph_sym
    n, e = 232_965, 114_615_892
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    gpath = os.path.join(cache, f"reddit_sym_v2_{n}_{e}_s0.npz")
    t0 = time.time()
    if os.path.exists(gpath):
        z = np.load(gpath)
        row, col = z["row"], z["col"]
    else:
        row, col = reddit_like_graph_sym(num_nodes=n, num_edges=e, seed=0)
        with open(gpath + ".tmp", "wb") as f:
            np.savez(f, row=row, col=col)
        os.replace(gpath + ".tmp", gpath)
    e = len(row)
    g = dgl.graph((row, col), num_nodes=n)
    g.unit().create_bitmask_format(symmetric=True, on_device=True,
                                   assume_simple=True)
    print(f"# graph+bits in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 602)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 41, n).astype(np.int32))
    model = GAT()
    gi = dgl.graph((np.arange(8), np.roll(np.arange(8), 1)), num_nodes=8)
    params = model.init(jax.random.PRNGKey(0), gi, x[:8])
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    # prove both layers dispatch through bitgat (trace-time)
    import unittest.mock as mock
    import dgl_tpu.ops.pallas.bitgat as bg
    with mock.patch.object(bg, "_bitgat_core", wraps=bg._bitgat_core) as s:
        jax.eval_shape(lambda p: model.apply(p, g, x), params)
        assert s.call_count == 2, f"bitgat calls: {s.call_count}"

    steps = 10
    modeld = GAT(attn_drop=0.6)

    @jax.jit
    def train(params, opt, g, x, y):
        def step(carry, _):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, g, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            l, grads = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(grads, o)
            return (optax.apply_updates(p, up), o), l
        (params, opt), ls = jax.lax.scan(step, (params, opt), None,
                                         length=steps)
        return params, opt, ls

    @jax.jit
    def train_drop(params, opt, g, x, y, key):
        def step(carry, k):
            p, o = carry
            def loss_fn(p):
                logits = modeld.apply(p, g, x, deterministic=False,
                                      rngs={"dropout": k})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            l, grads = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(grads, o)
            return (optax.apply_updates(p, up), o), l
        (params, opt), ls = jax.lax.scan(step, (params, opt),
                                         jax.random.split(key, steps))
        return params, opt, ls

    t0 = time.time()
    params, opt, ls = train(params, opt, g, x, y)
    _ = float(ls[-1])
    print(f"# nodrop compile+first10 in {time.time()-t0:.0f}s "
          f"loss {float(ls[0]):.3f} -> {float(ls[-1]):.3f}", flush=True)
    pd, od = jax.tree_util.tree_map(lambda v: v, (params, opt))
    t0 = time.time()
    pd, od, lsd = train_drop(pd, od, g, x, y, jax.random.PRNGKey(7))
    _ = float(lsd[-1])
    print(f"# drop   compile+first10 in {time.time()-t0:.0f}s "
          f"loss {float(lsd[0]):.3f} -> {float(lsd[-1]):.3f}", flush=True)

    res = {"nodrop": [], "drop0.6": []}
    for rep in range(3):
        t0 = time.perf_counter()
        params, opt, ls = train(params, opt, g, x * 1.01, y)
        _ = float(ls[-1])
        res["nodrop"].append((time.perf_counter() - t0) / steps)
        t0 = time.perf_counter()
        pd, od, lsd = train_drop(pd, od, g, x * 1.01, y,
                                 jax.random.PRNGKey(100 + rep))
        _ = float(lsd[-1])
        res["drop0.6"].append((time.perf_counter() - t0) / steps)
    dt = min(res["nodrop"])
    dtd = min(res["drop0.6"])
    print(f"GAT FULL TRAIN STEP at {e/1e6:.1f}M edges: {dt*1e3:.0f} ms/step"
          f" = {e/dt/1e6:.0f}M train-edges/s "
          f"(2 bitgat layers + CE + adam, scan x{steps})", flush=True)
    print(f"GAT attn_drop=0.6 (reference recipe, in-kernel mask): "
          f"{dtd*1e3:.0f} ms/step = {e/dtd/1e6:.0f}M train-edges/s "
          f"= {dtd/dt:.2f}x same-run baseline, "
          f"{dtd*1e3/1717:.2f}x the r4 1717 ms headline "
          f"[bar: <= 1.3x of the headline]", flush=True)


if __name__ == "__main__":
    main()
