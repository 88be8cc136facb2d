"""Drive: GATConv training through the dense bit-masked flash-attention
path (ops/pallas/bitgat.py) on the real chip.

Builds a Reddit-density synthetic graph, enables the bitmask format,
trains a 2-layer GAT with optax adam, and reports loss curve + step
time.  Asserts the bitgat kernel is the path actually taken.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import dgl_tpu
from dgl_tpu.utils import config as _cfg

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DEG = 100
H, D, F = 4, 32, 64


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  N={N} deg~{DEG}", flush=True)
    # simple graph, every node has an in-edge
    row = rng.integers(0, N, N * DEG)
    col = rng.integers(0, N, N * DEG)
    key = np.unique(col.astype(np.int64) * N + row)
    ring = np.arange(N, dtype=np.int64) * N + (np.arange(N) + 1) % N
    # self-loops: labels are a function of each node's OWN features, so
    # aggregation must be able to see them (reference GAT examples add
    # self-loops too: examples/pytorch/gat/train.py)
    self_loops = np.arange(N, dtype=np.int64) * (N + 1)
    key = np.unique(np.r_[key, ring, self_loops])
    row, col = (key % N).astype(np.int32), (key // N).astype(np.int32)
    print(f"edges={len(row)}", flush=True)
    g = dgl_tpu.graph((jnp.asarray(row), jnp.asarray(col)), num_nodes=N)
    t0 = time.perf_counter()
    g.unit().create_bitmask_format()
    print(f"bitmask build {time.perf_counter()-t0:.1f}s "
          f"({g.unit()._bits.hbm_bytes/2**30:.2f} GiB)", flush=True)
    assert g.unit()._bits.rem_src.shape[0] == 0

    # planted signal the aggregation can actually see: label = sign of
    # the IN-NEIGHBORHOOD mean of a random linear probe (exactly the
    # function one attention aggregation + linear readout represents)
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    p = np.asarray(x) @ rng.normal(size=(F,))
    s = np.zeros(N)
    np.add.at(s, col, p[row])
    deg = np.maximum(np.bincount(col, minlength=N), 1)
    y = jnp.asarray((s / deg > 0).astype(np.int32))

    import flax.linen as nn

    class GAT(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = dgl_tpu.nn.GATConv(F, D, num_heads=H)(g, x)
            return nn.Dense(2)(jax.nn.elu(h.reshape(N, -1)))

    model = GAT()
    params = model.init(jax.random.PRNGKey(0), g, x)
    opt = optax.adam(1e-2)
    ost = opt.init(params)

    # prove dispatch: count bitgat calls during one traced apply
    import unittest.mock as mock
    import dgl_tpu.ops.pallas.bitgat as bg
    with mock.patch.object(bg, "_bitgat_core", wraps=bg._bitgat_core) as s:
        _ = jax.eval_shape(lambda p: model.apply(p, g, x), params)
        assert s.call_count == 1, f"bitgat calls = {s.call_count}"
    print("dispatch: GAT layer rides bitgat", flush=True)

    @jax.jit
    def step(params, ost, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits
        (l, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(params, upd), ost, l, (
            (logits.argmax(-1) == y).mean())

    t0 = time.perf_counter()
    params, ost, l, acc = step(params, ost, g, x, y)
    l0, a0 = float(l), float(acc)           # value fetch closes the region
    print(f"compile+step0 {time.perf_counter()-t0:.1f}s  "
          f"loss={l0:.4f} acc={a0:.3f}", flush=True)
    t0 = time.perf_counter()
    steps = 20
    for i in range(steps):
        params, ost, l, acc = step(params, ost, g, x, y)
    lN, aN = float(l), float(acc)
    dt = (time.perf_counter() - t0) / steps
    print(f"{steps} steps @ {dt*1e3:.1f} ms/step  "
          f"loss {l0:.4f}->{lN:.4f}  acc {a0:.3f}->{aN:.3f}", flush=True)
    assert lN < l0 - 0.15, "loss did not decrease"
    assert aN > 0.8, f"acc too low: {aN}"
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
