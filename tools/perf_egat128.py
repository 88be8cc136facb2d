"""Full TRAIN STEP at 23M edges x H*D=128 for EGATConv / EdgeGATConv
(VERDICT r3 #3, carried since r2): loss -> grads to ALL params -> adam,
timed on the real chip with the value-fetch discipline.

Target: fwd+bwd < 5 s (reference trains this width on an 11 GB V100,
``python/dgl/nn/pytorch/conv/egatconv.py:14``).

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/perf_egat128.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dgl_tpu as dgl
from dgl_tpu.nn import EGATConv, EdgeGATConv


def main():
    N, E, H, D, Fe, Fin = 232_965, 23_000_000, 4, 32, 16, 64
    rng = np.random.default_rng(0)
    row = rng.integers(0, N, E).astype(np.int32)
    col = rng.integers(0, N, E).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=N)
    t0 = time.time()
    g.unit().tiled_format()
    print(f"tiled format build {time.time() - t0:.0f}s", flush=True)
    x = jnp.asarray(rng.normal(size=(N, Fin)).astype(np.float32))
    ef = rng.normal(size=(E, Fe)).astype(np.float32)
    gi = dgl.graph((np.arange(8), np.roll(np.arange(8), 1)),
                   num_nodes=8)
    tx = optax.adam(1e-3)

    def drive(name, conv, apply_kw, init_kw=None):
        t0 = time.time()
        ef_slot = conv.__class__.slot_edge_feats(g, ef)
        print(f"{name}: slot permute {time.time() - t0:.0f}s",
              flush=True)
        params = conv.init(jax.random.PRNGKey(0), gi, x[:8],
                           jnp.asarray(ef[:8]), **(init_kw or {}))
        opt = tx.init(params)

        def loss_fn(p, g, x, efs):
            out = conv.apply(p, g, x, jnp.zeros((1, Fe)),
                             efeats_slot=efs, **apply_kw)
            if isinstance(out, tuple):
                out = out[0]
            return (out ** 2).mean()

        @jax.jit
        def train_step(p, o, g, x, efs):
            l, gr = jax.value_and_grad(loss_fn)(p, g, x, efs)
            up, o = tx.update(gr, o)
            return optax.apply_updates(p, up), o, l

        t0 = time.time()
        params, opt, l = train_step(params, opt, g, x, ef_slot)
        lv = float(l)
        print(f"{name}: compile+first step {time.time() - t0:.1f}s "
              f"loss={lv:.5f}", flush=True)
        for rep in range(3):
            t0 = time.time()
            params, opt, l = train_step(params, opt, g, x, ef_slot)
            lv = float(l)
            print(f"{name}: step {rep}: {time.time() - t0:.2f}s "
                  f"(loss {lv:.5f})", flush=True)
        assert np.isfinite(lv)

    drive("EGATConv(H*De=128)",
          EGATConv(Fin, Fe, out_node_feats=D, out_edge_feats=D,
                   num_heads=H),
          {"compute_edge_feats": False},
          {"compute_edge_feats": False})
    drive("EdgeGATConv(H*D=128)",
          EdgeGATConv(Fin, Fe, D, H), {})


if __name__ == "__main__":
    main()
