"""bitdot (dense bit-masked dot-product flash attention) at FULL Reddit
scale.

Drives DotGatConv H=4 D=32 through ops/pallas/bitdot.py on the bench's
Reddit-statistics graph (232,965 nodes / 114.6M edges, symmetric) and
times fwd and fwd+bwd.  Comparison rows (RESULTS.md): slot-space fused
DotGat fwd 1316 ms / fwd+bwd 3676 ms.

Usage: PYTHONPATH=/root/repo python tools/perf_bitdot_full.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu.nn import DotGatConv


def main():
    from dgl_tpu.data.synth_reddit import reddit_like_graph_sym
    n, e = 232_965, 114_615_892
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
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
    slot = bool(int(os.environ.get("BITDOT_SLOT", "0")))
    if slot:
        g.create_tiled_format()          # route to the slot-space path
    else:
        g.unit().create_bitmask_format(symmetric=True, on_device=True,
                                       assume_simple=True)
    print(f"# graph+formats in {time.time()-t0:.0f}s slot={slot}",
          flush=True)

    H = int(os.environ.get("BITDOT_H", "2"))
    D = int(os.environ.get("BITDOT_D", "64"))
    F = 64
    print(f"# H={H} D={D}", flush=True)
    rng = np.random.default_rng(0)
    conv = DotGatConv(F, D, H)
    gi = dgl.graph((np.arange(8), np.roll(np.arange(8), 1)), num_nodes=8)
    x0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), gi, x0[:8])

    # prove the dispatch (trace-time, no device work)
    import unittest.mock as mock
    import dgl_tpu.ops.pallas.bitdot as bd
    with mock.patch.object(bd, "_bitdot_core", wraps=bd._bitdot_core) as s:
        jax.eval_shape(lambda p, x: conv.apply(p, g, x), params, x0)
        assert s.call_count == (0 if (slot or D < 64) else 1), "wrong dispatch"

    xs = [jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
          for _ in range(3)]
    jax.block_until_ready(xs)

    fwd_f = jax.jit(lambda p, g, x: conv.apply(p, g, x))
    t0 = time.time()
    out = fwd_f(params, g, xs[0])
    print(f"# fwd compile+run {time.time()-t0:.0f}s "
          f"out[0,0,0]={float(out[0,0,0]):.4f}", flush=True)
    t0 = time.perf_counter()
    for xi in xs:
        o = fwd_f(params, g, xi)
        _ = float(o[0, 0, 0])
    fwd = (time.perf_counter() - t0) / len(xs)
    print(f"bitdot DotGat fwd at {e/1e6:.1f}M edges: {fwd*1e3:.0f} ms "
          f"({e/fwd/1e6:.0f}M edge/s)  [slot path: 1316 ms]", flush=True)

    loss_f = jax.jit(jax.value_and_grad(
        lambda p, g, x: (conv.apply(p, g, x) ** 2).mean()))
    t0 = time.time()
    l, _ = loss_f(params, g, xs[0])
    _ = float(l)
    print(f"# fwd+bwd compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for xi in xs:
        l, _ = loss_f(params, g, xi)
        _ = float(l)
    bwd = (time.perf_counter() - t0) / len(xs)
    print(f"bitdot DotGat fwd+bwd at {e/1e6:.1f}M edges: {bwd*1e3:.0f} ms "
          f"({e/bwd/1e6:.0f}M edge/s)  [slot path: 3676 ms]", flush=True)


if __name__ == "__main__":
    main()
