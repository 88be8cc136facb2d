"""Hetero GAT fusion scaling (VERDICT r3 #7): R-relation hetero GAT
through HeteroGraphConv at R in {8, 32}, fused vs per-relation, on the
real chip.  Done-bar: 32-relation hetero GAT steps sub-linearly in R.

Setup mirrors the round-3 SAGE fusion measurement (PERF_NOTES):
R relations x 100k edges x 20k nodes, GATConv(64 -> 32, H=2) per
relation, full value_and_grad step.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/perf_hetero_gat.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.utils import config


def build(R, n=20_000, e=100_000, seed=0):
    rng = np.random.default_rng(seed)
    data = {("n", f"rel{r}", "n"): (rng.integers(0, n, e),
                                    rng.integers(0, n, e))
            for r in range(R)}
    g = dgl.heterograph(data, num_nodes_dict={"n": n})
    x = {"n": jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))}
    conv = dglnn.HeteroGraphConv(
        {f"rel{r}": dglnn.GATConv(64, 16, num_heads=2)
         for r in range(R)}, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(0), g, x)
    return g, x, conv, params


def run(R, fused):
    g, x, conv, params = build(R)
    config.set("fuse_multi_update_all", fused)
    try:
        @jax.jit
        def step(p, xv):
            def loss(p):
                out = conv.apply(p, g, {"n": xv})
                return (out["n"] ** 2).mean()
            return jax.value_and_grad(loss)(p)

        t0 = time.time()
        l, gr = step(params, x["n"])
        lv = float(l)
        t_compile = time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            l, gr = step(params, x["n"])
            lv = float(l)
            best = min(best, time.perf_counter() - t0)
        mode = "fused" if fused else "per-rel"
        print(f"R={R:3d} {mode:8s}: {best * 1e3:7.1f} ms/step "
              f"(compile {t_compile:.0f}s, loss {lv:.5f})", flush=True)
        return best
    finally:
        config.set("fuse_multi_update_all", True)


def main():
    t8f = run(8, True)
    t8u = run(8, False)
    t32f = run(32, True)
    t32u = run(32, False)
    print(f"\nscaling fused 8->32: {t32f / t8f:.2f}x for 4x relations "
          f"({'SUB' if t32f / t8f < 4 else 'NOT sub'}-linear); "
          f"fused vs per-rel at R=32: {t32u / t32f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
