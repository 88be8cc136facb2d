"""Wide-feature SpMM story (VERDICT r3 #5): bitmask vs tiled vs hybrid
at F in {64, 128, 256} on the Reddit-statistics graph, fwd and fwd+bwd,
on the real chip.

The F=16 headline (1.099B train-edges/s) is bitmask; this measures the
crossover as F grows (bitmask MXU passes scale linearly with F_pad
while its HBM stream is constant; tiled streams O(E) index data but its
MXU work is touched-tile-area x F).  Reference wide-F path for context:
``src/array/cpu/spmm_blocking_libxsmm.h``.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/perf_wideF.py
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
from dgl_tpu.ops import gspmm

FS = [64, 128, 256]
REPS = 3


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])   # compile + settle
    best = 1e30
    for _i in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    num_nodes, num_edges = 232_965, 114_615_892
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    z = np.load(os.path.join(
        cache, f"reddit_sym_v2_{num_nodes}_{num_edges}_s0.npz"))
    row, col = z["row"], z["col"]
    num_edges = len(row)
    rng = np.random.default_rng(0)

    results = {}

    def run_family(name, make_graph):
        g = make_graph()
        unit = g.unit()
        for F in FS:
            x = jnp.asarray(rng.normal(size=(num_nodes, F))
                            .astype(np.float32))
            x.block_until_ready()

            fwd = jax.jit(lambda u, x: gspmm(u, "copy_lhs", "sum",
                                             x, None))
            t_f = timed(fwd, unit, x)

            def loss(u, x):
                return (gspmm(u, "copy_lhs", "sum", x, None) ** 2).mean()
            bwd = jax.jit(jax.grad(loss, argnums=1))
            t_fb = timed(bwd, unit, x)
            eps_f = num_edges / t_f / 1e6
            eps_fb = num_edges / t_fb / 1e6
            results[(name, F)] = (t_f, t_fb, eps_f, eps_fb)
            print(f"{name:8s} F={F:3d}: fwd {t_f * 1e3:7.1f} ms "
                  f"({eps_f:6.0f}M e/s)  fwd+bwd {t_fb * 1e3:7.1f} ms "
                  f"({eps_fb:6.0f}M e/s)", flush=True)
        del g

    def bit_graph():
        g = dgl.graph((row, col), num_nodes=num_nodes)
        t0 = time.time()
        g.unit().create_bitmask_format(symmetric=True, on_device=True,
                                       assume_simple=True)
        print(f"# bit format {time.time() - t0:.0f}s", flush=True)
        return g

    def tiled_graph():
        g = dgl.graph((row, col), num_nodes=num_nodes)
        t0 = time.time()
        g.unit().tiled_format()
        print(f"# tiled format {time.time() - t0:.0f}s", flush=True)
        return g

    def hybrid_graph():
        g = dgl.graph((row, col), num_nodes=num_nodes)
        t0 = time.time()
        g.unit().create_hybrid_format(k_dense=32768, symmetric=True)
        print(f"# hybrid format {time.time() - t0:.0f}s", flush=True)
        return g

    run_family("bitmask", bit_graph)
    run_family("tiled", tiled_graph)
    try:
        run_family("hybrid", hybrid_graph)
    except Exception as e:  # hybrid needs the host sym build; optional
        print(f"# hybrid skipped: {e}", flush=True)

    print("\nCROSSOVER TABLE (fwd+bwd M edges/s):")
    for F in FS:
        rowstr = "  ".join(
            f"{n}={results[(n, F)][3]:.0f}" for n in
            ("bitmask", "tiled", "hybrid") if (n, F) in results)
        print(f"F={F:3d}: {rowstr}")


if __name__ == "__main__":
    main()
