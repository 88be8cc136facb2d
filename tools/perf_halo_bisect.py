"""Bisect the MeshGraph full-train-step anomaly (VERDICT r3 weak #1).

Round-3 measured the bare 2-layer fwd+bwd halo-Pallas chain at 106
ms/step under scan but the FULL train step (adam + CE + 602-wide input
projection) at 510-838 ms/step, with every added component individually
<2 ms.  Hypotheses: (a) one of the additions really interacts badly with
the scan+shard_map program, (b) tunnel-side measurement variance.

This script compiles three variants ONCE each and then interleaves
timed repetitions A,C,D,A,C,D,... — if the tunnel inflates, A inflates
in the same session; if D is really slow, it stays slow while A stays
at ~106 ms:

  A: bare chain    — 2x(SpMM fwd) + sum loss + grads wrt (w1, w2)
  C: + frontends   — 602-wide input projection + CE loss (grads wrt
                     w0, w1, w2), still no optimizer
  D: full step     — C + adam update (optax), params carried by scan

All variants run a 5-step ``lax.scan`` jitted with the Pallas format as
an ARGUMENT (closing over it ships GBs of HLO constants — PERF_NOTES
round 3).  Timing closes with a scalar fetch (CLAUDE.md discipline:
``block_until_ready`` can return before remote completion through the
axon tunnel).

Usage: PYTHONPATH=/root/repo python tools/perf_halo_bisect.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCAN_LEN = 5
REPS = 4


def main():
    import optax
    import dgl_tpu as dgl
    from dgl_tpu.parallel import shard_graph
    from dgl_tpu.parallel.halo_pallas import halo_fast_spmm
    from jax.sharding import Mesh

    num_nodes, num_edges = 232_965, 114_615_892
    feat, hidden, classes = 602, 16, 41
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    gpath = os.path.join(
        cache, f"reddit_sym_v2_{num_nodes}_{num_edges}_s0.npz")
    if not os.path.exists(gpath):
        from dgl_tpu.data.synth_reddit import reddit_like_graph_sym
        row, col = reddit_like_graph_sym(num_nodes=num_nodes,
                                         num_edges=num_edges, seed=0)
        os.makedirs(cache, exist_ok=True)
        with open(gpath + ".tmp", "wb") as f:
            np.savez(f, row=row, col=col)
        os.replace(gpath + ".tmp", gpath)
    z = np.load(gpath)
    row, col = z["row"], z["col"]
    g = dgl.graph((row, col), num_nodes=num_nodes)
    print(f"# graph ready: {num_nodes} nodes / {len(row)} edges",
          flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    t0 = time.time()
    mg = shard_graph(g, mesh, part_method="contiguous")
    mg.create_pallas_format(on_device=True, symmetric=True,
                            assume_simple=True)
    hg, fmt = mg.hg, mg._unit.fast_fmt
    print(f"# mesh format built in {time.time() - t0:.0f}s "
          f"(kind={fmt.kind})", flush=True)

    rng = np.random.default_rng(7)
    y_np = (np.arange(num_nodes) * classes // num_nodes).astype(np.int32)
    x = mg.shard_node_array(
        rng.normal(size=(num_nodes, feat)).astype(np.float32))
    y = mg.shard_node_array(y_np[:, None])[:, 0]
    deg = jnp.maximum(mg.hg.in_deg.reshape(-1), 1).astype(
        jnp.float32)[:, None]

    w0 = jnp.asarray(rng.normal(size=(feat, hidden),
                                scale=0.05).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(hidden, hidden),
                                scale=0.1).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(hidden, classes),
                                scale=0.1).astype(np.float32))
    x16 = (x @ w0)

    def spmm(bundle, h):
        return halo_fast_spmm(bundle, h, mesh, "data") / deg

    # ---- variant A: bare chain (r3's 106 ms/step program) --------------
    def make_A():
        def loss_fn(p, bundle, x16):
            h = jax.nn.relu(spmm(bundle, x16 @ p["w1"]))
            out = spmm(bundle, h) @ p["w2"]
            return out.sum()

        @jax.jit
        def run(p, bundle, x16):
            def body(c, _):
                g_ = jax.grad(loss_fn)(c, bundle, x16)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 1e-9 * b, c, g_), 0.0
            p, _ = jax.lax.scan(body, p, None, length=SCAN_LEN)
            return p
        return run, {"w1": w1, "w2": w2}, (x16,)

    # ---- variant C: + 602-projection + CE (no optimizer) ----------------
    def make_C():
        def loss_fn(p, bundle, x, y):
            h0 = x @ p["w0"]
            h = jax.nn.relu(spmm(bundle, h0 @ p["w1"]))
            out = spmm(bundle, h) @ p["w2"]
            import optax
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()

        @jax.jit
        def run(p, bundle, x, y):
            def body(c, _):
                g_ = jax.grad(loss_fn)(c, bundle, x, y)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 1e-9 * b, c, g_), 0.0
            p, _ = jax.lax.scan(body, p, None, length=SCAN_LEN)
            return p
        return run, {"w0": w0, "w1": w1, "w2": w2}, (x, y)

    # ---- variant D: full train step (C + adam) --------------------------
    tx = optax.adam(5e-3)

    def make_D():
        def loss_fn(p, bundle, x, y):
            h0 = x @ p["w0"]
            h = jax.nn.relu(spmm(bundle, h0 @ p["w1"]))
            out = spmm(bundle, h) @ p["w2"]
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()

        @jax.jit
        def run(carry, bundle, x, y):
            def body(c, _):
                p, o = c
                g_ = jax.grad(loss_fn)(p, bundle, x, y)
                up, o = tx.update(g_, o)
                return (optax.apply_updates(p, up), o), 0.0
            c, _ = jax.lax.scan(body, carry, None, length=SCAN_LEN)
            return c
        p = {"w0": w0, "w1": w1, "w2": w2}
        return run, (p, tx.init(p)), (x, y)

    bundle = (fmt, hg)
    variants = {}
    for name, maker in [("A", make_A), ("C", make_C), ("D", make_D)]:
        run, state, args = maker()
        t0 = time.time()
        out = run(state, bundle, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        print(f"# variant {name}: compile+first {time.time() - t0:.1f}s",
              flush=True)
        variants[name] = (run, state, args)

    # interleaved timed reps
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, (run, state, args) in variants.items():
            t0 = time.perf_counter()
            out = run(state, bundle, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.asarray(leaf).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / SCAN_LEN * 1e3
            times[name].append(dt)
            print(f"rep {rep} variant {name}: {dt:.1f} ms/step",
                  flush=True)
    for name, ts in times.items():
        print(f"RESULT {name}: min {min(ts):.1f}  med "
              f"{sorted(ts)[len(ts) // 2]:.1f}  max {max(ts):.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
