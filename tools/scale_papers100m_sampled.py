"""papers100M-scale SAMPLED training gate on the virtual mesh
(VERDICT r4 #1b — the structural completion of SURVEY §7 GATE #3).

The full-batch halo-tiled route measured 2.01 GiB/device at 2.4M nodes
(tools/scale_papers100m.py) — it structurally cannot reach 111M nodes.
The sampled plane is the road the reference actually takes for this
graph class (``distributed/graph_services.py:35-255`` sampled blocks +
KVStore feature pull): per-device graph state is the MeshCSC slice
(~E/P * 4 B), orders of magnitude below the dense-kernel formats.

This tool proves it end-to-end: papers100M-shaped synthetic graph
(>= 2.4M nodes / >= 100M edges), standalone sampled-plane build
(``build_mesh_csc_edges`` — NO halo plane), a per-device memory audit,
and 2-layer sampled-SAGE training steps over the 8-device mesh (loss
must fall; CPU-mesh step time is a correctness gate, not a perf claim
— the on-chip number is tools/perf_mesh_minibatch_bisect.py).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python tools/scale_papers100m_sampled.py [N] [E]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def fmt_bytes(b):
    return f"{b / (1 << 30):.2f} GiB" if b >= (1 << 30) \
        else f"{b / (1 << 20):.1f} MiB"


def main(num_nodes=2_400_000, num_edges=100_000_000):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh
    from dgl_tpu.data.synth_papers import papers_like_graph
    from dgl_tpu.parallel.mesh_minibatch import (
        build_mesh_csc_edges, mesh_shard_rows, sample_frontier,
        gather_frontier, frontier_sizes, block_mean)

    P_ = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    print(f"devices: {P_}  graph: {num_nodes} nodes / {num_edges} edges",
          flush=True)

    t0 = time.time()
    row, col = papers_like_graph(num_nodes, num_edges)
    print(f"generate: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    mcsc, perm = build_mesh_csc_edges(row, col, num_nodes, mesh)
    t_build = time.time() - t0
    del row, col
    # per-device audit: each device owns one (npp+1,) indptr slice and
    # one (E_max,) indices slice of the (P, ...) sharded arrays
    csc_dev = (mcsc.indptr.shape[1] + mcsc.indices.shape[1]) * 4
    feat, classes = 128, 172            # ogbn-papers100M widths
    x_dev = mcsc.nodes_per_part * feat * 4
    y_dev = mcsc.nodes_per_part * 4
    print(f"sampled-plane build: {t_build:.0f}s "
          f"(E_max/device = {mcsc.indices.shape[1]})", flush=True)
    print(f"per-device audit: MeshCSC {fmt_bytes(csc_dev)} + "
          f"features {fmt_bytes(x_dev)} + labels {fmt_bytes(y_dev)} = "
          f"{fmt_bytes(csc_dev + x_dev + y_dev)}   "
          f"[full-batch halo-tiled route at this scale: 2.01 GiB/device]",
          flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    x = rng.normal(size=(num_nodes, feat)).astype(np.float32)
    y = rng.integers(0, classes, num_nodes).astype(np.int32)
    xs = mesh_shard_rows(x, perm, mcsc, mesh)
    ys = mesh_shard_rows(y[:, None], perm, mcsc, mesh)[:, 0]
    del x, y
    jax.block_until_ready((mcsc.indptr, xs))
    print(f"feature staging: {time.time()-t0:.0f}s", flush=True)

    S, FANOUTS = 128, [10, 10]          # 128 seeds/device = 1024 global
    sizes = frontier_sizes(S, FANOUTS)
    N = num_nodes
    params = {
        "w1": jnp.asarray(rng.normal(size=(feat, 64), scale=0.1),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(64, classes), scale=0.1),
                          jnp.float32),
    }
    tx = optax.adam(1e-2)
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
        p, o = carry
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
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return (optax.apply_updates(p, up), o), l

    @jax.jit
    def steps(p, o, mcsc, xs, ys, key):
        (p, o), ls = jax.lax.scan(
            lambda c, k: one_step(c, k, mcsc, xs, ys), (p, o),
            jax.random.split(key, 5))
        return p, o, ls

    t0 = time.time()
    params, opt, ls = steps(params, opt, mcsc, xs, ys,
                            jax.random.PRNGKey(0))
    l0 = np.asarray(ls)
    print(f"first 5 sampled steps (compile incl): {time.time()-t0:.0f}s"
          f"  losses {np.round(l0, 3)}", flush=True)
    t0 = time.time()
    params, opt, ls = steps(params, opt, mcsc, xs, ys,
                            jax.random.PRNGKey(1))
    l1 = np.asarray(ls)
    dt = (time.time() - t0) / 5
    print(f"steady: {dt*1e3:.0f} ms/step (1-core-host CPU mesh)  "
          f"losses {np.round(l1, 3)}", flush=True)
    assert np.all(np.isfinite(l1))
    assert l1[-1] < l0[0], "loss did not fall over 10 sampled steps"
    print(f"RESULT: {num_nodes} nodes / {num_edges} edges, {P_} parts, "
          f"sampled plane {fmt_bytes(csc_dev)}/device graph state "
          f"(vs 2.01 GiB full-batch), build {t_build:.0f}s, "
          f"loss {l0[0]:.3f} -> {l1[-1]:.3f}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    main(n, e)
