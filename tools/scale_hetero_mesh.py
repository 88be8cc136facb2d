"""Hetero mesh plane at non-toy scale (VERDICT r4 #4).

Builds a 1M+ node / 3-relation heterograph (paper-author-field shape:
cites, writes, has_topic), shards it over the 8-device virtual mesh
(one bipartite halo plane per canonical etype), audits build time +
bytes/device + wire traffic per plane — the O(P^2)/padding pathologies
live exactly here — and runs R-GCN (HeteroGraphConv) fwd+bwd training
steps end-to-end.  Reference regime: the hetero DistGraph client at
scale (``python/dgl/distributed/dist_graph.py:519``).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python tools/scale_hetero_mesh.py
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


def tree_bytes(x):
    import jax
    return sum(v.size * v.dtype.itemsize
               for v in jax.tree_util.tree_leaves(x)
               if hasattr(v, "size"))


def main(n_paper=700_000, n_author=290_000, n_field=10_000):
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn
    from jax.sharding import Mesh
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.parallel.hetero_mesh import shard_hetero_graph

    P_ = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    rng = np.random.default_rng(0)
    n_total = n_paper + n_author + n_field
    print(f"devices: {P_}  ntypes: paper {n_paper} author {n_author} "
          f"field {n_field} (total {n_total})", flush=True)

    t0 = time.time()
    # cites: temporal-locality + hubs (papers100M-flavored)
    e_c = 12_000_000
    src = rng.integers(0, n_paper, e_c)
    off = np.minimum(rng.lognormal(np.log(2000), 1.5, e_c).astype(
        np.int64) + 1, 40_000)
    dst = np.maximum(src - off, 0)
    cites = (src.astype(np.int32), dst.astype(np.int32))
    # writes: author -> their contiguous paper window (locality)
    e_w = 6_000_000
    a = rng.integers(0, n_author, e_w)
    p = np.minimum((a.astype(np.int64) * n_paper) // n_author
                   + rng.integers(0, 2000, e_w), n_paper - 1)
    writes = (a.astype(np.int32), p.astype(np.int32))
    # has_topic: paper -> zipf field
    e_t = 2_000_000
    pp = rng.integers(0, n_paper, e_t)
    ff = np.minimum((n_field * rng.uniform(size=e_t) ** 3).astype(
        np.int64), n_field - 1)
    topic = (pp.astype(np.int32), ff.astype(np.int32))
    g = dgl.heterograph({
        ("paper", "cites", "paper"): cites,
        ("author", "writes", "paper"): writes,
        ("paper", "has_topic", "field"): topic,
    }, num_nodes_dict={"paper": n_paper, "author": n_author,
                       "field": n_field})
    print(f"graph gen: {time.time()-t0:.0f}s  "
          f"({e_c + e_w + e_t} edges / 3 relations)", flush=True)

    # contiguous range partitions (METIS on 20M edges is minutes on the
    # 1-core host; range partitions are the papers100M layout anyway)
    parts = {nt: np.minimum(np.arange(g.num_nodes(nt)) * P_
                            // max(g.num_nodes(nt), 1), P_ - 1)
             for nt in g.ntypes}
    t0 = time.time()
    hmg = shard_hetero_graph(g, mesh, partitions=parts)
    t_build = time.time() - t0
    print(f"hetero mesh build: {t_build:.0f}s (3 bipartite halo planes)",
          flush=True)
    total_bytes = 0
    for cet, unit in zip(hmg.canonical_etypes, hmg._units):
        b = tree_bytes(unit.hg)
        total_bytes += b
        stats = unit.hg.comm_stats(feat_dim=64)
        print(f"  plane {cet}: arrays {fmt_bytes(b)} "
              f"({fmt_bytes(b // P_)}/device), halo rows/layer "
              f"{stats['halo_rows']}, wire {fmt_bytes(stats['bytes_wire'])}"
              f" ({stats['exchange']})", flush=True)
    print(f"  all planes: {fmt_bytes(total_bytes)} "
          f"({fmt_bytes(total_bytes // P_)}/device)", flush=True)

    # R-GCN over the mesh: HeteroGraphConv, 64-dim, full train step
    feat = 64
    classes = 16
    t0 = time.time()
    xs = {nt: hmg.shard_node_array(
        rng.normal(size=(g.num_nodes(nt), feat)).astype(np.float32), nt)
        for nt in g.ntypes}
    y = rng.integers(0, classes, n_paper).astype(np.int32)
    yp = hmg.shard_node_array(y[:, None], "paper")[:, 0]
    print(f"feature staging: {time.time()-t0:.0f}s", flush=True)

    class RGCN(nn.Module):
        @nn.compact
        def __call__(self, g, xs):
            h = dglnn.HeteroGraphConv(
                {"cites": dglnn.GraphConv(feat, 32,
                                          allow_zero_in_degree=True),
                 "writes": dglnn.GraphConv(feat, 32,
                                           allow_zero_in_degree=True),
                 "has_topic": dglnn.GraphConv(feat, 32,
                                              allow_zero_in_degree=True)},
                aggregate="sum")(g, xs)
            h = {k: jax.nn.relu(v) for k, v in h.items()}
            h2 = dglnn.HeteroGraphConv(
                {"cites": dglnn.GraphConv(32, classes,
                                          allow_zero_in_degree=True),
                 "writes": dglnn.GraphConv(32, classes,
                                           allow_zero_in_degree=True),
                 "has_topic": dglnn.GraphConv(32, classes,
                                              allow_zero_in_degree=True)},
                aggregate="sum")(g, h)
            return h2["paper"]

    model = RGCN()
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), hmg.local_var(), xs)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, xs, yp):
        def loss_fn(p):
            logits = model.apply(p, hmg.local_var(), xs)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yp).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return optax.apply_updates(p, up), o, l

    params, opt, l0 = step(params, opt, xs, yp)
    l0 = float(l0)
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        params, opt, l = step(params, opt, xs, yp)
    l = float(l)
    t_steady = (time.time() - t0) / 2
    print(f"R-GCN fwd+bwd+adam over the {P_}-mesh: first (incl compile) "
          f"{t_first:.0f}s, steady {t_steady:.1f}s/step "
          f"(1-core-host CPU mesh), loss {l0:.4f} -> {l:.4f}", flush=True)
    assert np.isfinite(l) and l < l0
    print(f"RESULT: {n_total} nodes / {e_c+e_w+e_t} edges / 3 relations, "
          f"{P_} parts: build {t_build:.0f}s, planes "
          f"{fmt_bytes(total_bytes // P_)}/device, steady "
          f"{t_steady:.1f}s/step", flush=True)


if __name__ == "__main__":
    main()
