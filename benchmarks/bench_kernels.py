"""Kernel microbenchmarks (reference ``benchmarks/benchmarks/kernel/``:
bench_gspmm_copy_u.py, bench_gspmm_u_mul_e_sum.py, bench_gsddmm_u_dot_v,
bench_edge_softmax)."""
import numpy as np

from .harness import benchmark, parametrize, Timer


def _graph(n, e, seed=0):
    import dgl_tpu as dgl
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=n)
    g.create_formats_()
    return g


@benchmark("time")
@parametrize("feat", [16, 128])
@parametrize("n", [10_000, 100_000])
def bench_gspmm_copy_u_sum(n, feat):
    import jax, jax.numpy as jnp
    from dgl_tpu.ops import gspmm
    g = _graph(n, n * 10)
    x = jnp.ones((n, feat), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda x: gspmm(unit, "copy_lhs", "sum", x, None))
    return Timer().bench(f, x)


@benchmark("time")
@parametrize("feat", [64])
@parametrize("n", [10_000, 100_000])
def bench_gspmm_u_mul_e_sum(n, feat):
    import jax, jax.numpy as jnp
    from dgl_tpu.ops import gspmm
    g = _graph(n, n * 10)
    x = jnp.ones((n, feat), jnp.float32)
    w = jnp.ones((n * 10, 1), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda x, w: gspmm(unit, "mul", "sum", x, w))
    return Timer().bench(f, x, w)


@benchmark("time")
@parametrize("n", [10_000, 100_000])
def bench_gspmm_copy_u_max(n):
    import jax, jax.numpy as jnp
    from dgl_tpu.ops import gspmm
    g = _graph(n, n * 10)
    x = jnp.ones((n, 64), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda x: gspmm(unit, "copy_lhs", "max", x, None))
    return Timer().bench(f, x)


@benchmark("time")
@parametrize("feat", [64])
@parametrize("n", [10_000, 100_000])
def bench_gsddmm_u_dot_v(n, feat):
    import jax, jax.numpy as jnp
    from dgl_tpu.ops import gsddmm
    g = _graph(n, n * 10)
    x = jnp.ones((n, feat), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda x: gsddmm(unit, "dot", x, x, "u", "v"))
    return Timer().bench(f, x)


@benchmark("time")
@parametrize("n", [10_000, 100_000])
def bench_edge_softmax(n):
    import jax, jax.numpy as jnp
    from dgl_tpu.ops import edge_softmax_unit
    g = _graph(n, n * 10)
    e = jnp.ones((n * 10, 4, 1), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda e: edge_softmax_unit(unit, e))
    return Timer().bench(f, e)


@benchmark("throughput")
@parametrize("n", [100_000])
def bench_tiled_spmm_edges_per_s(n):
    """North-star: Pallas tile-dense SpMM edges/s."""
    import time, jax, jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu.ops import gspmm
    e = n * 10
    g = _graph(n, e)
    g.create_tiled_format()
    x = jnp.ones((n, 128), jnp.float32)
    unit = g.unit()
    f = jax.jit(lambda x: gspmm(unit, "copy_lhs", "sum", x, None))
    t = Timer().bench(f, x)
    return e / t


@benchmark("throughput")
@parametrize("n", [100_000])
def bench_fused_gat_edges_per_s(n):
    """Fused slot-space GAT layer (fwd) edges/s."""
    import jax, jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    e = n * 10
    g = _graph(n, e)
    g.create_tiled_format()
    x = jnp.ones((n, 64), jnp.float32)
    mod = dglnn.GATConv(64, 32, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), g, x)
    f = jax.jit(lambda x: mod.apply(params, g, x))
    t = Timer().bench(f, x)
    return e / t


@benchmark("time")
@parametrize("n", [100_000])
def bench_weighted_spmm_cached_slots(n):
    """Static slot-weight cache vs per-call gather (the 16.7x path)."""
    import jax, jax.numpy as jnp
    import dgl_tpu.function as fn
    g = _graph(n, n * 10)
    g.create_tiled_format()
    import numpy as np
    rng = np.random.default_rng(0)
    g.edata["w"] = jnp.asarray(rng.random(n * 10).astype(np.float32))
    g.cache_edge_weights("w")
    x = jnp.ones((n, 128), jnp.float32)

    def run(g, x):
        gg = g.clone()
        gg.ndata["h"] = x
        gg.update_all(fn.u_mul_e("h", "w", "m"), fn.sum("m", "out"))
        return gg.ndata["out"]
    f = jax.jit(run)
    return Timer().bench(f, g, x)


@benchmark("time")
@parametrize("fused", [True, False])
@parametrize("rels", [8, 32])
def bench_fused_multi_update_all(rels, fused):
    """One stacked SpMM for all relations vs per-relation programs."""
    import jax.numpy as jnp
    import numpy as np
    import dgl_tpu as dgl
    import dgl_tpu.function as fn
    rng = np.random.default_rng(0)
    n = 20_000
    edges = {("n", f"r{i}", "n"): (rng.integers(0, n, 50_000),
                                   rng.integers(0, n, 50_000))
             for i in range(rels)}
    g = dgl.heterograph(edges)
    g.nodes["n"].data["h"] = jnp.asarray(
        rng.normal(size=(n, 64)).astype(np.float32))
    ed = {f"r{i}": (fn.copy_u("h", "m"), fn.sum("m", "out"))
          for i in range(rels)}

    from dgl_tpu.utils import config
    def run():
        old = config.get("fuse_multi_update_all")
        config.set("fuse_multi_update_all", fused)
        try:
            gg = g.clone()
            gg.multi_update_all(ed, "sum")
            return gg.nodes["n"].data["out"]
        finally:
            config.set("fuse_multi_update_all", old)
    return Timer().bench(run)


@benchmark("time")
@parametrize("feat", [16, 128])
@parametrize("n", [50_000])
def bench_bitmask_spmm(n, feat):
    """Bit-packed full-dense SpMM (ops/pallas/bitmm.py) — the dense-regime
    kernel family behind the headline bench (1-bit adjacency stream)."""
    import jax, jax.numpy as jnp
    import dgl_tpu as dgl
    rng = np.random.default_rng(0)
    e = n * 50
    r0 = rng.integers(0, n, e // 2).astype(np.int64)
    c0 = rng.integers(0, n, e // 2).astype(np.int64)
    g = dgl.graph((np.r_[r0, c0], np.r_[c0, r0]), num_nodes=n)
    g.unit().create_bitmask_format(symmetric=True)
    unit = g.unit()
    from dgl_tpu.ops import gspmm
    x = jnp.ones((n, feat), jnp.float32)
    # pass the unit as a jit ARG: the packed bitmask as an HLO constant
    # exceeds the remote-compile upload limit
    f = jax.jit(lambda u, x: gspmm(u, "copy_lhs", "sum", x, None))
    return Timer().bench(f, unit, x)


@benchmark("time")
@parametrize("train", [False, True])
@parametrize("n", [50_000])
def bench_bitgat_attention(n, train):
    """Dense bit-masked flash-attention GAT (ops/pallas/bitgat.py):
    full GATConv fwd (and fwd+bwd) through the bitmask dispatch."""
    import jax, jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.utils import config
    rng = np.random.default_rng(0)
    e = n * 50
    r0 = rng.integers(0, n, e // 2).astype(np.int64)
    c0 = rng.integers(0, n, e // 2).astype(np.int64)
    row, col = np.r_[r0, c0], np.r_[c0, r0]
    # dedupe: a multi-edge remainder disqualifies the dense-attention
    # dispatch (softmax cannot ride the COO remainder)
    key = np.unique(row * n + col)
    g = dgl.graph((key // n, key % n), num_nodes=n)
    g.unit().create_bitmask_format(symmetric=True)
    assert g.unit()._bits.rem_src.shape[0] == 0   # dispatch guard
    x = jnp.ones((n, 64), jnp.float32)
    mod = dglnn.GATConv(64, 32, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), g, x)
    # pass g as a jit ARG — the packed bitmask as an HLO constant is a
    # 312 MB compile upload through the tunnel (the 413 lesson)
    if train:
        f = jax.jit(jax.grad(
            lambda p, g, x: (mod.apply(p, g, x) ** 2).mean()))
        return Timer().bench(lambda g, x: f(params, g, x), g, x)
    f = jax.jit(lambda g, x: mod.apply(params, g, x))
    return Timer().bench(f, g, x)


@benchmark("time")
@parametrize("train", [False, True])
@parametrize("n", [50_000])
def bench_bitdot_attention(n, train):
    """Dense bit-masked dot-product attention (ops/pallas/bitdot.py):
    DotGatConv through the bitmask dispatch."""
    import jax, jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    rng = np.random.default_rng(0)
    e = n * 50
    r0 = rng.integers(0, n, e // 2).astype(np.int64)
    c0 = rng.integers(0, n, e // 2).astype(np.int64)
    row, col = np.r_[r0, c0], np.r_[c0, r0]
    key = np.unique(row * n + col)
    g = dgl.graph((key // n, key % n), num_nodes=n)
    g.unit().create_bitmask_format(symmetric=True)
    assert g.unit()._bits.rem_src.shape[0] == 0   # dispatch guard
    x = jnp.ones((n, 64), jnp.float32)
    mod = dglnn.DotGatConv(64, 64, num_heads=2)
    params = mod.init(jax.random.PRNGKey(0), g, x)
    if train:
        f = jax.jit(jax.grad(
            lambda p, g, x: (mod.apply(p, g, x) ** 2).mean()))
        return Timer().bench(lambda g, x: f(params, g, x), g, x)
    f = jax.jit(lambda g, x: mod.apply(params, g, x))
    return Timer().bench(f, g, x)
