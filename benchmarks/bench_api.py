"""API benchmarks (reference ``benchmarks/benchmarks/api/``: bench_batch,
bench_to_block, bench_format_conversion, bench_sample_neighbors,
bench_metis_partition)."""
import numpy as np

from .harness import benchmark, parametrize, Timer


def _graph(n, e, seed=0):
    import dgl_tpu as dgl
    rng = np.random.default_rng(seed)
    return dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                     num_nodes=n)


@benchmark("time")
@parametrize("batch_size", [64, 256])
def bench_batch(batch_size):
    import time
    import dgl_tpu as dgl
    gs = [_graph(30, 120, seed=i) for i in range(batch_size)]
    t0 = time.perf_counter()
    dgl.batch(gs)
    return time.perf_counter() - t0


@benchmark("time")
@parametrize("n", [100_000])
def bench_format_conversion(n):
    import time
    g = _graph(n, n * 10)
    t0 = time.perf_counter()
    g.create_formats_()
    return time.perf_counter() - t0


@benchmark("time")
@parametrize("fanout", [5, 15])
@parametrize("n", [100_000])
def bench_sample_neighbors(n, fanout):
    import time
    import dgl_tpu as dgl
    g = _graph(n, n * 10)
    g.unit().csc()  # pre-build
    seeds = np.arange(1024)
    t0 = time.perf_counter()
    dgl.sampling.sample_neighbors(g, seeds, fanout)
    return time.perf_counter() - t0


@benchmark("time")
@parametrize("n", [100_000])
def bench_to_block(n):
    import time
    import dgl_tpu as dgl
    from dgl_tpu.graph.convert import to_block
    g = _graph(n, n * 10)
    seeds = np.arange(1024)
    frontier = dgl.sampling.sample_neighbors(g, seeds, 10)
    t0 = time.perf_counter()
    to_block(frontier, seeds)
    return time.perf_counter() - t0


@benchmark("time")
@parametrize("k", [4])
@parametrize("n", [50_000])
def bench_metis_partition(n, k):
    import time
    from dgl_tpu.partition import metis_partition_assignment
    g = _graph(n, n * 8)
    t0 = time.perf_counter()
    metis_partition_assignment(g, k)
    return time.perf_counter() - t0


@benchmark("time")
@parametrize("length", [20])
def bench_random_walk(length):
    import time
    from dgl_tpu.sampling import random_walk
    g = _graph(50_000, 500_000)
    g.unit().csr()
    seeds = np.arange(2048)
    t0 = time.perf_counter()
    random_walk(g, seeds, length=length)
    return time.perf_counter() - t0
