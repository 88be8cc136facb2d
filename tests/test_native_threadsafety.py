"""Thread-safety stress for the native host kernels (SURVEY §5.2: the
reference relies on OpenMP atomics + a concurrent id hashmap; our
equivalent must survive concurrent callers)."""
import threading

import numpy as np
import pytest

import dgl_tpu
from dgl_tpu import csrc


@pytest.mark.skipif(not csrc.AVAILABLE, reason="native lib not built")
def test_concurrent_sampling_and_compaction():
    rng = np.random.default_rng(0)
    N, E = 5000, 60000
    g = dgl_tpu.graph((rng.integers(0, N, E), rng.integers(0, N, E)),
                      num_nodes=N)
    g.create_formats_()
    errors = []

    def worker(seed):
        try:
            r = np.random.default_rng(seed)
            for _ in range(10):
                seeds = np.unique(r.integers(0, N, 256))
                sub = dgl_tpu.sampling.sample_neighbors(g, seeds, 5)
                row, col = (np.asarray(a) for a in sub.unit().coo())
                assert row.min() >= 0 and row.max() < N
                assert col.min() >= 0 and col.max() < N
                # per-seed in-degree respects the fanout
                seed_set = np.unique(seeds)
                deg = np.bincount(col, minlength=N)
                assert deg[seed_set].max() <= 5
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[0]


@pytest.mark.skipif(not csrc.AVAILABLE, reason="native lib not built")
def test_concurrent_tiled_builds():
    from dgl_tpu.ops.pallas.tiled_spmm import build_tiled_format
    rng = np.random.default_rng(1)
    N, E = 4000, 50000
    rows = [rng.integers(0, N, E) for _ in range(4)]
    cols = [rng.integers(0, N, E) for _ in range(4)]
    results = [None] * 4
    errors = []

    def worker(i):
        try:
            tf = build_tiled_format(rows[i], cols[i], N, N,
                                    tile=256, cap=256)
            eids = np.asarray(tf.eid).reshape(-1)
            real = eids[eids >= 0]
            assert len(real) == E and len(np.unique(real)) == E
            results[i] = tf.num_buckets
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[0]
    assert all(r is not None for r in results)
