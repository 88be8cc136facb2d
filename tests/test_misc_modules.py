"""Tests: sparse module, hetero conversion, traversal, homophily, optim,
geometry, readout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import sparse as dglsp


def test_sparse_matrix_basics():
    A = dglsp.from_coo([0, 0, 1, 2], [1, 2, 2, 0],
                       jnp.array([1.0, 2.0, 3.0, 4.0]), shape=(3, 3))
    assert A.shape == (3, 3)
    assert A.nnz == 4
    dense = np.asarray(A.to_dense())
    assert dense[0, 1] == 1 and dense[2, 0] == 4
    At = A.T
    assert np.asarray(At.to_dense())[1, 0] == 1


def test_sparse_spmm():
    rng = np.random.default_rng(0)
    r = rng.integers(0, 10, 40)
    c = rng.integers(0, 8, 40)
    v = rng.normal(size=40).astype(np.float32)
    A = dglsp.from_coo(r, c, jnp.asarray(v), shape=(10, 8))
    X = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    out = dglsp.spmm(A, X)
    ref = np.asarray(A.to_dense()) @ np.asarray(X)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # operator form
    out2 = A @ X
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-4, atol=1e-4)


def test_sparse_spmm_grad():
    A = dglsp.from_coo([0, 1, 1], [1, 0, 1], jnp.array([1.0, 2.0, 3.0]),
                       shape=(2, 2))
    X = jnp.ones((2, 3))

    def loss(val):
        return (dglsp.spmm(A.with_values(val), X) ** 2).sum()

    g = jax.grad(loss)(A.val)
    assert np.isfinite(np.asarray(g)).all()


def test_sparse_sddmm():
    rng = np.random.default_rng(1)
    A = dglsp.from_coo([0, 1, 2], [1, 2, 0], jnp.ones(3), shape=(3, 3))
    X1 = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    X2 = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    out = dglsp.sddmm(A, X1, X2)
    full = np.asarray(X1) @ np.asarray(X2)
    for i, (r, c) in enumerate(zip([0, 1, 2], [1, 2, 0])):
        np.testing.assert_allclose(float(out.val[i]), full[r, c],
                                   rtol=1e-4)


def test_sparse_spspmm():
    A = dglsp.from_coo([0, 1], [1, 0], jnp.array([2.0, 3.0]), shape=(2, 2))
    B = dglsp.from_coo([0, 1], [0, 1], jnp.array([5.0, 7.0]), shape=(2, 2))
    C = dglsp.spspmm(A, B)
    ref = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
    np.testing.assert_allclose(np.asarray(C.to_dense()), ref)


def test_sparse_softmax():
    A = dglsp.from_coo([0, 0, 1], [0, 1, 1], jnp.array([1.0, 1.0, 5.0]),
                       shape=(2, 2))
    S = dglsp.softmax(A)
    d = np.asarray(S.to_dense())
    np.testing.assert_allclose(d[0].sum(), 1.0, rtol=1e-5)


def test_sparse_reductions_and_ops():
    A = dglsp.from_coo([0, 0, 1], [0, 1, 1], jnp.array([1.0, 2.0, 3.0]),
                       shape=(2, 2))
    assert float(A.sum()) == 6.0
    np.testing.assert_allclose(np.asarray(A.sum(dim=1)), [3.0, 3.0])
    B = A * 2.0
    assert float(B.val.sum()) == 12.0
    C = A + A
    assert float(C.val.sum()) == 12.0
    D = dglsp.diag(jnp.ones(2))
    assert D.is_diag()


def test_to_homogeneous_roundtrip():
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
    })
    hg.nodes["user"].data["h"] = jnp.ones((3, 2))
    hg.nodes["game"].data["h"] = jnp.zeros((2, 2))
    g = dgl.to_homogeneous(hg, ndata=["h"])
    assert g.num_nodes() == 5
    assert g.num_edges() == 5
    assert dgl.NTYPE in g.ndata
    back = dgl.to_heterogeneous(g, hg.ntypes, hg.etypes)
    assert back.num_nodes("user") == 3
    assert back.num_nodes("game") == 2
    assert back.num_edges("plays") == 3
    np.testing.assert_allclose(np.asarray(back.nodes["game"].data["h"]), 0)


def test_bfs_topo_traversal():
    g = dgl.graph(([0, 0, 1, 2], [1, 2, 3, 3]))
    levels = dgl.traversal.bfs_nodes_generator(g, 0)
    lv = [sorted(np.asarray(l).tolist()) for l in levels]
    assert lv == [[0], [1, 2], [3]]
    topo = dgl.traversal.topological_nodes_generator(g)
    t = [sorted(np.asarray(l).tolist()) for l in topo]
    assert t == [[0], [1, 2], [3]]
    with pytest.raises(ValueError):
        cyc = dgl.graph(([0, 1], [1, 0]))
        dgl.traversal.topological_nodes_generator(cyc)


def test_prop_nodes_topo():
    import dgl_tpu.function as fn
    g = dgl.graph(([0, 0, 1, 2], [1, 2, 3, 3]))
    g.ndata["h"] = jnp.array([[1.0], [0.0], [0.0], [0.0]])
    dgl.prop_nodes_topo(g, fn.copy_u("h", "m"), fn.sum("m", "h"))
    # node3 receives h1+h2 which received h0 each
    np.testing.assert_allclose(np.asarray(g.ndata["h"]).ravel(),
                               [1, 1, 1, 2])


def test_homophily_metrics():
    g = dgl.graph(([0, 1, 2, 3], [1, 0, 3, 2]))
    y = jnp.array([0, 0, 1, 1])
    assert dgl.edge_homophily(g, y) == 1.0
    assert dgl.node_homophily(g, y) == 1.0
    y2 = jnp.array([0, 1, 0, 1])
    assert dgl.edge_homophily(g, y2) == 0.0
    li = dgl.label_informativeness(g, y)
    assert 0.99 <= li <= 1.01


def test_sparse_adam():
    from dgl_tpu.nn import NodeEmbedding
    from dgl_tpu.optim import SparseAdam
    emb = NodeEmbedding(50, 8, "t")
    opt = SparseAdam([emb], lr=0.1)
    ids = jnp.array([1, 5, 7])
    before = np.asarray(emb.weight).copy()

    def loss(rows):
        return (rows ** 2).sum()

    rows = emb(ids)
    grads = jax.grad(loss)(rows)
    opt.step([(ids, grads)])
    after = np.asarray(emb.weight)
    changed = np.abs(after - before).sum(axis=1) > 0
    assert changed[np.asarray(ids)].all()
    assert not changed[0]


def test_fps_and_knn():
    from dgl_tpu.geometry import farthest_point_sampler, knn
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    picks = farthest_point_sampler(pos, 5)
    assert len(set(np.asarray(picks).tolist())) == 5
    idx = knn(pos, 4)
    assert idx.shape == (30, 4)
    # first neighbor of each point is itself
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(30))


def test_neighbor_matching():
    from dgl_tpu.geometry import neighbor_matching
    g = dgl.graph(([0, 2], [1, 3]))
    lab = np.asarray(neighbor_matching(g))
    assert lab[0] == lab[1]
    assert lab[2] == lab[3]
    assert lab[0] != lab[2]


def test_line_graph():
    g = dgl.graph(([0, 1, 2], [1, 2, 0]))
    lg = dgl.line_graph(g)
    assert lg.num_nodes() == 3
    # cycle: each edge has exactly one successor
    assert lg.num_edges() == 3


def test_metapath_reachable():
    hg = dgl.heterograph({
        ("a", "ab", "b"): ([0, 1], [0, 1]),
        ("b", "ba", "a"): ([0, 1], [1, 0]),
    })
    g = dgl.metapath_reachable_graph(hg, ["ab", "ba"])
    assert g.num_nodes() == 2
    row, col = (np.asarray(x) for x in g.unit().coo())
    assert set(zip(row.tolist(), col.tolist())) == {(0, 1), (1, 0)}


def test_profiler_roofline_and_timer():
    import jax.numpy as jnp
    from dgl_tpu import profiler
    r = profiler.spmm_roofline(10_000_000, 128, 100_000, chip="v5e")
    assert r.bound == "memory"          # SpMM is HBM-bound on TPU
    assert r.intensity < 10
    g = profiler.gemm_roofline(4096, 4096, 4096, chip="v5e")
    assert g.bound == "compute"         # big GEMM is MXU-bound
    t = profiler.op_timer(lambda x: x @ x, jnp.ones((128, 128)), repeats=2)
    assert t > 0


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp
    from dgl_tpu import profiler
    with profiler.trace(str(tmp_path)):
        with profiler.annotate("matmul"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os
    found = any("xplane" in f or "trace" in f.lower()
                for _, _, fs in os.walk(tmp_path) for f in fs)
    assert found


def test_parity_modules():
    import numpy as np
    import dgl_tpu as dgl
    from dgl_tpu import storages, distgnn
    from dgl_tpu.utils import (Filter, pin_memory_inplace,
                               gather_pinned_tensor_rows)
    from dgl_tpu.nn.softmax import edge_softmax  # noqa: F401

    f = Filter([1, 2, 3])
    np.testing.assert_array_equal(f.find_included_indices([0, 2, 5, 3]),
                                  [1, 3])
    np.testing.assert_array_equal(f.find_excluded_indices([0, 2, 5, 3]),
                                  [0, 2])
    s = storages.wrap_storage(np.arange(10.0))
    assert float(s.fetch([3])[0]) == 3.0
    pinned = pin_memory_inplace(np.arange(12).reshape(3, 4))
    rows = gather_pinned_tensor_rows(pinned, [1, 2])
    assert rows.shape == (2, 4)
    g = dgl.graph((np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0])))
    parts, rep = distgnn.partition_graph(g, 2)
    assert sum(p.num_edges() for p in parts.values()) == 4


def test_shared_tensor():
    import numpy as np
    from dgl_tpu import multiprocessing as dmp
    t = dmp.shared_tensor((4, 2), name="dgltpu_test_shm_1")
    t[:] = 3.0
    t2 = dmp.call_once_and_share(lambda: np.zeros((4, 2)), (4, 2),
                                 np.float32, "dgltpu_test_shm_1")
    np.testing.assert_allclose(t2, 3.0)
