"""Tests for the top-level API completion batch: label informativeness,
dfs_labeled_edges, type subgraphs, slice_batch, bipartite converters,
shared-memory graphs, combine_names."""
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu


def test_label_informativeness_reference_goldens():
    # values from the reference docstrings (label_informativeness.py)
    g = dgl_tpu.graph((np.array([0, 1, 2, 2, 3, 4]),
                       np.array([1, 2, 0, 3, 4, 5])))
    y = np.array([0, 0, 0, 0, 1, 1])
    assert abs(dgl_tpu.edge_label_informativeness(g, y) - 0.251776) < 1e-4
    assert abs(dgl_tpu.node_label_informativeness(g, y) - 0.338187) < 1e-4


def test_dfs_labeled_edges():
    # path 0->1->2 plus back edge 2->0: forward, forward, nontree
    g = dgl_tpu.graph((np.array([0, 1, 2]), np.array([1, 2, 0])))
    edges, labels = dgl_tpu.dfs_labeled_edges_generator(
        g, [0], has_nontree_edge=True)
    e = [int(x[0]) for x in edges]
    l = [int(x[0]) for x in labels]
    assert e == [0, 1, 2]
    assert l == [0, 0, 2]
    # with reverse edges: retreat events appear after children exhausted
    edges, labels = dgl_tpu.dfs_labeled_edges_generator(
        g, [0], has_reverse_edge=True, has_nontree_edge=True)
    l = [int(x[0]) for x in labels]
    assert l.count(1) == 2  # two tree edges retreated


def _hetero():
    return dgl_tpu.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([0, 2]), np.array([0, 1])),
        ("dev", "makes", "game"): (np.array([0]), np.array([1])),
    })


def test_node_type_subgraph():
    g = _hetero()
    g.nodes["user"].data["h"] = jnp.arange(3.0)
    sg = dgl_tpu.node_type_subgraph(g, ["user", "game"])
    assert set(sg.ntypes) == {"user", "game"}
    assert set(e[1] for e in sg.canonical_etypes) == {"follows", "plays"}
    assert np.allclose(np.asarray(sg.nodes["user"].data["h"]),
                       [0.0, 1.0, 2.0])


def test_edge_type_subgraph():
    g = _hetero()
    sg = dgl_tpu.edge_type_subgraph(g, ["plays"])
    assert set(sg.ntypes) == {"user", "game"}
    assert sg.num_edges() == 2
    with pytest.raises(Exception):
        dgl_tpu.node_type_subgraph(g, ["nope"])


def test_slice_batch():
    g1 = dgl_tpu.graph((np.array([0, 1]), np.array([2, 3])))
    g1.ndata["x"] = jnp.arange(4.0)
    g2 = dgl_tpu.graph((np.array([1]), np.array([2])))
    g2.ndata["x"] = jnp.arange(3.0) + 10
    bg = dgl_tpu.batch([g1, g2])
    s0 = dgl_tpu.slice_batch(bg, 0)
    s1 = dgl_tpu.slice_batch(bg, 1, store_ids=True)
    assert s0.num_nodes() == 4 and s0.num_edges() == 2
    assert s1.num_nodes() == 3 and s1.num_edges() == 1
    assert np.allclose(np.asarray(s1.ndata["x"]), [10, 11, 12])
    assert np.array_equal(np.asarray(s1.ndata[dgl_tpu.NID]), [4, 5, 6])
    r, c = s1.edges()
    assert int(r[0]) == 1 and int(c[0]) == 2


def test_bipartite_from_scipy():
    import scipy.sparse as sp
    m = sp.coo_matrix((np.ones(3), ([0, 1, 2], [1, 0, 1])), shape=(3, 2))
    g = dgl_tpu.bipartite_from_scipy(m, "u", "r", "v", eweight_name="w")
    assert g.num_nodes("u") == 3 and g.num_nodes("v") == 2
    assert g.num_edges() == 3
    assert np.allclose(np.asarray(g.edges["r"].data["w"]), 1.0)


def test_bipartite_from_networkx():
    nx = pytest.importorskip("networkx")
    nxg = nx.Graph()
    nxg.add_nodes_from(["a", "b"], bipartite=0)
    nxg.add_nodes_from(["x", "y", "z"], bipartite=1)
    nxg.add_edges_from([("a", "x"), ("b", "z"), ("a", "y")])
    g = dgl_tpu.bipartite_from_networkx(nxg, "u", "r", "v")
    assert g.num_nodes("u") == 2 and g.num_nodes("v") == 3
    assert g.num_edges() == 3


def test_hetero_shared_memory_roundtrip():
    from dgl_tpu.multiprocessing import graph_to_shared_memory
    g = _hetero()
    graph_to_shared_memory(g, "dgltpu_test_shm_g")
    g2 = dgl_tpu.hetero_from_shared_memory("dgltpu_test_shm_g")
    assert g2.ntypes == g.ntypes
    assert g2.canonical_etypes == g.canonical_etypes
    for cet in g.canonical_etypes:
        r1, c1 = g.edges(etype=cet)
        r2, c2 = g2.edges(etype=cet)
        assert np.array_equal(np.asarray(r1), np.asarray(r2))
        assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_combine_names():
    assert dgl_tpu.combine_names(["b", "a"]) == "a+b"
    assert dgl_tpu.combine_names(["b", "a", "c"], [0, 2]) == "b+c"


def test_topk_edges_exported():
    g = dgl_tpu.graph((np.array([0, 1, 2]), np.array([1, 2, 0])))
    g.edata["s"] = jnp.asarray([[3.0], [1.0], [2.0]])
    vals, idx = dgl_tpu.topk_edges(g, "s", 2)
    assert vals.shape[-2] == 2


def test_dataloading_legacy_surface():
    import numpy as np
    import dgl_tpu.dataloading as DL
    g = dgl_tpu.graph((np.arange(50) % 10, (np.arange(50) * 3) % 10))
    g.ndata["feat"] = jnp.ones((10, 4))
    coll = DL.NodeCollator(g, np.arange(10), DL.NeighborSampler([2, 2]))
    out = coll.collate(np.arange(4))
    assert len(out) == 3
    ec = DL.EdgeCollator(g, np.arange(50), DL.NeighborSampler([2]),
                         negative_sampler=DL.Uniform(1))
    out = ec.collate(np.arange(6))
    assert len(out) == 4
    ds = DL.create_tensorized_dataset(np.arange(10), 4)
    assert [len(b) for b in ds] == [4, 4, 2]
    ddp = DL.create_tensorized_dataset(np.arange(10), 4, use_ddp=True,
                                       rank=1, world_size=2)
    assert list(next(iter(ddp))) == [5, 6, 7, 8]


def test_spot_target_excluder():
    import numpy as np
    import dgl_tpu.dataloading as DL
    # nodes 0 and 1 are hubs; nodes 5..9 low degree
    src = np.concatenate([np.zeros(10, int), np.ones(10, int), [0, 5]])
    dst = np.concatenate([np.arange(2, 12) % 10,
                          np.arange(2, 12) % 10, [1, 7]])
    g = dgl_tpu.graph((src, dst))
    st = DL.SpotTarget(g, degree_threshold=5)
    # seed edges: hub-hub edge 20 stays, low-degree edge 21 is excluded
    excl = st(np.array([20, 21]))
    assert 21 in np.asarray(excl) and 20 not in np.asarray(excl)


def test_find_exclude_eids_modes():
    import numpy as np
    from dgl_tpu.dataloading import find_exclude_eids
    g = dgl_tpu.graph((np.array([0, 1]), np.array([1, 0])))
    assert find_exclude_eids(g, np.array([0]), None) is None
    out = find_exclude_eids(g, np.array([0]), "reverse_id",
                            reverse_eids=np.array([1, 0]))
    assert sorted(np.asarray(out)) == [0, 1]
    out = find_exclude_eids(g, np.array([0]), lambda s: s * 2)
    assert list(np.asarray(out)) == [0]


def test_distributed_splits():
    import numpy as np
    import dgl_tpu.distributed as D
    mask = np.zeros(20, bool)
    mask[2:15] = True
    assert len(np.asarray(D.node_split(mask))) == 13
    book = D.RangePartitionBook(
        0, 2, {"_N": np.array([[0, 10], [10, 20]])},
        {"_N:_E:_N": np.array([[0, 5], [5, 9]])}, ["_N"], ["_N:_E:_N"])
    out = D.node_split(mask, book, rank=0, force_even=False)
    assert np.asarray(out).max() < 10
    oute = D.edge_split(np.ones(9, bool), book, rank=1, force_even=False)
    assert np.asarray(oute).min() >= 5


def test_sample_etype_neighbors():
    import numpy as np
    from dgl_tpu.sampling import sample_etype_neighbors
    from dgl_tpu.graph.graph import EID
    rng = np.random.default_rng(0)
    g = dgl_tpu.graph((np.concatenate([rng.integers(0, 20, 40),
                                       rng.integers(0, 20, 30)]),
                       np.concatenate([rng.integers(0, 20, 40),
                                       rng.integers(0, 20, 30)])))
    sub = sample_etype_neighbors(g, np.arange(20), [0, 40],
                                 np.array([2, 1]))
    eids = np.asarray(sub.edata[EID])
    et = (eids >= 40).astype(int)
    col = np.asarray(sub.unit().coo()[1])
    for v in range(20):
        assert (et[col == v] == 0).sum() <= 2
        assert (et[col == v] == 1).sum() <= 1
