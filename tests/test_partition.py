"""Partitioner tests (reference ``tests/python/common/test_partition.py``):
balance + cut quality of the native multilevel k-way partitioner, Libra
vertex-cut invariants, halo partitioning, and the on-disk round trip.
"""
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu.partition import (
    metis_partition_assignment,
    libra_partition,
    partition_graph_with_halo,
)
from dgl_tpu.graph.graph import NID


def _planted_graph(n=2000, k=4, seed=0):
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, k, n)
    rows, cols = [], []
    for _ in range(8):
        u = rng.integers(0, n, n)
        v = rng.integers(0, n, n)
        keep = (comm[u] == comm[v]) | (rng.random(n) < 0.02)
        rows.append(u[keep])
        cols.append(v[keep])
    row, col = np.concatenate(rows), np.concatenate(cols)
    return dgl.graph((row, col), num_nodes=n), row, col


def _cut(part, row, col):
    return int((part[row] != part[col]).sum())


def test_metis_balance_and_cut():
    g, row, col = _planted_graph()
    k = 4
    part = np.asarray(metis_partition_assignment(g, k))
    sizes = np.bincount(part, minlength=k)
    assert sizes.max() <= 1.2 * g.num_nodes() / k
    rng = np.random.default_rng(1)
    rand = rng.integers(0, k, g.num_nodes())
    # multilevel cut should beat random by a wide margin on planted graphs
    assert _cut(part, row, col) < 0.5 * _cut(rand, row, col)


def test_metis_single_part():
    g, _, _ = _planted_graph(n=100)
    part = np.asarray(metis_partition_assignment(g, 1))
    assert (part == 0).all()


def test_libra_vertex_cut():
    g, row, col = _planted_graph(n=500)
    k = 4
    epart, rep = libra_partition(g, k)
    epart = np.asarray(epart)
    assert epart.shape == (g.num_edges(),)
    assert set(np.unique(epart)) <= set(range(k))
    load = np.bincount(epart, minlength=k)
    assert load.max() <= (g.num_edges() + k - 1) // k + 1
    # replication can't exceed (k-1) * touched vertices
    assert 0 <= rep <= (k - 1) * g.num_nodes()


def test_partition_with_halo():
    g, row, col = _planted_graph(n=300)
    part = np.asarray(metis_partition_assignment(g, 2))
    parts, _, _ = partition_graph_with_halo(g, part, extra_cached_hops=1)
    covered = np.concatenate([
        np.asarray(sg.ndata[NID])[np.asarray(sg.ndata["inner_node"]) == 1]
        for sg in parts.values()])
    np.testing.assert_array_equal(np.sort(covered),
                                  np.arange(g.num_nodes()))
    # halo must contain every in-neighbor of owned nodes
    sg = parts[0]
    nids = set(np.asarray(sg.ndata[NID]).tolist())
    owned = np.nonzero(part == 0)[0]
    in_nbrs = set(row[np.isin(col, owned)].tolist())
    assert in_nbrs <= nids


def test_partition_disk_roundtrip(tmp_path):
    g, row, col = _planted_graph(n=200)
    rng = np.random.default_rng(0)
    g.ndata["feat"] = rng.normal(size=(200, 3)).astype(np.float32)
    order, e_order = dgl.distributed.partition_graph(
        g, "pg", 2, str(tmp_path), return_mapping=True)
    order, e_order = np.asarray(order), np.asarray(e_order)
    inv = np.empty(200, np.int64)
    inv[order] = np.arange(200)
    total_edges = 0
    for pid in range(2):
        sg, nf, ef, book, name, ntypes, etypes = dgl.distributed.\
            load_partition(str(tmp_path / "pg.json"), pid)
        inner = np.asarray(sg.ndata["inner_node"]).astype(bool)
        gnid = np.asarray(sg.ndata[NID])
        # features of owned nodes round-trip through reshuffle
        np.testing.assert_allclose(
            nf["feat"][: inner.sum()],
            np.asarray(g.ndata["feat"])[order[gnid[inner]]])
        total_edges += sg.num_edges()
    assert total_edges == g.num_edges()


def test_partition_hetero_disk_roundtrip(tmp_path):
    """Heterograph partition_graph: flatten through to_homogeneous with
    per-(partition, type) contiguous id ranges and <type>/<field> feats
    (reference distributed/partition.py:807)."""
    rng = np.random.default_rng(3)
    nu, ni = 60, 40
    e1 = (rng.integers(0, nu, 300), rng.integers(0, ni, 300))
    e2 = (rng.integers(0, ni, 200), rng.integers(0, nu, 200))
    g = dgl.heterograph({
        ("user", "clicks", "item"): e1,
        ("item", "viewed-by", "user"): e2,
    })
    g.nodes["user"].data["f"] = rng.normal(size=(nu, 4)).astype(np.float32)
    g.nodes["item"].data["f"] = rng.normal(size=(ni, 2)).astype(np.float32)
    g.edges["clicks"].data["w"] = rng.normal(size=(300,)).astype(np.float32)

    dgl.distributed.partition_graph(g, "hp", 2, str(tmp_path))

    import json
    with open(tmp_path / "hp.json") as f:
        meta = json.load(f)
    assert set(meta["node_map"]) == {"user", "item"}
    assert set(meta["edge_map"]) == {"user:clicks:item",
                                     "item:viewed-by:user"}
    # per-type ranges tile the global id space without overlap
    allr = sorted([tuple(r) for rs in meta["node_map"].values()
                   for r in rs])
    prev_end = 0
    covered = 0
    for b, e in allr:
        assert b >= prev_end or e == b
        covered += e - b
        prev_end = max(prev_end, e)
    assert covered == nu + ni

    total_edges = 0
    user_feat_rows = 0
    for pid in range(2):
        sg, nf, ef, book, name, ntypes, etypes = dgl.distributed.\
            load_partition(str(tmp_path / "hp.json"), pid)
        assert set(ntypes) == {"user", "item"}
        from dgl_tpu.graph.graph import NTYPE
        nt = np.asarray(sg.ndata[NTYPE])
        inner = np.asarray(sg.ndata["inner_node"]).astype(bool)
        ptid = np.asarray(sg.ndata["per_type_id"])
        # per-type features round-trip (order within a partition is the
        # per-type-sorted local order)
        uid = meta["ntypes"]["user"]
        urows = ptid[(nt == uid)]
        np.testing.assert_allclose(
            nf["user/f"], np.asarray(g.nodes["user"].data["f"])[urows])
        user_feat_rows += int((nt[inner] == uid).sum())
        total_edges += sg.num_edges()
        assert "user:clicks:item/w" in ef
    assert total_edges == 500
    assert user_feat_rows == nu
