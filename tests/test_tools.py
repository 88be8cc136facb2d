"""Out-of-core partition pipeline tests (reference ``tests/tools/
test_dist_part.py``): chunk -> dispatch -> verify -> load round trip."""
import json
import os

import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu.graph.graph import NID, EID
from tools.chunk_graph import chunk_graph
from tools.dispatch_data import dispatch_data
from tools.verify_partitions import verify


@pytest.fixture
def chunked(tmp_path):
    rng = np.random.default_rng(0)
    n, e = 300, 1800
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    g.ndata["feat"] = rng.normal(size=(n, 4)).astype(np.float32)
    g.edata["w"] = rng.random(e).astype(np.float32)
    chunk_dir = str(tmp_path / "chunks")
    meta = chunk_graph(g, "cg", ["feat"], ["w"], num_chunks=4,
                       output_path=chunk_dir)
    return g, chunk_dir, meta, tmp_path


def test_chunk_layout(chunked):
    g, chunk_dir, meta, _ = chunked
    assert meta["num_chunks"] == 4
    sizes = [np.load(os.path.join(chunk_dir, "edges",
                                  f"chunk{i}.npy")).shape[1]
             for i in range(4)]
    assert sum(sizes) == g.num_edges()
    f0 = np.load(os.path.join(chunk_dir, "node_feat", "feat_chunk0.npy"))
    assert f0.shape[1] == 4


def test_dispatch_and_verify(chunked):
    g, chunk_dir, meta, tmp_path = chunked
    out = str(tmp_path / "parts")
    order, e_order = dispatch_data(chunk_dir, 3, out)
    part_config = os.path.join(out, "cg.json")
    assert verify(part_config)
    # feature round trip through the reshuffle
    from dgl_tpu.distributed import load_partition
    feats = np.asarray(g.ndata["feat"])
    ew = np.asarray(g.edata["w"])
    row, col = (np.asarray(a) for a in g.unit().coo())
    inv = np.empty(g.num_nodes(), np.int64)
    inv[np.asarray(order)] = np.arange(g.num_nodes())
    total_edges = 0
    for p in range(3):
        sg, nf, ef, book, _, _, _ = load_partition(part_config, p)
        inner = np.asarray(sg.ndata["inner_node"]).astype(bool)
        gnid = np.asarray(sg.ndata[NID])
        np.testing.assert_allclose(
            nf["feat"][: inner.sum()],
            feats[np.asarray(order)[gnid[inner]]])
        geid = np.asarray(sg.edata[EID])
        np.testing.assert_allclose(ef["w"].ravel(),
                                   ew[np.asarray(e_order)[geid]])
        # every local edge matches the original (old-eid keyed)
        lrow, lcol = (np.asarray(a) for a in sg.unit().coo())
        old_eids = np.asarray(e_order)[geid]
        np.testing.assert_array_equal(
            gnid[lrow], inv[row[old_eids]])
        total_edges += sg.num_edges()
    assert total_edges == g.num_edges()


def test_dispatch_balance(chunked):
    g, chunk_dir, meta, tmp_path = chunked
    out = str(tmp_path / "parts_bal")
    dispatch_data(chunk_dir, 4, out)
    with open(os.path.join(out, "cg.json")) as f:
        cfg = json.load(f)
    ranges = np.asarray(cfg["node_map"]["_N"])
    sizes = ranges[:, 1] - ranges[:, 0]
    assert sizes.max() <= 1.3 * g.num_nodes() / 4


def test_dispatched_serves_distributed(chunked, tmp_path):
    """The dispatched layout drops straight into DistGraphServer."""
    g, chunk_dir, meta, base = chunked
    out = str(base / "parts_srv")
    dispatch_data(chunk_dir, 2, out)
    from dgl_tpu.distributed import load_partition
    sg, nf, ef, book, name, ntypes, etypes = load_partition(
        os.path.join(out, "cg.json"), 0)
    assert name == "cg" and book.num_partitions == 2
