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


def test_dispatch_multiprocess_matches_serial(chunked, tmp_path):
    """num_workers>1 must produce byte-identical partitions."""
    import numpy as np
    from tools.dispatch_data import dispatch_data
    g, chunk_dir, meta, _ = chunked
    out1 = str(tmp_path / "serial")
    out2 = str(tmp_path / "parallel")
    o1, e1 = dispatch_data(chunk_dir, 3, out1, num_workers=1)
    o2, e2 = dispatch_data(chunk_dir, 3, out2, num_workers=3)
    assert np.array_equal(o1, o2) and np.array_equal(e1, e2)
    for p in range(3):
        z1 = np.load(f"{out1}/part{p}/graph.npz")
        z2 = np.load(f"{out2}/part{p}/graph.npz")
        for k in z1.files:
            assert np.array_equal(z1[k], z2[k]), (p, k)
        f1 = np.load(f"{out1}/part{p}/node_feats.npz")
        f2 = np.load(f"{out2}/part{p}/node_feats.npz")
        for k in f1.files:
            assert np.array_equal(f1[k], f2[k]), (p, k)


def test_chunk_ondisk_dataset_then_dispatch(tmp_path):
    """metadata.yaml (OnDiskDataset) -> chunked -> dispatch round trip."""
    import yaml
    from tools.chunk_graph import chunk_ondisk_dataset
    rng = np.random.default_rng(1)
    n, e = 200, 1200
    ds_dir = tmp_path / "ondisk"
    (ds_dir / "data").mkdir(parents=True)
    pairs = np.stack([rng.integers(0, n, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int64)
    np.save(ds_dir / "data" / "edges.npy", pairs)
    feat = rng.normal(size=(n, 8)).astype(np.float32)
    np.save(ds_dir / "data" / "feat.npy", feat)
    meta = {
        "dataset_name": "odk",
        "graph": {"nodes": [{"num": n}],
                  "edges": [{"path": "data/edges.npy"}]},
        "feature_data": [{"domain": "node", "name": "feat",
                          "path": "data/feat.npy", "in_memory": True}],
    }
    with open(ds_dir / "metadata.yaml", "w") as f:
        yaml.safe_dump(meta, f)

    chunk_dir = str(tmp_path / "chunks")
    out = chunk_ondisk_dataset(str(ds_dir), 3, chunk_dir)
    assert out["num_edges"] == e and out["node_feats"] == ["feat"]
    # chunks reassemble to the original edge list
    got = np.concatenate(
        [np.load(f"{chunk_dir}/edges/chunk{i}.npy") for i in range(3)],
        axis=1)
    assert np.array_equal(got[0], pairs[:, 0])
    assert np.array_equal(got[1], pairs[:, 1])

    out_dir = str(tmp_path / "parts")
    order, eorder = dispatch_data(chunk_dir, 2, out_dir, num_workers=2)
    # every node feature row lands intact in its partition
    for p in range(2):
        z = np.load(f"{out_dir}/part{p}/graph.npz")
        fz = np.load(f"{out_dir}/part{p}/node_feats.npz")
        assert np.allclose(fz["feat"], feat[z["orig_nid"]])
