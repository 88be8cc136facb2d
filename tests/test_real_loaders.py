"""Real-file ingestion (VERDICT r1 item 3): write tiny on-disk fixtures in
the ACTUAL public formats, load through the dataset classes, and check
``is_synthetic`` flips off.  Reference formats:
``python/dgl/data/citation_graph.py:120-186`` (planetoid pickles),
``python/dgl/data/reddit.py:108-126`` (npz pair)."""
import os
import pickle

import numpy as np
import pytest

import dgl_tpu as dgl


def _write_planetoid(tmp, name="cora", n_train=8, n_test=6, n_other=10,
                     d=12, c=3, seed=0):
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(seed)
    n = n_train + n_other + n_test
    x = sp.csr_matrix(rng.random((n_train, d)).astype(np.float32))
    allx = sp.csr_matrix(rng.random((n_train + n_other, d))
                         .astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, d)).astype(np.float32))

    def onehot(k):
        lab = rng.integers(0, c, k)
        o = np.zeros((k, c), np.int64)
        o[np.arange(k), lab] = 1
        return o
    y = onehot(n_train)
    ally = onehot(n_train + n_other)
    ty = onehot(n_test)
    graph = {i: [int(j) for j in rng.choice(n, 3, replace=False)
                 if j != i] for i in range(n)}
    test_idx = np.arange(n_train + n_other, n)
    perm = rng.permutation(len(test_idx))
    raw = os.path.join(tmp, name)
    os.makedirs(raw, exist_ok=True)
    for obj, nm in ((x, "x"), (y, "y"), (tx, "tx"), (ty, "ty"),
                    (allx, "allx"), (ally, "ally"), (graph, "graph")):
        with open(os.path.join(raw, f"ind.{name}.{nm}"), "wb") as f:
            pickle.dump(obj, f, protocol=2)
    with open(os.path.join(raw, f"ind.{name}.test.index"), "w") as f:
        for i in test_idx[perm]:
            f.write(f"{i}\n")
    return n, d, c, n_train, n_test


def test_planetoid_real_files_load(tmp_path):
    tmp = str(tmp_path)
    n, d, c, n_train, n_test = _write_planetoid(tmp)
    ds = dgl.data.CoraGraphDataset(raw_dir=tmp)
    assert not getattr(ds, "is_synthetic", False)
    g = ds[0]
    assert g.num_nodes() == n
    assert g.ndata["feat"].shape == (n, d)
    assert ds.num_classes == c
    assert int(np.asarray(g.ndata["train_mask"]).sum()) == n_train
    assert int(np.asarray(g.ndata["test_mask"]).sum()) == n_test
    # row-normalized features
    rs = np.asarray(g.ndata["feat"]).sum(1)
    np.testing.assert_allclose(rs[rs > 0], 1.0, rtol=1e-4)
    # graph is symmetric (reverse_edge=True default)
    row, col = (np.asarray(a) for a in g.unit().coo())
    es = set(zip(row.tolist(), col.tolist()))
    assert all((b, a) in es for a, b in es)


def test_reddit_real_files_load(tmp_path):
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(1)
    tmp = str(tmp_path)
    raw = os.path.join(tmp, "reddit")
    os.makedirs(raw, exist_ok=True)
    n, e, d = 60, 400, 16
    adj = sp.coo_matrix(
        (np.ones(e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n))
    sp.save_npz(os.path.join(raw, "reddit_graph.npz"), adj.tocsr())
    types = rng.choice([1, 2, 3], n)
    np.savez(os.path.join(raw, "reddit_data.npz"),
             feature=rng.random((n, d)).astype(np.float32),
             label=rng.integers(0, 41, n),
             node_types=types)
    ds = dgl.data.RedditDataset(raw_dir=tmp)
    assert not getattr(ds, "is_synthetic", False)
    g = ds[0]
    assert g.num_nodes() == n
    assert g.ndata["feat"].shape == (n, d)
    assert int(np.asarray(g.ndata["train_mask"]).sum()) == (types == 1).sum()


def test_ogb_layout_load(tmp_path):
    from dgl_tpu.data.real_loaders import load_ogb_nodeprop, ogb_files_exist
    import gzip
    rng = np.random.default_rng(2)
    root = str(tmp_path)
    d = os.path.join(root, "ogbn_tiny")
    os.makedirs(os.path.join(d, "raw"), exist_ok=True)
    os.makedirs(os.path.join(d, "split", "sales"), exist_ok=True)
    n, e, f = 30, 100, 8
    edges = rng.integers(0, n, (e, 2))
    with gzip.open(os.path.join(d, "raw", "edge.csv.gz"), "wt") as fh:
        np.savetxt(fh, edges, fmt="%d", delimiter=",")
    with gzip.open(os.path.join(d, "raw", "node-feat.csv.gz"), "wt") as fh:
        np.savetxt(fh, rng.random((n, f)), delimiter=",")
    with gzip.open(os.path.join(d, "raw", "node-label.csv.gz"),
                   "wt") as fh:
        np.savetxt(fh, rng.integers(0, 4, (n, 1)), fmt="%d", delimiter=",")
    with gzip.open(os.path.join(d, "split", "sales", "train.csv.gz"),
                   "wt") as fh:
        np.savetxt(fh, np.arange(20)[:, None], fmt="%d", delimiter=",")
    assert ogb_files_exist(root, "ogbn-tiny")
    src, dst, feat, labels, splits = load_ogb_nodeprop(root, "ogbn-tiny")
    assert len(src) == e and feat.shape == (n, f) and len(labels) == n
    assert len(splits["train"]) == 20
