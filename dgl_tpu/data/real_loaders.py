"""Real on-disk dataset ingestion (VERDICT r1 item 3).

The container has no egress, so datasets cannot be downloaded here — but
these loaders read the ACTUAL public file formats, so a network-enabled
environment (or files copied in) validates the BASELINE.md goldens
immediately:

* Planetoid pickles (``ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index}``)
  — the Cora/Citeseer/Pubmed format; behavior matched to reference
  ``python/dgl/data/citation_graph.py:120-186`` (citeseer isolated-node
  fix, test-index reorder, row-normalized features, train/val/test masks).
* Reddit npz pair (``reddit_graph.npz`` scipy-sparse adjacency +
  ``reddit_data.npz`` features/labels/types) — reference
  ``python/dgl/data/reddit.py:108-126``.
* OGB node-property layout (``<root>/<name>/raw/*.csv.gz`` +
  ``split/<split>/``) and its preprocessed npz shortcut.
"""
from __future__ import annotations

import gzip
import os
import pickle

import numpy as np


def _pickle_load(f):
    return pickle.load(f, encoding="latin1")


def planetoid_files_exist(raw_path: str, name: str) -> bool:
    return all(os.path.exists(os.path.join(raw_path, f"ind.{name}.{o}"))
               for o in ("x", "y", "tx", "ty", "allx", "ally", "graph")) \
        and os.path.exists(os.path.join(raw_path,
                                        f"ind.{name}.test.index"))


def load_planetoid(raw_path: str, name: str, reverse_edge: bool = True):
    """Load the planetoid pickle family.  Returns
    (src, dst, feat, labels, train_mask, val_mask, test_mask, n_classes).
    """
    import scipy.sparse as sp

    objs = []
    for o in ("x", "y", "tx", "ty", "allx", "ally", "graph"):
        with open(os.path.join(raw_path, f"ind.{name}.{o}"), "rb") as f:
            objs.append(_pickle_load(f))
    x, y, tx, ty, allx, ally, graph = objs
    with open(os.path.join(raw_path, f"ind.{name}.test.index")) as f:
        test_idx_reorder = np.array([int(line.strip()) for line in f
                                     if line.strip()], np.int64)
    test_idx_range = np.sort(test_idx_reorder)

    if name == "citeseer":
        # isolated test nodes: extend tx/ty with zero rows at the gaps
        full = np.arange(test_idx_reorder.min(), test_idx_reorder.max() + 1)
        tx_ext = sp.lil_matrix((len(full), x.shape[1]))
        tx_ext[test_idx_range - test_idx_range.min(), :] = tx
        tx = tx_ext
        ty_ext = np.zeros((len(full), y.shape[1]))
        ty_ext[test_idx_range - test_idx_range.min(), :] = ty
        ty = ty_ext

    features = sp.vstack((allx, tx)).tolil()
    features[test_idx_reorder, :] = features[test_idx_range, :]
    feat = np.asarray(features.todense(), np.float32)
    # row-normalize (reference _preprocess_features)
    rs = feat.sum(1, keepdims=True)
    feat = feat / np.maximum(rs, 1e-12)

    onehot = np.vstack((ally, ty))
    onehot[test_idx_reorder, :] = onehot[test_idx_range, :]
    labels = np.argmax(onehot, 1).astype(np.int64)

    n = labels.shape[0]
    # edges from the dict-of-lists; both directions, deduped (matches the
    # reference's nx.DiGraph(from_dict_of_lists) construction)
    us, vs = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            us.append(u)
            vs.append(v)
    src = np.asarray(us, np.int64)
    dst = np.asarray(vs, np.int64)
    both = np.concatenate([src * n + dst, dst * n + src])
    both = np.unique(both)
    src, dst = both // n, both % n
    if not reverse_edge:
        keep = src <= dst
        src, dst = src[keep], dst[keep]

    train_mask = np.zeros(n, bool)
    train_mask[: y.shape[0]] = True
    val_mask = np.zeros(n, bool)
    val_mask[y.shape[0]: y.shape[0] + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_idx_range] = True
    return (src, dst, feat, labels, train_mask, val_mask, test_mask,
            onehot.shape[1])


def reddit_files_exist(raw_path: str, self_loop: bool = False) -> bool:
    s = "_self_loop" if self_loop else ""
    return (os.path.exists(os.path.join(raw_path,
                                        f"reddit{s}_graph.npz")) and
            os.path.exists(os.path.join(raw_path, "reddit_data.npz")))


def load_reddit(raw_path: str, self_loop: bool = False):
    """Returns (src, dst, feat, labels, train_mask, val_mask, test_mask)."""
    import scipy.sparse as sp

    s = "_self_loop" if self_loop else ""
    coo = sp.load_npz(os.path.join(raw_path,
                                   f"reddit{s}_graph.npz")).tocoo()
    data = np.load(os.path.join(raw_path, "reddit_data.npz"))
    feat = data["feature"].astype(np.float32)
    labels = data["label"].astype(np.int64)
    types = data["node_types"]
    return (coo.row.astype(np.int64), coo.col.astype(np.int64), feat,
            labels, types == 1, types == 2, types == 3)


# ---------------------------------------------------------------------------
# OGB node-property layout


def _read_csv_gz(path, dtype):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def ogb_files_exist(root: str, name: str) -> bool:
    d = os.path.join(root, name.replace("-", "_"))
    raw = os.path.join(d, "raw")
    return (os.path.exists(os.path.join(raw, "edge.csv.gz")) or
            os.path.exists(os.path.join(raw, "edge.csv")) or
            os.path.exists(os.path.join(d, "processed.npz")))


def load_ogb_nodeprop(root: str, name: str):
    """Load an OGB node-prediction dataset from its on-disk layout.

    Accepts either the raw csv.gz layout (``raw/edge.csv.gz``,
    ``raw/node-feat.csv.gz``, ``raw/node-label.csv.gz``, and
    ``split/*/{train,valid,test}.csv.gz``) or a ``processed.npz`` with
    keys src/dst/feat/label/train_idx/valid_idx/test_idx.

    Returns (src, dst, feat, labels, splits: dict of index arrays).
    """
    d = os.path.join(root, name.replace("-", "_"))
    npz = os.path.join(d, "processed.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        return (z["src"], z["dst"], z["feat"], z["label"],
                {"train": z["train_idx"], "valid": z["valid_idx"],
                 "test": z["test_idx"]})
    raw = os.path.join(d, "raw")

    def pick(fn):
        p = os.path.join(raw, fn + ".gz")
        return p if os.path.exists(p) else os.path.join(raw, fn)

    edges = _read_csv_gz(pick("edge.csv"), np.int64)
    feat = _read_csv_gz(pick("node-feat.csv"), np.float32)
    labels = _read_csv_gz(pick("node-label.csv"), np.int64).reshape(-1)
    split_root = os.path.join(d, "split")
    splits = {}
    if os.path.isdir(split_root):
        sub = sorted(os.listdir(split_root))
        if sub:
            sdir = os.path.join(split_root, sub[0])
            for part, fn in (("train", "train.csv"),
                             ("valid", "valid.csv"),
                             ("test", "test.csv")):
                p = os.path.join(sdir, fn + ".gz")
                if not os.path.exists(p):
                    p = os.path.join(sdir, fn)
                if os.path.exists(p):
                    splits[part] = _read_csv_gz(p, np.int64).reshape(-1)
    return edges[:, 0], edges[:, 1], feat, labels, splits
