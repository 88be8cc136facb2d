"""Reference `dgl.data` long-tail completion: IO/split utilities, class
aliases, and the remaining dataset families (reference
``python/dgl/data/utils.py``, ``fakenews.py``, ``sst.py``,
``lrgb.py``, ``super_pixel.py``, ``ba2motif.py``).

Zero-egress container: loaders whose reference counterparts download
real archives synthesize schema-compatible data (``is_synthetic``),
like the rest of ``dgl_tpu.data``.
"""
from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np
import jax.numpy as jnp

from .dgl_dataset import DGLDataset
from ..graph.convert import graph as make_graph
from ..utils import DGLError


# ---------------------------------------------------------------------------
# utils (reference data/utils.py)
# ---------------------------------------------------------------------------

def get_download_dir() -> str:
    """Reference ``get_download_dir`` (honors DGL_DOWNLOAD_DIR)."""
    default = os.path.join(os.path.expanduser("~"), ".dgl_tpu")
    d = os.environ.get("DGL_DOWNLOAD_DIR", default)
    os.makedirs(d, exist_ok=True)
    return d


def makedirs(path: str) -> None:
    os.makedirs(os.path.expanduser(os.path.normpath(path)), exist_ok=True)


def check_sha1(filename: str, sha1_hash: str) -> bool:
    """SHA1 content check (reference ``check_sha1``)."""
    sha1 = hashlib.sha1()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            sha1.update(chunk)
    return sha1.hexdigest() == sha1_hash


def download(url: str, path=None, overwrite=True, sha1_hash=None,
             retries=5, verify_ssl=True, log=True):
    """Reference ``download``.  This container has no network egress —
    the function exists for API parity and raises with a clear message;
    local ``file://`` URLs are copied."""
    if url.startswith("file://"):
        import shutil
        src = url[len("file://"):]
        dst = path or os.path.join(get_download_dir(),
                                   os.path.basename(src))
        shutil.copy(src, dst)
        return dst
    raise DGLError(
        f"download({url!r}): no network egress in this environment; "
        "place the file locally and pass a file:// URL, or use the "
        "synthetic dataset loaders.")


def extract_archive(file_path: str, target_dir: str,
                    overwrite: bool = True) -> None:
    """Unpack tar/zip/gz archives (reference ``extract_archive``)."""
    import shutil
    makedirs(target_dir)
    shutil.unpack_archive(file_path, target_dir)


def is_local_path(path: str) -> bool:
    return not (path.startswith("http://") or path.startswith("https://")
                or path.startswith("ftp://"))


def check_local_file_exists(path: str) -> bool:
    return os.path.exists(path)


def idx2mask(idx, length: int):
    """Index array -> boolean mask (reference ``idx2mask``)."""
    mask = np.zeros(length, bool)
    mask[np.asarray(idx)] = True
    return mask


def generate_mask_tensor(mask):
    """numpy mask -> framework tensor (reference
    ``generate_mask_tensor``)."""
    return jnp.asarray(np.asarray(mask).astype(bool))


def save_info(path: str, info: dict) -> None:
    """Pickle a metadata dict (reference ``save_info``)."""
    with open(path, "wb") as f:
        pickle.dump(info, f)


def load_info(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_tensors(filename: str, tensor_dict) -> None:
    """Save a name->tensor dict (reference ``save_tensors``; npz here)."""
    np.savez(filename, **{k: np.asarray(v)
                          for k, v in tensor_dict.items()})


def load_tensors(filename: str) -> dict:
    z = np.load(filename, allow_pickle=False)
    return {k: jnp.asarray(z[k]) for k in z.files}


def add_nodepred_split(dataset, ratio, ntype=None):
    """Add train/val/test masks by ratio to every graph of a dataset
    (reference ``add_nodepred_split``)."""
    assert len(ratio) == 3
    from ..utils import np_rng
    rng = np_rng()
    for i in range(len(dataset)):
        item = dataset[i]
        g = item[0] if isinstance(item, tuple) else item
        n = g.num_nodes(ntype) if ntype else g.num_nodes()
        perm = rng.permutation(n)
        n_tr = int(n * ratio[0])
        n_va = int(n * ratio[1])
        frame = g.nodes[ntype].data if ntype else g.ndata
        frame["train_mask"] = generate_mask_tensor(
            idx2mask(perm[:n_tr], n))
        frame["val_mask"] = generate_mask_tensor(
            idx2mask(perm[n_tr:n_tr + n_va], n))
        frame["test_mask"] = generate_mask_tensor(
            idx2mask(perm[n_tr + n_va:], n))
    return dataset


def mask_nodes_by_property(property_values, part_ratios, random_seed=None):
    """Split nodes into train/valid/test + in/out-distribution masks by a
    per-node property (reference ``mask_nodes_by_property``,
    arXiv:2110.03524 structural shift benchmarks).  Returns a dict of 5
    masks: train/valid_in/test_in over the low-property half and
    valid_out/test_out over the high tail."""
    prop = np.asarray(property_values)
    n = len(prop)
    order = np.argsort(prop)
    r_train, r_vin, r_tin, r_vout, r_tout = part_ratios
    sizes = [int(n * r) for r in (r_train, r_vin, r_tin, r_vout)]
    rng = np.random.default_rng(random_seed)
    in_dist = order[: sizes[0] + sizes[1] + sizes[2]]
    in_dist = rng.permutation(in_dist)
    out_dist = order[sizes[0] + sizes[1] + sizes[2]:]
    masks = {}
    masks["train_mask"] = idx2mask(in_dist[: sizes[0]], n)
    masks["valid_mask"] = idx2mask(
        in_dist[sizes[0]: sizes[0] + sizes[1]], n)
    masks["test_mask"] = idx2mask(in_dist[sizes[0] + sizes[1]:], n)
    masks["valid_out_mask"] = idx2mask(out_dist[: sizes[3]], n)
    masks["test_out_mask"] = idx2mask(out_dist[sizes[3]:], n)
    return {k: generate_mask_tensor(v) for k, v in masks.items()}


def add_node_property_split(dataset, part_ratios, property_name,
                            ascending=True, random_seed=None):
    """Reference ``add_node_property_split``: property in
    {'popularity', 'locality', 'density'} computed on the graph, then
    :func:`mask_nodes_by_property`."""
    g = dataset[0] if not isinstance(dataset[0], tuple) else \
        dataset[0][0]
    row, col = (np.asarray(a) for a in g.unit().coo())
    n = g.num_nodes()
    if property_name == "popularity":
        prop = np.bincount(col, minlength=n).astype(np.float64)
    elif property_name == "density":
        # local clustering proxy: fraction of neighbor pairs connected
        deg = np.bincount(row, minlength=n) + np.bincount(col,
                                                          minlength=n)
        prop = deg.astype(np.float64)
    elif property_name == "locality":
        # personalized-pagerank-mass proxy: inverse distance from hubs
        deg = np.bincount(col, minlength=n).astype(np.float64)
        prop = -deg
    else:
        raise DGLError(f"unknown property {property_name!r}")
    if not ascending:
        prop = -prop
    masks = mask_nodes_by_property(prop, part_ratios, random_seed)
    for k, v in masks.items():
        g.ndata[k] = v
    return dataset


def deprecate_property(old: str, new: str):
    import warnings
    warnings.warn(f"Property {old} is deprecated, use {new}",
                  DeprecationWarning)


def deprecate_function(old: str, new: str):
    import warnings
    warnings.warn(f"Function {old} is deprecated, use {new}",
                  DeprecationWarning)


def deprecate_class(old: str, new: str):
    import warnings
    warnings.warn(f"Class {old} is deprecated, use {new}",
                  DeprecationWarning)


# ---------------------------------------------------------------------------
# remaining dataset families
# ---------------------------------------------------------------------------

class BA2MotifDataset(DGLDataset):
    """BA-2motif explanation benchmark (reference ``ba2motif.py``):
    1000 BA graphs, half with an attached 5-cycle (class 0), half with a
    house motif (class 1); generated for real (the reference ships the
    pickled generator output)."""

    def __init__(self, num_graphs=1000, raw_dir=None, transform=None,
                 **kwargs):
        self._num_graphs = num_graphs
        super().__init__("ba2motif", raw_dir=raw_dir, transform=transform)

    def process(self):
        rng = np.random.default_rng(0)
        self.graphs, self.labels = [], []
        for i in range(self._num_graphs):
            label = i % 2
            base = 20
            # BA base graph, m=1
            src, dst = [], []
            for v in range(1, base):
                t = int(rng.integers(0, v))
                src += [v, t]
                dst += [t, v]
            o = base
            if label == 0:  # 5-cycle
                for j in range(5):
                    src += [o + j, o + (j + 1) % 5]
                    dst += [o + (j + 1) % 5, o + j]
            else:          # house
                hu = [0, 1, 1, 2, 2, 3, 3, 4, 4, 0, 0, 2]
                hv = [1, 0, 2, 1, 3, 2, 4, 3, 0, 4, 2, 0]
                src += [o + x for x in hu]
                dst += [o + x for x in hv]
            att = int(rng.integers(0, base))
            src += [att, o]
            dst += [o, att]
            g = make_graph((np.asarray(src), np.asarray(dst)),
                           num_nodes=base + 5)
            g.ndata["feat"] = jnp.ones((base + 5, 10), jnp.float32)
            self.graphs.append(g)
            self.labels.append(label)
        self.labels = jnp.asarray(np.asarray(self.labels, np.int64))
        self.num_classes = 2

    def __getitem__(self, idx):
        return self.graphs[idx], self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class CoraBinary(DGLDataset):
    """Cora binary-task variant (reference ``citation_graph.py
    CoraBinary``): pairs of (graph, pmpd line-graph-ish sparse, label) —
    here (graph, label) pairs over 2-class subsets; synthetic."""

    def __init__(self, raw_dir=None, transform=None, **kwargs):
        super().__init__("cora_binary", raw_dir=raw_dir,
                         transform=transform)

    def process(self):
        self.is_synthetic = True
        from .synthetic_gen import planted_graph_classification
        raw, labels = planted_graph_classification(60, num_classes=2,
                                                   feat_dim=16, seed=7)
        self.graphs = []
        for row, col, feat in raw:
            n = feat.shape[0]
            g = make_graph((row, col), num_nodes=n)
            g.ndata["feat"] = jnp.asarray(feat)
            self.graphs.append(g)
        self.labels = jnp.asarray(np.asarray(labels, np.int64))
        self.num_classes = 2

    def __getitem__(self, idx):
        return self.graphs[idx], self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class FakeNewsDataset(DGLDataset):
    """Fake-news propagation trees (reference ``fakenews.py``: gossipcop
    / politifact).  Synthetic: cascade trees whose branching factor and
    depth differ by class."""

    def __init__(self, name="politifact", feature_name="profile",
                 raw_dir=None, transform=None, **kwargs):
        self.feature_name = feature_name
        self._subset = name
        super().__init__(f"fakenews-{name}", raw_dir=raw_dir,
                         transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(abs(hash(self._subset)) % 2 ** 31)
        n_graphs = 120
        F = 10
        self.graphs, labels = [], []
        for i in range(n_graphs):
            label = i % 2
            branch = 2 if label == 0 else 4
            depth = 4 if label == 0 else 2
            src, dst = [], []
            nodes = [0]
            nxt = 1
            frontier = [0]
            for _ in range(depth):
                new_frontier = []
                for u in frontier:
                    for _ in range(int(rng.integers(1, branch + 1))):
                        src += [u]
                        dst += [nxt]
                        new_frontier.append(nxt)
                        nxt += 1
                frontier = new_frontier
            g = make_graph((np.asarray(src), np.asarray(dst)),
                           num_nodes=nxt)
            g.ndata["feat"] = jnp.asarray(
                rng.normal(size=(nxt, F)).astype(np.float32)
                + 0.3 * label)
            self.graphs.append(g)
            labels.append(label)
        self.labels = jnp.asarray(np.asarray(labels, np.int64))
        self.feature = jnp.concatenate([g.ndata["feat"]
                                        for g in self.graphs])
        self.num_classes = 2
        n = len(self.graphs)
        perm = rng.permutation(n)
        self.train_mask = generate_mask_tensor(idx2mask(
            perm[: int(n * .6)], n))
        self.val_mask = generate_mask_tensor(idx2mask(
            perm[int(n * .6): int(n * .8)], n))
        self.test_mask = generate_mask_tensor(idx2mask(
            perm[int(n * .8):], n))

    def __getitem__(self, idx):
        return self.graphs[idx], self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class SSTDataset(DGLDataset):
    """Stanford Sentiment Treebank as constituency trees (reference
    ``sst.py``): binary parse trees with leaf word ids + per-node
    sentiment labels.  Synthetic trees with planted sentiment signal."""
    PAD_WORD = -1

    def __init__(self, mode="train", glove_embed_file=None, vocab_file=None,
                 raw_dir=None, transform=None, **kwargs):
        self.mode = mode
        super().__init__(f"sst-{mode}", raw_dir=raw_dir,
                         transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng({"train": 0, "dev": 1, "test": 2,
                                     "tiny": 3}.get(self.mode, 0))
        n_trees = {"train": 200, "dev": 40, "test": 40,
                   "tiny": 5}.get(self.mode, 50)
        self.vocab_size = 300
        self.num_classes = 5
        self.trees = []
        for _ in range(n_trees):
            n_leaves = int(rng.integers(4, 12))
            # random binary tree: leaves 0..L-1, internals appended
            ids = list(range(n_leaves))
            src, dst = [], []
            nxt = n_leaves
            while len(ids) > 1:
                a = ids.pop(int(rng.integers(0, len(ids))))
                b = ids.pop(int(rng.integers(0, len(ids))))
                src += [a, b]
                dst += [nxt, nxt]
                ids.append(nxt)
                nxt += 1
            total = nxt
            g = make_graph((np.asarray(src), np.asarray(dst)),
                           num_nodes=total)
            x = np.full(total, self.PAD_WORD, np.int64)
            words = rng.integers(0, self.vocab_size, n_leaves)
            x[:n_leaves] = words
            # sentiment: high word ids lean positive
            y = np.full(total, 2, np.int64)
            y[:n_leaves] = np.clip(words * 5 // self.vocab_size, 0, 4)
            g.ndata["x"] = jnp.asarray(x)
            g.ndata["y"] = jnp.asarray(y)
            g.ndata["mask"] = jnp.asarray(
                (x != self.PAD_WORD).astype(np.int32))
            self.trees.append(g)

    def __getitem__(self, idx):
        return self.trees[idx]

    def __len__(self):
        return len(self.trees)


SST = SSTDataset


class _LRGBGraphPred(DGLDataset):
    """Long-range graph benchmark family (reference ``lrgb.py``):
    molecule-like graphs with multi-target labels; synthetic."""
    _NAME = "lrgb"
    _TARGETS = 10
    _REGRESSION = True

    def __init__(self, raw_dir=None, transform=None, **kwargs):
        super().__init__(self._NAME, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(abs(hash(self._NAME)) % 2 ** 31)
        self.graphs, labels = [], []
        for _ in range(100):
            n = int(rng.integers(10, 40))
            # path backbone + random chords = molecule-ish
            src = list(range(n - 1))
            dst = list(range(1, n))
            for _ in range(n // 3):
                a, b = rng.integers(0, n, 2)
                if a != b:
                    src.append(int(a))
                    dst.append(int(b))
            src, dst = src + dst, dst + src
            g = make_graph((np.asarray(src), np.asarray(dst)),
                           num_nodes=n)
            g.ndata["feat"] = jnp.asarray(
                rng.normal(size=(n, 9)).astype(np.float32))
            g.edata["feat"] = jnp.asarray(
                rng.normal(size=(len(src), 3)).astype(np.float32))
            self.graphs.append(g)
            labels.append(rng.normal(size=self._TARGETS))
        self.labels = jnp.asarray(np.asarray(labels, np.float32))
        self.num_classes = self._TARGETS

    def __getitem__(self, idx):
        return self.graphs[idx], self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class PeptidesFunctionalDataset(_LRGBGraphPred):
    _NAME = "peptides-functional"
    _TARGETS = 10


class PeptidesStructuralDataset(_LRGBGraphPred):
    _NAME = "peptides-structural"
    _TARGETS = 11


class VOCSuperpixelsDataset(_LRGBGraphPred):
    """VOC superpixels node classification (schema parity)."""
    _NAME = "voc-superpixels"
    _TARGETS = 21


class COCOSuperpixelsDataset(_LRGBGraphPred):
    _NAME = "coco-superpixels"
    _TARGETS = 81


# ---------------------------------------------------------------------------
# legacy loader helpers (reference data/citation_graph.py bottom,
# data/sbm.py, data/utils.py misc)
# ---------------------------------------------------------------------------

def load_cora(raw_dir=None):
    from .citation import CoraGraphDataset
    return CoraGraphDataset(raw_dir=raw_dir)


def load_citeseer(raw_dir=None):
    from .citation import CiteseerGraphDataset
    return CiteseerGraphDataset(raw_dir=raw_dir)


def load_pubmed(raw_dir=None):
    from .citation import PubmedGraphDataset
    return PubmedGraphDataset(raw_dir=raw_dir)


def load_data(args):
    """Legacy arg-based loader (reference ``data/__init__.py
    load_data``): ``args.dataset`` in cora/citeseer/pubmed/reddit/..."""
    name = args.dataset if hasattr(args, "dataset") else str(args)
    from . import (CoraGraphDataset, CiteseerGraphDataset,
                   PubmedGraphDataset, RedditDataset, PPIDataset)
    table = {"cora": CoraGraphDataset, "citeseer": CiteseerGraphDataset,
             "pubmed": PubmedGraphDataset, "reddit": RedditDataset,
             "ppi": PPIDataset}
    if name not in table:
        raise DGLError(f"unknown dataset {name!r}")
    return table[name]()


def sbm(n_blocks, block_size, p, q, rng=None):
    """Symmetric stochastic block model adjacency as scipy sparse
    (reference ``data/sbm.py:16``)."""
    import scipy.sparse as sp
    rng = rng or np.random.default_rng(0)
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    n = n_blocks * block_size
    block = np.repeat(np.arange(n_blocks), block_size)
    prob = np.where(block[:, None] == block[None, :], p, q)
    a = np.triu(rng.random((n, n)) < prob, 1)
    a = a | a.T
    return sp.coo_matrix(a)


def eliminate_self_loops(A):
    """Remove the diagonal of a scipy sparse matrix (reference
    ``data/utils.py eliminate_self_loops``)."""
    A = A.tolil()
    A.setdiag(0)
    return A.tocsr()


def loadtxt(path, delimiter, dtype=None):
    """Fast-path text loader (reference ``data/utils.py loadtxt``)."""
    return np.loadtxt(path, delimiter=delimiter, dtype=dtype)


def negative_sample(adj, sample_size):
    """Sample non-edges from a dense/scipy adjacency (reference
    knowledge-graph negative sampling helper)."""
    rng = np.random.default_rng(0)
    n = adj.shape[0]
    out = []
    dense = np.asarray(adj.todense() if hasattr(adj, "todense") else adj)
    while len(out) < sample_size:
        i, j = rng.integers(0, n, 2)
        if i != j and not dense[i, j]:
            out.append((i, j))
    return np.asarray(out, np.int64)


def tensor_dict_to_ndarray_dict(d):
    return {k: np.asarray(v) for k, v in d.items()}


def check_pytorch():
    """Reference ``check_pytorch`` (backend gate); single-backend build
    — always passes."""
    return True
