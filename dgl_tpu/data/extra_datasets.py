"""Long-tail dataset loaders (reference ``python/dgl/data/`` — the
remaining ~30 of the 42 loaders).

Zero-egress container: loaders whose reference counterparts *download*
real files here produce deterministic synthetic graphs with the same
schema, statistics knobs (size/classes/homophily), and split convention
(``ds.is_synthetic == True``).  Datasets that the reference itself
*generates* (MiniGC, SBM, BAShape/TreeCycle motif sets, CLUSTER/PATTERN)
are generated for real, matching the reference's construction:
``minigc.py``, ``sbm.py``, ``synthetic.py``, ``cluster.py``.
"""
from __future__ import annotations

import numpy as np

from .dgl_dataset import DGLDataset
from .synthetic_gen import (
    planted_citation_graph,
    planted_graph_classification,
    planted_knowledge_graph,
)
from .misc_datasets import FB15k237Dataset, _EntityDataset
from ..graph.convert import graph as make_graph, heterograph as make_hetero


# ---------------------------------------------------------------------------
# node-classification single-graph loaders (citation-style schema)

class _NodeClsDataset(DGLDataset):
    """Shared schema: one graph with feat/label/train/val/test masks."""

    _N = 3000
    _C = 7
    _D = 64
    _HOMOPHILY = 0.85

    def __init__(self, raw_dir=None, transform=None, **kwargs):
        super().__init__(self._NAME, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        seed = abs(hash(self._NAME)) % 2 ** 31
        src, dst, feat, label, tr, va, te = planted_citation_graph(
            self._N, self._C, self._D, homophily=self._HOMOPHILY,
            seed=seed)
        g = make_graph((src, dst), num_nodes=self._N)
        g.ndata["feat"] = feat
        g.ndata["label"] = label
        g.ndata["train_mask"] = tr
        g.ndata["val_mask"] = va
        g.ndata["test_mask"] = te
        self._graph = g
        self.num_classes = self._C

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class CoraFullDataset(_NodeClsDataset):
    """Reference ``gnn_benchmark.py CoraFullDataset`` (70 classes)."""
    _NAME, _N, _C, _D = "cora_full", 4000, 70, 128


class AmazonCoBuyComputerDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "amazon_co_buy_computer", 3000, 10, 96


class AmazonCoBuyPhotoDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "amazon_co_buy_photo", 2500, 8, 96


class CoauthorCSDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "coauthor_cs", 3500, 15, 128


class CoauthorPhysicsDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "coauthor_physics", 4000, 5, 128


class WikiCSDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "wiki_cs", 3000, 10, 64


class FlickrDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "flickr", 4000, 7, 64


class YelpDataset(_NodeClsDataset):
    _NAME, _N, _C, _D = "yelp", 4000, 10, 64


# heterophilous sets (reference geom_gcn.py / actor.py /
# heterophilous_graphs.py): low-homophily planted graphs
class _HeterophilousDataset(_NodeClsDataset):
    _HOMOPHILY = 0.2


class ActorDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "actor", 2500, 5, 64


class SquirrelDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "squirrel", 2500, 5, 64


class ChameleonDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "chameleon", 1500, 5, 64


class CornellDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "cornell", 183, 5, 32


class TexasDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "texas", 183, 5, 32


class WisconsinDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "wisconsin", 251, 5, 32


class RomanEmpireDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "roman_empire", 3000, 18, 64


class AmazonRatingsDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "amazon_ratings", 3000, 5, 64


class MinesweeperDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "minesweeper", 2500, 2, 16


class TolokersDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "tolokers", 2500, 2, 16


class QuestionsDataset(_HeterophilousDataset):
    _NAME, _N, _C, _D = "questions", 3000, 2, 32


# ---------------------------------------------------------------------------
# truly-generated sets (the reference generates these too)

class MiniGCDataset(DGLDataset):
    """8-class mini graph classification (reference ``minigc.py``):
    cycle/star/wheel/lollipop/hypercube/grid/clique/circular-ladder."""

    def __init__(self, num_graphs=80, min_num_v=10, max_num_v=20, seed=0,
                 transform=None):
        self.num_graphs = num_graphs
        self.min_num_v = min_num_v
        self.max_num_v = max_num_v
        self._seed = seed
        super().__init__("minigc", transform=transform)

    @staticmethod
    def _gen(kind: int, n: int, rng):
        if kind == 0:    # cycle
            src = np.arange(n)
            dst = (src + 1) % n
        elif kind == 1:  # star
            src = np.arange(1, n)
            dst = np.zeros(n - 1, np.int64)
        elif kind == 2:  # wheel = cycle + hub
            c = np.arange(1, n)
            src = np.concatenate([c, (c % (n - 1)) + 1, np.zeros(n - 1,
                                                                 np.int64)])
            dst = np.concatenate([(c % (n - 1)) + 1, c, c])
        elif kind == 3:  # lollipop: clique k + path
            k = max(3, n // 2)
            cu, cv = np.triu_indices(k, 1)
            path = np.arange(k - 1, n - 1)
            src = np.concatenate([cu, cv, path])
            dst = np.concatenate([cv, cu, path + 1])
        elif kind == 4:  # hypercube (round n to power of 2)
            d = max(2, int(np.log2(max(n, 4))))
            m = 2 ** d
            nodes = np.arange(m)
            src = np.repeat(nodes, d)
            dst = src ^ (1 << np.tile(np.arange(d), m))
        elif kind == 5:  # grid
            r = max(2, int(np.sqrt(n)))
            ids = np.arange(r * r).reshape(r, r)
            h = np.stack([ids[:, :-1].ravel(), ids[:, 1:].ravel()])
            v = np.stack([ids[:-1].ravel(), ids[1:].ravel()])
            src = np.concatenate([h[0], v[0]])
            dst = np.concatenate([h[1], v[1]])
        elif kind == 6:  # clique
            src, dst = np.triu_indices(n, 1)
        else:            # circular ladder
            half = max(3, n // 2)
            c = np.arange(half)
            src = np.concatenate([c, c + half, c])
            dst = np.concatenate([(c + 1) % half,
                                  (c + 1) % half + half, c + half])
        u = np.concatenate([src, dst]).astype(np.int64)
        v = np.concatenate([dst, src]).astype(np.int64)
        nn_ = int(max(u.max(), v.max())) + 1
        return make_graph((u, v), num_nodes=nn_)

    def process(self):
        rng = np.random.default_rng(self._seed)
        self.graphs, self.labels = [], []
        for i in range(self.num_graphs):
            kind = i % 8
            n = int(rng.integers(self.min_num_v, self.max_num_v))
            g = self._gen(kind, n, rng)
            g.ndata["feat"] = np.ones((g.num_nodes(), 1), np.float32)
            self.graphs.append(g)
            self.labels.append(kind)
        self.labels = np.asarray(self.labels, np.int64)
        self.num_classes = 8

    def __getitem__(self, idx):
        return self._g(self.graphs[idx]), self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class SBMMixtureDataset(DGLDataset):
    """Graphs drawn from stochastic block models (reference ``sbm.py``)."""

    def __init__(self, n_graphs=16, n_nodes=100, n_communities=2,
                 p=0.3, q=0.05, seed=0, transform=None):
        self.n_graphs = n_graphs
        self.n_nodes = n_nodes
        self.n_communities = n_communities
        self.p, self.q = p, q
        self._seed = seed
        super().__init__("sbm_mixture", transform=transform)

    def process(self):
        rng = np.random.default_rng(self._seed)
        self.graphs, self.line_graphs, self.labels = [], [], []
        k = self.n_communities
        for _ in range(self.n_graphs):
            comm = rng.integers(0, k, self.n_nodes)
            prob = np.where(comm[:, None] == comm[None, :], self.p, self.q)
            a = rng.random((self.n_nodes, self.n_nodes)) < prob
            a = np.triu(a, 1)
            u, v = np.nonzero(a | a.T)
            g = make_graph((u, v), num_nodes=self.n_nodes)
            self.graphs.append(g)
            self.labels.append(comm.astype(np.int64))

    def __getitem__(self, idx):
        return self._g(self.graphs[idx]), self.labels[idx]

    def __len__(self):
        return len(self.graphs)


class _MotifDataset(DGLDataset):
    """Base-graph + planted motifs with ground-truth node roles
    (reference ``synthetic.py``: BAShapeDataset etc., used by explainer
    benchmarks)."""

    _MOTIF_SIZE = 5

    def __init__(self, num_base=300, num_motifs=60, seed=0, transform=None):
        self.num_base = num_base
        self.num_motifs = num_motifs
        self._seed = seed
        super().__init__(self._NAME, transform=transform)

    def _base_edges(self, rng):
        # Barabasi-Albert preferential attachment, m=2
        n = self.num_base
        src, dst = [0, 1], [1, 0]
        deg = np.zeros(n, np.int64)
        deg[:2] = 1
        for v in range(2, n):
            probs = deg[:v] / deg[:v].sum()
            targets = rng.choice(v, size=min(2, v), replace=False, p=probs)
            for t in targets:
                src += [v, int(t)]
                dst += [int(t), v]
                deg[v] += 1
                deg[t] += 1
        return src, dst, deg

    def _motif(self, offset):
        raise NotImplementedError

    def process(self):
        rng = np.random.default_rng(self._seed)
        src, dst, _ = self._base_edges(rng)
        labels = [0] * self.num_base
        nid = self.num_base
        for _ in range(self.num_motifs):
            mu, mv, roles = self._motif(nid)
            src += mu
            dst += mv
            labels += roles
            # attach motif to a random base node
            a = int(rng.integers(0, self.num_base))
            src += [a, nid]
            dst += [nid, a]
            nid += self._MOTIF_SIZE
        g = make_graph((np.asarray(src), np.asarray(dst)), num_nodes=nid)
        labels = np.asarray(labels, np.int64)
        g.ndata["label"] = labels
        g.ndata["feat"] = np.ones((nid, 10), np.float32)
        tr = np.zeros(nid, bool)
        tr[rng.permutation(nid)[: int(0.8 * nid)]] = True
        g.ndata["train_mask"] = tr
        g.ndata["test_mask"] = ~tr
        self._graph = g
        self.num_classes = int(labels.max()) + 1

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class BAShapeDataset(_MotifDataset):
    """BA base + house motifs (roles: top/middle/bottom)."""
    _NAME = "ba_shape"

    def _motif(self, o):
        # house: 0-1 roof, 2-3 middle, 4 bottom... canonical 5-node house
        u = [o, o + 1, o + 1, o + 2, o + 2, o + 3, o + 3, o + 4, o + 4, o]
        v = [o + 1, o, o + 2, o + 1, o + 3, o + 2, o + 4, o + 3, o, o + 4]
        u2 = [o, o + 2]
        v2 = [o + 2, o]
        return u + u2, v + v2, [1, 1, 2, 2, 3]


class BACommunityDataset(BAShapeDataset):
    """Two BA+house communities (8 roles, reference synthetic.py)."""
    _NAME = "ba_community"

    def process(self):
        super().process()
        g = self._graph
        n = g.num_nodes()
        rng = np.random.default_rng(self._seed + 1)
        labels = np.asarray(g.ndata["label"])
        # second community: shift labels by 4
        half = n // 2
        comm = (np.arange(n) >= half).astype(np.int64)
        g.ndata["label"] = labels + 4 * comm
        feat = np.asarray(g.ndata["feat"])
        g.ndata["feat"] = (feat + comm[:, None]).astype(np.float32)
        self.num_classes = int(np.asarray(g.ndata["label"]).max()) + 1


class TreeCycleDataset(_MotifDataset):
    """Balanced-tree base + 6-cycles (reference synthetic.py)."""
    _NAME = "tree_cycle"
    _MOTIF_SIZE = 6

    def _base_edges(self, rng):
        n = self.num_base
        src, dst = [], []
        for v in range(1, n):
            p = (v - 1) // 2
            src += [v, p]
            dst += [p, v]
        return src, dst, None

    def _motif(self, o):
        u = [o + i for i in range(6)]
        v = [o + (i + 1) % 6 for i in range(6)]
        return u + v, v + u, [1] * 6


class TreeGridDataset(_MotifDataset):
    """Balanced-tree base + 3x3 grids (reference synthetic.py)."""
    _NAME = "tree_grid"
    _MOTIF_SIZE = 9

    def _base_edges(self, rng):
        n = self.num_base
        src, dst = [], []
        for v in range(1, n):
            p = (v - 1) // 2
            src += [v, p]
            dst += [p, v]
        return src, dst, None

    def _motif(self, o):
        ids = np.arange(9).reshape(3, 3) + o
        h = np.stack([ids[:, :-1].ravel(), ids[:, 1:].ravel()])
        ve = np.stack([ids[:-1].ravel(), ids[1:].ravel()])
        u = np.concatenate([h[0], ve[0]])
        v = np.concatenate([h[1], ve[1]])
        return (list(u) + list(v), list(v) + list(u), [1] * 9)


class CLUSTERDataset(DGLDataset):
    """Semi-supervised SBM clustering graphs (reference ``cluster.py``)."""

    def __init__(self, mode="train", num_graphs=30, n=80, k=6, seed=0,
                 transform=None):
        self.mode = mode
        self.num_graphs = num_graphs
        self._n, self._k = n, k
        self._seed = seed + {"train": 0, "valid": 1, "test": 2}[mode]
        super().__init__(f"cluster_{mode}", transform=transform)

    def process(self):
        rng = np.random.default_rng(self._seed)
        self.graphs = []
        for _ in range(self.num_graphs):
            comm = rng.integers(0, self._k, self._n)
            prob = np.where(comm[:, None] == comm[None, :], 0.4, 0.08)
            a = np.triu(rng.random((self._n, self._n)) < prob, 1)
            u, v = np.nonzero(a | a.T)
            g = make_graph((u, v), num_nodes=self._n)
            # one revealed node per community (the semi-supervision)
            feat = np.zeros((self._n, self._k + 1), np.float32)
            for c in range(self._k):
                pool = np.nonzero(comm == c)[0]
                if len(pool):
                    feat[rng.choice(pool), c + 1] = 1.0
            feat[:, 0] = 1.0
            g.ndata["feat"] = feat
            g.ndata["label"] = comm.astype(np.int64)
            self.graphs.append(g)
        self.num_classes = self._k

    def __getitem__(self, idx):
        return self._g(self.graphs[idx])

    def __len__(self):
        return len(self.graphs)


class PATTERNDataset(CLUSTERDataset):
    """Subgraph-pattern detection on SBM (reference ``cluster.py``):
    binary node labels = belongs-to-planted-pattern."""

    def __init__(self, mode="train", num_graphs=30, n=80, seed=100,
                 transform=None):
        super().__init__(mode=mode, num_graphs=num_graphs, n=n, k=2,
                         seed=seed, transform=transform)
        self.num_classes = 2


# ---------------------------------------------------------------------------
# molecular regression (QM7b/QM9/ZINC): synthetic molecules

class _MoleculeDataset(DGLDataset):
    _NUM = 200
    _TARGETS = 1

    def __init__(self, raw_dir=None, transform=None, **kwargs):
        super().__init__(self._NAME, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(abs(hash(self._NAME)) % 2 ** 31)
        self.graphs, ys = [], []
        for _ in range(self._NUM):
            n = int(rng.integers(6, 24))
            pos = rng.normal(0, 1.5, (n, 3))
            d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
            u, v = np.nonzero((d < 1.6) & (d > 0))
            if len(u) == 0:
                u, v = np.array([0, 1]), np.array([1, 0])
            g = make_graph((u, v), num_nodes=n)
            z = rng.integers(1, 9, n)
            g.ndata["attr"] = np.eye(9, dtype=np.float32)[z]
            g.ndata["pos"] = pos.astype(np.float32)
            g.edata["edge_attr"] = d[u, v].astype(np.float32)[:, None]
            self.graphs.append(g)
            # target correlated with size + mean distance (learnable)
            ys.append([n * 0.1 + d[u, v].mean()] * self._TARGETS)
        self.label = np.asarray(ys, np.float32)

    def __getitem__(self, idx):
        return self._g(self.graphs[idx]), self.label[idx]

    def __len__(self):
        return len(self.graphs)


class QM7bDataset(_MoleculeDataset):
    _NAME, _TARGETS = "qm7b", 14


class QM9Dataset(_MoleculeDataset):
    _NAME, _TARGETS = "qm9", 12

    def __init__(self, label_keys=None, raw_dir=None, transform=None):
        self.label_keys = label_keys
        super().__init__(raw_dir=raw_dir, transform=transform)


class QM9EdgeDataset(QM9Dataset):
    _NAME = "qm9_edge"


class ZINCDataset(_MoleculeDataset):
    _NAME, _TARGETS = "zinc", 1


# superpixel graph classification (reference superpixel.py)
class MNISTSuperPixelDataset(DGLDataset):
    _NAME = "mnist_superpixel"

    def __init__(self, raw_dir=None, transform=None, num_graphs=150):
        self._num = num_graphs
        super().__init__(self._NAME, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        graphs, labels = planted_graph_classification(
            self._num, num_classes=10, feat_dim=3,
            seed=abs(hash(self._NAME)) % 2 ** 31)
        self.graphs = []
        for row, col, feat in graphs:
            n = feat.shape[0]
            g = make_graph((row, col), num_nodes=n)
            g.ndata["feat"] = feat
            self.graphs.append(g)
        self.label = labels
        self.num_classes = 10

    def __getitem__(self, idx):
        return self._g(self.graphs[idx]), self.label[idx]

    def __len__(self):
        return len(self.graphs)


class CIFAR10SuperPixelDataset(MNISTSuperPixelDataset):
    _NAME = "cifar10_superpixel"


# ---------------------------------------------------------------------------
# fraud / signed / temporal / bipartite

class FraudDataset(DGLDataset):
    """Multi-relation fraud graphs yelp/amazon (reference ``fraud.py``):
    hetero graph, one node type, R relations, binary labels."""

    _RELS = {"yelp": ["net_rsr", "net_rtr", "net_rur"],
             "amazon": ["net_upu", "net_usu", "net_uvu"]}

    def __init__(self, name, raw_dir=None, transform=None,
                 train_size=0.7, val_size=0.1):
        self._train_size = train_size
        self._val_size = val_size
        super().__init__(f"fraud_{name}", raw_dir=raw_dir,
                         transform=transform)

    def process(self):
        self.is_synthetic = True
        base = self.name.split("_", 1)[1]
        rels = self._RELS.get(base, ["rel0", "rel1", "rel2"])
        rng = np.random.default_rng(abs(hash(self.name)) % 2 ** 31)
        n = 2000
        label = (rng.random(n) < 0.15).astype(np.int64)
        data = {}
        for i, r in enumerate(rels):
            e = 6000
            u = rng.integers(0, n, e)
            # fraudsters connect to fraudsters slightly more
            vpool = np.where(rng.random(e) < 0.3 + 0.3 * label[u],
                             1, 0)
            frauds = np.nonzero(label)[0]
            normals = np.nonzero(1 - label)[0]
            v = np.where(vpool, frauds[rng.integers(0, len(frauds), e)],
                         normals[rng.integers(0, len(normals), e)])
            data[("user", r, "user")] = (u, v)
        g = make_hetero(data, num_nodes_dict={"user": n})
        g.nodes["user"].data["label"] = label
        g.nodes["user"].data["feature"] = rng.normal(
            label[:, None] * 0.5, 1.0, (n, 32)).astype(np.float32)
        idx = rng.permutation(n)
        ntr = int(self._train_size * n)
        nva = int(self._val_size * n)
        tr = np.zeros(n, bool); tr[idx[:ntr]] = True
        va = np.zeros(n, bool); va[idx[ntr:ntr + nva]] = True
        te = np.zeros(n, bool); te[idx[ntr + nva:]] = True
        g.nodes["user"].data["train_mask"] = tr
        g.nodes["user"].data["val_mask"] = va
        g.nodes["user"].data["test_mask"] = te
        self._graph = g
        self.num_classes = 2

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class FraudYelpDataset(FraudDataset):
    def __init__(self, **kw):
        super().__init__("yelp", **kw)


class FraudAmazonDataset(FraudDataset):
    def __init__(self, **kw):
        super().__init__("amazon", **kw)


class BitcoinOTCDataset(DGLDataset):
    """Sequence of signed who-trusts-whom graphs (reference
    ``bitcoinotc.py``)."""

    def __init__(self, raw_dir=None, transform=None, num_steps=10):
        self._steps = num_steps
        super().__init__("bitcoinotc", raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(7)
        n = 500
        self.graphs = []
        for t in range(self._steps):
            e = 1500 + 100 * t
            u = rng.integers(0, n, e)
            v = rng.integers(0, n, e)
            g = make_graph((u, v), num_nodes=n)
            g.edata["h"] = rng.choice(
                [-10, -5, -1, 1, 5, 10], e).astype(np.float32)[:, None]
            self.graphs.append(g)

    def __getitem__(self, idx):
        return self._g(self.graphs[idx])

    def __len__(self):
        return len(self.graphs)

    @property
    def is_temporal(self):
        return True


class _TemporalKGDataset(DGLDataset):
    """Temporal knowledge graphs GDELT / ICEWS18 (reference ``gdelt.py``,
    ``icews18.py``): homogeneous graph with per-edge (rel, time)."""

    def __init__(self, mode="train", raw_dir=None, transform=None):
        self.mode = mode
        super().__init__(f"{self._NAME}_{mode}", raw_dir=raw_dir,
                         transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(abs(hash(self._NAME)) % 2 ** 31)
        n, r, e = 1000, 20, 12000
        src, rel, dst, _ = planted_knowledge_graph(n, r, e, seed=3)
        t = np.sort(rng.integers(0, 300, e)).astype(np.int64)
        lo, hi = {"train": (0, 0.8), "valid": (0.8, 0.9),
                  "test": (0.9, 1.0)}[self.mode]
        sel = slice(int(lo * e), int(hi * e))
        g = make_graph((src[sel], dst[sel]), num_nodes=n)
        g.edata["rel_type"] = rel[sel].astype(np.int64)
        g.edata["timestamp"] = t[sel]
        self._graph = g
        self.num_rels = r

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


class GDELTDataset(_TemporalKGDataset):
    _NAME = "gdelt"


class ICEWS18Dataset(_TemporalKGDataset):
    _NAME = "icews18"


class MovieLensDataset(DGLDataset):
    """Bipartite user-movie rating graph (reference ``movielens.py``)."""

    def __init__(self, name="ml-100k", raw_dir=None, transform=None,
                 valid_ratio=0.1, test_ratio=0.1):
        self._valid_ratio = valid_ratio
        self._test_ratio = test_ratio
        super().__init__(name, raw_dir=raw_dir, transform=transform)

    def process(self):
        self.is_synthetic = True
        rng = np.random.default_rng(42)
        nu, nm, e = 500, 800, 8000
        # low-rank preference structure so ratings are learnable
        pu = rng.normal(0, 1, (nu, 8))
        pm = rng.normal(0, 1, (nm, 8))
        u = rng.integers(0, nu, e)
        m = rng.integers(0, nm, e)
        score = (pu[u] * pm[m]).sum(-1)
        rating = np.clip(np.round(3 + score), 1, 5).astype(np.int64)
        g = make_hetero({
            ("user", "user-movie", "movie"): (u, m),
            ("movie", "movie-user", "user"): (m, u),
        }, num_nodes_dict={"user": nu, "movie": nm})
        g.nodes["user"].data["feat"] = pu.astype(np.float32)
        g.nodes["movie"].data["feat"] = pm.astype(np.float32)
        g.edges["user-movie"].data["rate"] = rating
        g.edges["movie-user"].data["rate"] = rating
        idx = rng.permutation(e)
        nte = int(self._test_ratio * e)
        nva = int(self._valid_ratio * e)
        mask = np.zeros(e, np.int64)      # 0 train / 1 valid / 2 test
        mask[idx[:nte]] = 2
        mask[idx[nte:nte + nva]] = 1
        g.edges["user-movie"].data["split"] = mask
        self._graph = g

    def __getitem__(self, idx):
        assert idx == 0
        return self._g(self._graph)

    def __len__(self):
        return 1


# ---------------------------------------------------------------------------
# remaining RDF entity + knowledge-graph names

class BGSDataset(_EntityDataset):
    def __init__(self, **kw):
        super().__init__("bgs", **kw)


class AMDataset(_EntityDataset):
    def __init__(self, **kw):
        super().__init__("am", **kw)


class WN18Dataset(FB15k237Dataset):
    def __init__(self, raw_dir=None, reverse=True, transform=None):
        self._reverse = reverse
        DGLDataset.__init__(self, "wn18", raw_dir=raw_dir,
                            transform=transform)


class FB15kDataset(FB15k237Dataset):
    def __init__(self, raw_dir=None, reverse=True, transform=None):
        self._reverse = reverse
        DGLDataset.__init__(self, "FB15k", raw_dir=raw_dir,
                            transform=transform)
