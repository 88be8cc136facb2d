"""Schema tests for the long-tail dataset loaders (reference
``tests/python/common/test_data.py`` strategy: load, check graph schema,
masks, classes)."""
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import data as D


NODE_CLS = [
    D.CoraFullDataset, D.AmazonCoBuyComputerDataset,
    D.AmazonCoBuyPhotoDataset, D.CoauthorCSDataset, D.WikiCSDataset,
    D.FlickrDataset, D.ActorDataset, D.SquirrelDataset,
    D.ChameleonDataset, D.CornellDataset, D.TexasDataset,
    D.WisconsinDataset, D.RomanEmpireDataset, D.MinesweeperDataset,
]


@pytest.mark.parametrize("cls", NODE_CLS)
def test_node_cls_schema(cls):
    ds = cls()
    g = ds[0]
    assert len(ds) == 1
    n = g.num_nodes()
    for k in ("feat", "label", "train_mask", "val_mask", "test_mask"):
        assert k in g.ndata, f"{cls.__name__} missing {k}"
        assert np.asarray(g.ndata[k]).shape[0] == n
    lab = np.asarray(g.ndata["label"])
    assert lab.max() < ds.num_classes
    tr = np.asarray(g.ndata["train_mask"])
    te = np.asarray(g.ndata["test_mask"])
    assert tr.sum() > 0 and te.sum() > 0
    assert not (tr & te).any()


def test_minigc():
    ds = D.MiniGCDataset(num_graphs=16)
    assert len(ds) == 16 and ds.num_classes == 8
    g, y = ds[3]
    assert y == 3
    assert g.num_nodes() > 0 and g.num_edges() > 0


def test_sbm_mixture():
    ds = D.SBMMixtureDataset(n_graphs=4, n_nodes=60, n_communities=3)
    g, comm = ds[0]
    assert g.num_nodes() == 60 and comm.shape == (60,)
    # within-community density exceeds across-community
    row, col = (np.asarray(x) for x in g.unit().coo())
    same = (comm[row] == comm[col]).mean()
    assert same > 0.5


@pytest.mark.parametrize("cls", [D.BAShapeDataset, D.BACommunityDataset,
                                 D.TreeCycleDataset, D.TreeGridDataset])
def test_motif_datasets(cls):
    ds = cls(num_base=100, num_motifs=20)
    g = ds[0]
    lab = np.asarray(g.ndata["label"])
    assert (lab == 0).sum() > 0 and (lab > 0).sum() > 0
    assert ds.num_classes == lab.max() + 1


def test_cluster_pattern():
    tr = D.CLUSTERDataset("train", num_graphs=3)
    g = tr[0]
    assert "feat" in g.ndata and "label" in g.ndata
    assert np.asarray(g.ndata["label"]).max() < tr.num_classes
    pa = D.PATTERNDataset("test", num_graphs=2)
    assert pa.num_classes == 2


@pytest.mark.parametrize("cls,targets", [(D.QM7bDataset, 14),
                                         (D.QM9Dataset, 12),
                                         (D.ZINCDataset, 1)])
def test_molecules(cls, targets):
    ds = cls()
    g, y = ds[0]
    assert y.shape == (targets,)
    assert "pos" in g.ndata and "attr" in g.ndata
    assert g.edata["edge_attr"].shape[0] == g.num_edges()


def test_fraud():
    ds = D.FraudYelpDataset()
    g = ds[0]
    assert set(g.etypes) == {"net_rsr", "net_rtr", "net_rur"}
    lab = np.asarray(g.nodes["user"].data["label"])
    assert set(np.unique(lab)) <= {0, 1}


def test_bitcoin_otc():
    ds = D.BitcoinOTCDataset(num_steps=4)
    assert len(ds) == 4
    g = ds[2]
    assert "h" in g.edata


def test_temporal_kg():
    tr = D.ICEWS18Dataset("train")
    te = D.ICEWS18Dataset("test")
    gt, ge = tr[0], te[0]
    t1 = np.asarray(gt.edata["timestamp"])
    t2 = np.asarray(ge.edata["timestamp"])
    assert t1.max() <= t2.min()  # temporal split ordering
    assert "rel_type" in gt.edata


def test_movielens():
    ds = D.MovieLensDataset()
    g = ds[0]
    assert g.num_nodes("user") == 500 and g.num_nodes("movie") == 800
    r = np.asarray(g.edges["user-movie"].data["rate"])
    assert r.min() >= 1 and r.max() <= 5


def test_kg_variants():
    for cls in (D.WN18Dataset, D.FB15kDataset):
        ds = cls()
        g = ds[0]
        assert "etype" in g.edata and ds.num_rels > 0
    for cls in (D.BGSDataset, D.AMDataset):
        ds = cls()
        g = ds[0]
        assert ds.predict_category in g.ntypes


def test_save_load_roundtrip(tmp_path):
    ds = D.MiniGCDataset(num_graphs=4)
    graphs = [ds[i][0] for i in range(4)]
    labels = {"glabel": np.asarray([ds[i][1] for i in range(4)])}
    path = str(tmp_path / "graphs.bin")
    D.save_graphs(path, graphs, labels)
    out, lab = D.load_graphs(path)
    assert len(out) == 4
    np.testing.assert_array_equal(lab["glabel"], labels["glabel"])
    for a, b in zip(graphs, out):
        assert a.num_nodes() == b.num_nodes()
        assert a.num_edges() == b.num_edges()


def test_compat_datasets():
    import numpy as np
    from dgl_tpu import data as D
    ds = D.BA2MotifDataset(num_graphs=10)
    g, y = ds[3]
    assert g.num_nodes() == 25 and int(y) in (0, 1)
    fn = D.FakeNewsDataset("gossipcop")
    assert len(fn) == 120 and fn.feature.shape[1] == 10
    sst = D.SSTDataset(mode="tiny")
    t = sst[0]
    leaves = int(np.asarray(t.ndata["mask"]).sum())
    assert t.num_nodes() == 2 * leaves - 1  # binary tree
    for cls in (D.PeptidesFunctionalDataset, D.PeptidesStructuralDataset,
                D.VOCSuperpixelsDataset, D.COCOSuperpixelsDataset):
        ds = cls()
        g, y = ds[0]
        assert y.shape[0] == ds.num_classes
    assert D.CoraFull is D.CoraFullDataset
    assert issubclass(D.RDFGraphDataset, D.DGLDataset)


def test_compat_utils(tmp_path):
    import numpy as np
    from dgl_tpu import data as D
    p = tmp_path / "x.npy"
    np.save(p, np.arange(5))
    import hashlib
    h = hashlib.sha1(open(p, "rb").read()).hexdigest()
    assert D.check_sha1(str(p), h)
    info = {"a": 1}
    D.save_info(str(tmp_path / "i.pkl"), info)
    assert D.load_info(str(tmp_path / "i.pkl")) == info
    D.save_tensors(str(tmp_path / "t.npz"), {"x": np.arange(3)})
    out = D.load_tensors(str(tmp_path / "t.npz"))
    assert list(np.asarray(out["x"])) == [0, 1, 2]
    import pytest as _pytest
    from dgl_tpu.utils import DGLError
    with _pytest.raises(DGLError):
        D.download("https://example.com/x.bin")


def test_add_splits():
    import numpy as np
    from dgl_tpu import data as D
    ds = D.BA2MotifDataset(num_graphs=4)
    D.add_nodepred_split(ds, [0.6, 0.2, 0.2])
    g, _ = ds[0]
    tm = np.asarray(g.ndata["train_mask"])
    assert tm.sum() > 0 and tm.dtype == bool
