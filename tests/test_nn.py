"""nn-module tests: shapes, math oracles for GraphConv/GAT, hetero conv.

Mirrors reference ``tests/python/pytorch/nn/test_nn.py`` structure.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn

rng = np.random.default_rng(0)


@pytest.fixture(scope="module")
def g():
    return dgl.graph((rng.integers(0, 25, 120).astype(np.int32),
                      rng.integers(0, 25, 120).astype(np.int32)),
                     num_nodes=25)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(rng.normal(size=(25, 6)).astype(np.float32))


ALL_LAYERS = [
    ("GraphConv", lambda: dglnn.GraphConv(6, 12), (25, 12)),
    ("GraphConv-none", lambda: dglnn.GraphConv(6, 12, norm="none"), (25, 12)),
    ("SAGE-mean", lambda: dglnn.SAGEConv(6, 12, "mean"), (25, 12)),
    ("SAGE-gcn", lambda: dglnn.SAGEConv(6, 12, "gcn"), (25, 12)),
    ("SAGE-pool", lambda: dglnn.SAGEConv(6, 12, "pool"), (25, 12)),
    ("SAGE-lstm", lambda: dglnn.SAGEConv(6, 12, "lstm"), (25, 12)),
    ("GAT", lambda: dglnn.GATConv(6, 4, num_heads=2), (25, 2, 4)),
    ("GATv2", lambda: dglnn.GATv2Conv(6, 4, num_heads=2), (25, 2, 4)),
    ("DotGat", lambda: dglnn.DotGatConv(6, 4, num_heads=2), (25, 2, 4)),
    ("GIN", lambda: dglnn.GINConv(aggregator_type="sum"), (25, 6)),
    ("SGConv", lambda: dglnn.SGConv(6, 12, k=2), (25, 12)),
    ("TAG", lambda: dglnn.TAGConv(6, 12), (25, 12)),
    ("Cheb", lambda: dglnn.ChebConv(6, 12, 3), (25, 12)),
    ("Edge", lambda: dglnn.EdgeConv(6, 12), (25, 12)),
    ("APPNP", lambda: dglnn.APPNPConv(3, 0.1), (25, 6)),
    ("AGNN", lambda: dglnn.AGNNConv(), (25, 6)),
    ("PNA", lambda: dglnn.PNAConv(6, 12), (25, 12)),
]


@pytest.mark.parametrize("name,make,shape", ALL_LAYERS,
                         ids=[t[0] for t in ALL_LAYERS])
def test_layer_shapes(g, x, name, make, shape):
    m = make()
    p = m.init(jax.random.PRNGKey(0), g, x)
    out = m.apply(p, g, x)
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()


def test_graphconv_math(g, x):
    """GraphConv with norm='both' against a dense oracle."""
    m = dglnn.GraphConv(6, 12, norm="both", bias=False)
    p = m.init(jax.random.PRNGKey(1), g, x)
    out = m.apply(p, g, x)
    W = np.asarray(p["params"]["weight"])
    row, col = (np.asarray(a) for a in g.unit().coo())
    n = g.num_nodes()
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (col, row), 1.0)
    deg_out = np.maximum(A.sum(0), 1)
    deg_in = np.maximum(A.sum(1), 1)
    ref = (deg_in ** -0.5)[:, None] * (A @ ((deg_out ** -0.5)[:, None]
                                            * np.asarray(x))) @ W
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_gat_attention_normalized(g, x):
    m = dglnn.GATConv(6, 4, num_heads=2)
    p = m.init(jax.random.PRNGKey(0), g, x)
    out, a = m.apply(p, g, x, get_attention=True)
    a = np.asarray(a)  # (E, H, 1)
    row, col = (np.asarray(t) for t in g.unit().coo())
    sums = np.zeros((25, 2))
    np.add.at(sums, col, a[:, :, 0])
    deg = np.bincount(col, minlength=25)
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-4)


def test_layers_on_block(x):
    g = dgl.graph((rng.integers(0, 25, 80).astype(np.int32),
                   rng.integers(0, 25, 80).astype(np.int32)), num_nodes=25)
    block = dgl.to_block(g, dst_nodes=np.arange(10))
    feat = jnp.asarray(
        rng.normal(size=(block.num_src_nodes(), 6)).astype(np.float32))
    for make, shape in [
        (lambda: dglnn.GraphConv(6, 12), (10, 12)),
        (lambda: dglnn.SAGEConv(6, 12, "mean"), (10, 12)),
        (lambda: dglnn.GATConv(6, 4, num_heads=2), (10, 2, 4)),
    ]:
        m = make()
        p = m.init(jax.random.PRNGKey(0), block, feat)
        out = m.apply(p, block, feat)
        assert out.shape == shape


def test_rgcn_regularizers(g, x):
    etypes = jnp.asarray(rng.integers(0, 4, 120).astype(np.int32))
    for reg, nb in [(None, None), ("basis", 2), ("bdd", 2)]:
        m = dglnn.RelGraphConv(6, 12, num_rels=4, regularizer=reg,
                               num_bases=nb)
        p = m.init(jax.random.PRNGKey(0), g, x, etypes)
        out = m.apply(p, g, x, etypes)
        assert out.shape == (25, 12)


def test_typed_linear_matches_loop():
    tl = dglnn.TypedLinear(5, 7, 3)
    xx = jnp.asarray(rng.normal(size=(11, 5)).astype(np.float32))
    tt = jnp.asarray(rng.integers(0, 3, 11).astype(np.int32))
    p = tl.init(jax.random.PRNGKey(0), xx, tt)
    out = tl.apply(p, xx, tt)
    W = np.asarray(p["params"]["W"])
    ref = np.stack([np.asarray(xx)[i] @ W[int(tt[i])] for i in range(11)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_hetero_conv():
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        ("store", "sells", "game"): ([0], [1]),
    })
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.GraphConv(4, 8, allow_zero_in_degree=True),
        "plays": dglnn.SAGEConv(4, 8, "mean"),
        "sells": dglnn.SAGEConv(4, 8, "mean"),
    })
    inputs = {"user": jnp.ones((3, 4)), "game": jnp.ones((2, 4)),
              "store": jnp.ones((1, 4))}
    p = conv.init(jax.random.PRNGKey(0), hg, inputs)
    out = conv.apply(p, hg, inputs)
    assert out["user"].shape == (3, 8)
    assert out["game"].shape == (2, 8)


def test_pooling_oracle():
    g1 = dgl.graph(([0, 1], [1, 2]))
    g2 = dgl.graph(([0], [1]))
    bg = dgl.batch([g1, g2])
    feat = jnp.asarray(np.arange(10).reshape(5, 2).astype(np.float32))
    sp = dglnn.SumPooling()
    out = sp.apply(sp.init(jax.random.PRNGKey(0), bg, feat), bg, feat)
    np.testing.assert_allclose(np.asarray(out), [[6, 9], [14, 16]])
    mp = dglnn.MaxPooling()
    out = mp.apply(mp.init(jax.random.PRNGKey(0), bg, feat), bg, feat)
    np.testing.assert_allclose(np.asarray(out), [[4, 5], [8, 9]])


def test_jumping_knowledge():
    jk = dglnn.JumpingKnowledge(mode="cat")
    feats = [jnp.ones((5, 3)), jnp.zeros((5, 3))]
    out = jk.apply(jk.init(jax.random.PRNGKey(0), feats), feats)
    assert out.shape == (5, 6)


def test_node_embedding():
    emb = dglnn.NodeEmbedding(100, 16, "test")
    out = emb(jnp.array([0, 5, 99]))
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()
