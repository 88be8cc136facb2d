"""Shape/gradient/semantics tests for the long-tail conv layers
(reference ``tests/python/common/test_nn.py`` strategy: random graph,
init, forward, check shapes + finite grads; semantic oracles where cheap).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from conftest import random_graph


@pytest.fixture
def g():
    g, _, _ = random_graph(40, 220, seed=1)
    return dgl.add_self_loop(g)


def _init_apply(mod, *args, method=None):
    params = mod.init(jax.random.PRNGKey(0), *args)
    out = mod.apply(params, *args)
    return params, out


def test_gcn2conv(g):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(40, 8)),
                    jnp.float32)
    mod = dglnn.GCN2Conv(8, layer=2, alpha=0.2, lambda_=1.0)
    params, out = _init_apply(mod, g, x, x)
    assert out.shape == (40, 8)
    # alpha=1 and identity weight mixing keeps scale finite
    assert jnp.isfinite(out).all()
    grads = jax.grad(lambda p: (mod.apply(p, g, x, x) ** 2).sum())(params)
    assert all(jnp.isfinite(v).all() for v in
               jax.tree_util.tree_leaves(grads))


def test_gmmconv(g):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(40, 6)),
                    jnp.float32)
    pseudo = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.num_edges(), 2)), jnp.float32)
    mod = dglnn.GMMConv(6, 5, dim=2, n_kernels=3)
    _, out = _init_apply(mod, g, x, pseudo)
    assert out.shape == (40, 5)
    assert jnp.isfinite(out).all()


def test_edgegatconv(g):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(40, 6)),
                    jnp.float32)
    ef = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.num_edges(), 3)), jnp.float32)
    mod = dglnn.EdgeGATConv(6, 3, 5, num_heads=2)
    _, out = _init_apply(mod, g, x, ef)
    assert out.shape == (40, 2, 5)


def test_egnn_equivariance(g):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(40, 6)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    mod = dglnn.EGNNConv(6, 16, 6)
    params = mod.init(jax.random.PRNGKey(0), g, h, x)
    h1, x1 = mod.apply(params, g, h, x)
    assert h1.shape == (40, 6) and x1.shape == (40, 3)
    # E(n) equivariance: translate coords -> h invariant, x translated
    shift = jnp.asarray([1.0, -2.0, 0.5])
    h2, x2 = mod.apply(params, g, h, x + shift)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1 + shift),
                               atol=1e-4)


def test_gatedgcnconv(g):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(40, 7)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(g.num_edges(), 7)), jnp.float32)
    mod = dglnn.GatedGCNConv(7, 7, 7)
    params = mod.init(jax.random.PRNGKey(0), g, h, e)
    h1, e1 = mod.apply(params, g, h, e)
    assert h1.shape == (40, 7) and e1.shape == (g.num_edges(), 7)


def test_hgtconv(g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(40, 8)), jnp.float32)
    ntype = jnp.asarray(rng.integers(0, 2, 40), jnp.int32)
    etype = jnp.asarray(rng.integers(0, 3, g.num_edges()), jnp.int32)
    mod = dglnn.HGTConv(8, 4, 2, num_ntypes=2, num_etypes=3, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), g, x, ntype, etype)
    out = mod.apply(params, g, x, ntype, etype)
    assert out.shape == (40, 8)
    assert jnp.isfinite(out).all()


def test_dgnconv(g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(40, 6)), jnp.float32)
    eig = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)
    mod = dglnn.DGNConv(6, 5, aggregators=("mean", "dir1-av", "dir1-dx"),
                        scalers=("identity", "amplification"))
    params = mod.init(jax.random.PRNGKey(0), g, x, None, eig)
    out = mod.apply(params, g, x, None, eig)
    assert out.shape == (40, 5)
    assert jnp.isfinite(out).all()


def test_twirlsconv(g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(40, 6)), jnp.float32)
    for attention, precond in [(False, True), (True, True), (False, False)]:
        mod = dglnn.TWIRLSConv(6, 4, 16, prop_step=4, attention=attention,
                               precond=precond)
        params = mod.init(jax.random.PRNGKey(0), g, x)
        out = mod.apply(params, g, x)
        assert out.shape == (40, 4)
        assert jnp.isfinite(out).all()


def test_atomicconv(g):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.integers(1, 4, (40, 1)), jnp.float32)
    dist = jnp.asarray(rng.random(g.num_edges()) * 3, jnp.float32)
    mod = dglnn.AtomicConv(
        interaction_cutoffs=jnp.full((2,), 2.5),
        rbf_kernel_means=jnp.asarray([0.5, 1.5]),
        rbf_kernel_scaling=jnp.asarray([1.0, 1.0]),
        features_to_use=jnp.asarray([1.0, 2.0, 3.0]))
    params = mod.init(jax.random.PRNGKey(0), g, feat, dist)
    out = mod.apply(params, g, feat, dist)
    assert out.shape == (40, 6)  # T=3 * K=2


def test_grouprevres(g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(40, 16)), jnp.float32)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, g, h):
            return dglnn.GraphConv(8, 8)(g, h)

    mod = dglnn.GroupRevRes(Block(), groups=2)
    params = mod.init(jax.random.PRNGKey(0), g, x)
    out = mod.apply(params, g, x)
    assert out.shape == (40, 16)


def test_dense_convs():
    rng = np.random.default_rng(0)
    n = 30
    adj = (rng.random((n, n)) < 0.2).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    adj_j = jnp.asarray(adj)
    for mod, shape in [
        (dglnn.DenseGraphConv(6, 4), (n, 4)),
        (dglnn.DenseSAGEConv(6, 4), (n, 4)),
        (dglnn.DenseChebConv(6, 4, k=3), (n, 4)),
    ]:
        params = mod.init(jax.random.PRNGKey(0), adj_j, x)
        out = mod.apply(params, adj_j, x)
        assert out.shape == shape
        assert jnp.isfinite(out).all()


def test_dense_graphconv_matches_sparse():
    """DenseGraphConv == GraphConv on the same graph (shared weights)."""
    rng = np.random.default_rng(0)
    n = 25
    adj = (rng.random((n, n)) < 0.3).astype(np.float32)
    np.fill_diagonal(adj, 1.0)
    dst, src = np.nonzero(adj)      # adj[v,u]=1 edge u->v
    g = dgl.graph((src, dst), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    dense = dglnn.DenseGraphConv(6, 4, bias=False)
    sparse = dglnn.GraphConv(6, 4, bias=False)
    pd = dense.init(jax.random.PRNGKey(1), jnp.asarray(adj), x)
    out_d = dense.apply(pd, jnp.asarray(adj), x)
    ps = {"params": {"weight": pd["params"]["weight"]}}
    out_s = sparse.apply(ps, g, x)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=1e-4)


def test_hetero_linear_embedding():
    feat = {"user": jnp.ones((4, 3)), "item": jnp.ones((5, 2))}
    mod = dglnn.HeteroLinear({"user": 3, "item": 2}, 6)
    params = mod.init(jax.random.PRNGKey(0), feat)
    out = mod.apply(params, feat)
    assert out["user"].shape == (4, 6) and out["item"].shape == (5, 6)
    ids = {"user": jnp.asarray([0, 1]), "item": jnp.asarray([2])}
    emb = dglnn.HeteroEmbedding({"user": 10, "item": 7}, 5)
    p2 = emb.init(jax.random.PRNGKey(0), ids)
    out2 = emb.apply(p2, ids)
    assert out2["user"].shape == (2, 5) and out2["item"].shape == (1, 5)


def test_set_transformer_decoder():
    gs = [random_graph(8, 20, seed=i)[0] for i in range(3)]
    bg = dgl.batch(gs)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(bg.num_nodes(), 16)), jnp.float32)
    mod = dglnn.SetTransformerDecoder(16, 4, 4, 32, n_layers=1, k=2)
    params = mod.init(jax.random.PRNGKey(0), bg, x)
    out = mod.apply(params, bg, x)
    assert out.shape == (3, 32)


def test_deepwalk_loss_decreases():
    g, _, _ = random_graph(30, 200, seed=0)
    from dgl_tpu.sampling import random_walk
    import optax
    walks, _ = random_walk(g, np.tile(np.arange(30), 4), length=9)
    walks = jnp.asarray(np.asarray(walks))
    mod = dglnn.DeepWalk(30, emb_dim=16, walk_length=10, window_size=2,
                         negative_size=2)
    params = mod.init(jax.random.PRNGKey(0), walks, jax.random.PRNGKey(1))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        l, gr = jax.value_and_grad(
            lambda p: mod.apply(p, walks, key))(params)
        up, opt = tx.update(gr, opt)
        return optax.apply_updates(params, up), opt, l

    losses = []
    for i in range(30):
        params, opt, l = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0]
    emb = mod.apply(params, method=mod.embed)
    assert emb.shape == (30, 16)
