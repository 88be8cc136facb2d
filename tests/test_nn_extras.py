"""Tests: link predictors, graph-transformer stack, explainers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn

rng = np.random.default_rng(0)


def test_transe_transr():
    h = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    r = jnp.asarray(rng.integers(0, 4, 6))
    te = dglnn.TransE(4, 8)
    p = te.init(jax.random.PRNGKey(0), h, t, r)
    s = te.apply(p, h, t, r)
    assert s.shape == (6,)
    assert (np.asarray(s) <= 0).all()
    tr = dglnn.TransR(4, 5, 8)
    p = tr.init(jax.random.PRNGKey(0), h, t, r)
    assert tr.apply(p, h, t, r).shape == (6,)


def test_edge_predictor_ops():
    h1 = jnp.ones((3, 4))
    h2 = jnp.ones((3, 4)) * 2
    for op, shape in [("dot", (3, 1)), ("cos", (3, 1)), ("ele", (3, 4)),
                      ("cat", (3, 8))]:
        ep = dglnn.EdgePredictor(op)
        p = ep.init(jax.random.PRNGKey(0), h1, h2)
        assert ep.apply(p, h1, h2).shape == shape
    # dot oracle
    ep = dglnn.EdgePredictor("dot")
    p = ep.init(jax.random.PRNGKey(0), h1, h2)
    np.testing.assert_allclose(np.asarray(ep.apply(p, h1, h2)).ravel(), 8.0)


def test_graphormer_stack():
    B, N, D, H = 2, 12, 16, 4
    nfeat = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(B, N, N, H)).astype(np.float32))
    layer = dglnn.GraphormerLayer(D, 32, H)
    p = layer.init(jax.random.PRNGKey(0), nfeat, bias)
    out = layer.apply(p, nfeat, bias)
    assert out.shape == (B, N, D)
    assert np.isfinite(np.asarray(out)).all()
    # attention mask respected: masking everything but self
    mask = jnp.eye(N, dtype=bool)[None].repeat(B, 0)
    out_masked = layer.apply(p, nfeat, bias, mask)
    assert np.isfinite(np.asarray(out_masked)).all()


def test_biased_mha_softmax():
    B, N, D, H = 1, 6, 8, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    mha = dglnn.BiasedMHA(D, H)
    p = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(p, x)
    assert out.shape == (B, N, D)


def test_egt_layer():
    B, N, D, De, H = 2, 8, 16, 6, 4
    nfeat = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    efeat = jnp.asarray(rng.normal(size=(B, N, N, De)).astype(np.float32))
    layer = dglnn.EGTLayer(D, De, H)
    p = layer.init(jax.random.PRNGKey(0), nfeat, efeat)
    nf, ef = layer.apply(p, nfeat, efeat)
    assert nf.shape == (B, N, D)
    assert ef.shape == (B, N, N, De)


def test_spatial_and_degree_encoders():
    g = dgl.rand_graph(20, 80, seed=0)
    de = dglnn.DegreeEncoder(8, 16)
    p = de.init(jax.random.PRNGKey(0), g)
    assert de.apply(p, g).shape == (20, 16)
    dist = jnp.asarray(rng.integers(-1, 6, (2, 10, 10)))
    se = dglnn.SpatialEncoder(5, 4)
    p = se.init(jax.random.PRNGKey(0), dist)
    out = se.apply(p, dist)
    assert out.shape == (2, 10, 10, 4)
    # the one-hot MXU formulation must equal a direct table lookup
    # (incl. the -1 "unreachable" bucket), values and gradients
    tbl = p["params"]["emb"]["embedding"]
    clipped = np.clip(np.asarray(dist), -1, 5) + 1
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(tbl)[clipped], atol=1e-6)
    g_onehot = jax.grad(lambda p: (se.apply(p, dist) ** 2).sum())(p)
    counts = np.bincount(clipped.ravel(), minlength=7)
    expect = 2 * np.asarray(tbl) * counts[:, None]
    np.testing.assert_allclose(
        np.asarray(g_onehot["params"]["emb"]["embedding"]), expect,
        rtol=1e-5)


def test_lap_pos_encoder():
    g = dgl.rand_graph(20, 100, seed=0)
    pe = dgl.laplacian_pe(g, 4)
    enc = dglnn.LapPosEncoder(k=4, dim=8)
    p = enc.init(jax.random.PRNGKey(0), pe)
    assert enc.apply(p, pe).shape == (20, 8)


def test_gnn_explainer_finds_planted_edge():
    """The explainer should rank the informative edges higher."""
    # star graph: node 0's prediction is driven only by edge from node 1
    g = dgl.graph(([1, 2, 3], [0, 0, 0]))
    x = jnp.asarray(np.eye(4, dtype=np.float32))
    W = jnp.asarray(np.zeros((4, 2), np.float32))
    W = W.at[1, 1].set(5.0)  # only node1's feature matters

    def model_fn(gg, xx, ew):
        unit = gg.unit() if hasattr(gg, "unit") else gg
        return dgl.ops.gspmm(unit, "mul", "sum", xx, ew.reshape(-1, 1)) @ W

    ex = dglnn.GNNExplainer(model_fn, num_hops=1, num_epochs=120, lr=0.05)
    center, sg, fm, em = ex.explain_node(0, g, x)
    em = np.asarray(em)
    srow = np.asarray(sg.unit().coo()[0])
    snid = np.asarray(sg.ndata[dgl.NID])
    informative = em[snid[srow] == 1]
    others = em[snid[srow] != 1]
    assert informative.mean() > others.mean()


def test_pgexplainer():
    g = dgl.rand_graph(15, 60, seed=2)
    emb = jnp.asarray(rng.normal(size=(15, 8)).astype(np.float32))
    pg = dglnn.PGExplainer(hidden=16)
    p = pg.init(jax.random.PRNGKey(0), g, emb)
    probs = pg.apply(p, g, emb)
    assert probs.shape == (60,)
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()


def test_subgraphx():
    """SubgraphX finds the informative clique in a planted two-component
    graph (motif-recovery oracle, mirrors the reference's usage)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn

    # graph = 5-clique (informative) bridged to a 10-node path (noise)
    cu, cv = np.triu_indices(5, 1)
    pu = np.arange(5, 14)
    u = np.concatenate([cu, cv, pu, pu + 1, [4], [5]])
    v = np.concatenate([cv, cu, pu + 1, pu, [5], [4]])
    g = dgl.graph((u, v), num_nodes=15)
    feat = jnp.ones((15, 4), jnp.float32)

    def model_fn(graph, x):
        # "classifier": class-1 logit = mean feature mass inside the clique
        score = x[:5].sum()
        return jnp.stack([10.0 - score, score])

    ex = dglnn.SubgraphX(model_fn, num_rollouts=10, shapley_steps=8,
                         node_min=3, high2low=False)
    nodes = ex.explain_graph(g, feat, target_class=1, node_max=6)
    # explanation should be dominated by clique nodes
    assert (np.asarray(nodes) < 5).mean() >= 0.5


def test_hetero_gnn_explainer():
    import numpy as np
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.ops import gspmm

    hg = dgl.heterograph({
        ("a", "ab", "b"): (np.array([0, 1, 2]), np.array([0, 0, 1])),
    }, num_nodes_dict={"a": 3, "b": 2})
    feat = {"a": jnp.ones((3, 4)), "b": jnp.ones((2, 4))}

    def model_fn(graph, x, emask):
        unit = graph.unit(("a", "ab", "b"))
        w = emask[("a", "ab", "b")][:, None] if emask is not None else None
        h = gspmm(unit, "mul" if w is not None else "copy_lhs", "sum",
                  x["a"], w)
        return h.sum(0)

    ex = dglnn.HeteroGNNExplainer(model_fn, num_epochs=10)
    emasks, fmasks = ex.explain_graph(hg, feat)
    assert emasks[("a", "ab", "b")].shape == (3,)
    assert fmasks["a"].shape == (4,)


def test_settransformer_blocks():
    import jax, jax.numpy as jnp, numpy as np
    from dgl_tpu.nn import (MultiHeadAttention, InducedSetAttentionBlock,
                            PMALayer, SetAttentionBlock)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 7, 16)).astype(np.float32))
    mha = MultiHeadAttention(16, 4, 4, 32)
    p = mha.init(jax.random.PRNGKey(0), x, x)
    assert mha.apply(p, x, x).shape == (2, 7, 16)
    isab = InducedSetAttentionBlock(3, 16, 4, 4, 32)
    p = isab.init(jax.random.PRNGKey(0), x)
    assert isab.apply(p, x).shape == (2, 7, 16)
    pma = PMALayer(2, 16, 4, 4, 32)
    p = pma.init(jax.random.PRNGKey(0), x)
    assert pma.apply(p, x).shape == (2, 2, 16)


def test_nn_utils_fns():
    import jax.numpy as jnp, numpy as np
    from dgl_tpu.nn import (Identity, matmul_maybe_select, bmm_maybe_select,
                            pairwise_squared_distance, get_aggregate_fn)
    import jax
    B = jnp.asarray([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]])
    out = matmul_maybe_select(jnp.asarray([2, 0, 1]), B)
    np.testing.assert_allclose(np.asarray(out),
                               [[0.5, 0.6], [0.1, 0.2], [0.3, 0.4]])
    dense = matmul_maybe_select(jnp.eye(3), B)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(B), rtol=1e-6)
    W = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 4)).astype(np.float32))
    A = jnp.asarray(np.random.default_rng(1).normal(
        size=(5, 3)).astype(np.float32))
    idx = jnp.asarray([0, 1, 0, 1, 1])
    out = bmm_maybe_select(A, W, idx)
    ref = np.stack([np.asarray(A[i]) @ np.asarray(W[int(idx[i])])
                    for i in range(5)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
    ids = jnp.asarray([1, 0, 2, 1, 0])
    out = bmm_maybe_select(ids, B.reshape(3, 2, 1).repeat(2, -1)[:, :, 0],
                           jnp.asarray([0, 1, 2, 0, 1]))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 3)))
    d = pairwise_squared_distance(x)
    ref = ((np.asarray(x)[:, :, None, :]
            - np.asarray(x)[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-4, atol=1e-5)
    agg = get_aggregate_fn("mean")
    np.testing.assert_allclose(
        np.asarray(agg([jnp.ones(3), jnp.zeros(3)])), 0.5)
    m = Identity()
    p = m.init(jax.random.PRNGKey(0), x)
    assert (m.apply(p, x) == x).all()


def test_spatial_encoder_3d():
    import jax, jax.numpy as jnp, numpy as np
    from dgl_tpu.nn import SpatialEncoder3d
    coord = jnp.asarray(np.random.default_rng(0).random(
        (1, 4, 3)).astype(np.float32))
    ntypes = jnp.asarray([[1, 0, 2, 1]])
    enc = SpatialEncoder3d(num_kernels=4, num_heads=8, max_node_type=3)
    p = enc.init(jax.random.PRNGKey(0), coord, ntypes)
    out = enc.apply(p, coord, ntypes)
    assert out.shape == (1, 4, 4, 8)
    out2 = enc.apply(p, coord)
    assert out2.shape == (1, 4, 4, 8)
    # per-node gather + broadcast-sum must equal the pair-indexed
    # formulation gamma=tbl[src+2]+tbl[tgt+max+3] (scatter-free bwd)
    pp = p["params"]
    c = np.asarray(coord)
    euc = np.sqrt(((c[:, :, None] - c[:, None, :]) ** 2).sum(-1) + 1e-12)
    nt = np.asarray(ntypes)
    gt_, bt_ = np.asarray(pp["gamma"]), np.asarray(pp["beta"])
    gamma = gt_[nt + 2][:, :, None, 0] + gt_[nt + 3 + 3][:, None, :, 0]
    beta = bt_[nt + 2][:, :, None, 0] + bt_[nt + 3 + 3][:, None, :, 0]
    xk = gamma[..., None] * euc[..., None] + beta[..., None]
    std = np.abs(np.asarray(pp["stds"])) + 1e-2
    g = np.exp(-0.5 * ((xk - np.asarray(pp["means"])) / std) ** 2) / (
        np.sqrt(2 * np.pi) * std)
    h = g @ np.asarray(pp["linear_layer_1"]["kernel"]) + np.asarray(
        pp["linear_layer_1"]["bias"])
    h = np.asarray(jax.nn.gelu(jnp.asarray(h)))
    ref = h @ np.asarray(pp["linear_layer_2"]["kernel"]) + np.asarray(
        pp["linear_layer_2"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                               atol=2e-5)


def test_hetero_explainers():
    import jax, jax.numpy as jnp, numpy as np
    import dgl_tpu
    from dgl_tpu.nn import HeteroPGExplainer, HeteroSubgraphX
    rng = np.random.default_rng(0)
    g = dgl_tpu.heterograph({
        ("a", "r1", "b"): (rng.integers(0, 4, 6), rng.integers(0, 3, 6)),
        ("b", "r2", "a"): (rng.integers(0, 3, 5), rng.integers(0, 4, 5)),
    })
    emb = {"a": jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
           "b": jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))}
    ex = HeteroPGExplainer()
    p = ex.init(jax.random.PRNGKey(0), g, emb)
    out = ex.apply(p, g, emb)
    assert set(out) == set(g.canonical_etypes)
    assert out[("a", "r1", "b")].shape == (6,)

    feat = {"a": jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))}

    def model_fn(graph, fd):
        return jnp.stack([fd["a"].sum(), fd["b"].sum()])

    sx = HeteroSubgraphX(model_fn, num_rollouts=3, shapley_steps=4)
    out = sx.explain_graph(g, feat, target_class=0, node_max=5)
    assert set(out) == {"a", "b"}
    assert sum(len(v) for v in out.values()) <= 5


def test_segmented_knn_graph_module():
    import numpy as np
    from dgl_tpu.nn import SegmentedKNNGraph
    x = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    g = SegmentedKNNGraph(2)(x, [4, 6])
    assert g.num_nodes() == 10


def test_graphormer_layer_bf16_dtype():
    """dtype=bfloat16 computes GEMMs/scores in bf16 but keeps params,
    softmax, and the returned array f32 — same param tree, close
    output (measured 1.41x at B=32 x N=512, PERF_NOTES round 5)."""
    import jax, jax.numpy as jnp, numpy as np
    rng2 = np.random.default_rng(3)
    x = jnp.asarray(rng2.normal(size=(2, 16, 32)).astype(np.float32))
    bias = jnp.asarray(rng2.normal(size=(2, 16, 16, 4)).astype(
        np.float32))
    gl32 = dglnn.GraphormerLayer(32, 64, 4, dropout=0.0,
                                 attn_dropout=0.0)
    glbf = dglnn.GraphormerLayer(32, 64, 4, dropout=0.0,
                                 attn_dropout=0.0, dtype=jnp.bfloat16)
    p = gl32.init(jax.random.PRNGKey(0), x, attn_bias=bias)
    o32 = gl32.apply(p, x, attn_bias=bias)
    obf = glbf.apply(p, x, attn_bias=bias)
    assert o32.dtype == obf.dtype == jnp.float32
    assert (jax.tree_util.tree_structure(glbf.init(
        jax.random.PRNGKey(0), x, attn_bias=bias))
        == jax.tree_util.tree_structure(p))
    scale = float(jnp.abs(o32).max())
    assert float(jnp.abs(o32 - obf).max()) < 0.05 * scale
    # grads flow and stay f32
    g = jax.grad(lambda p: (glbf.apply(p, x, attn_bias=bias)
                            ** 2).sum())(p)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert leaf.dtype == jnp.float32


def test_egt_layer_bf16_dtype():
    """EGTLayer dtype=bfloat16: same param tree, f32 outputs, close to
    the f32 path on both channels."""
    import jax, jax.numpy as jnp, numpy as np
    rng3 = np.random.default_rng(4)
    nf = jnp.asarray(rng3.normal(size=(2, 8, 16)).astype(np.float32))
    ef = jnp.asarray(rng3.normal(size=(2, 8, 8, 6)).astype(np.float32))
    e32 = dglnn.EGTLayer(16, 6, 4)
    ebf = dglnn.EGTLayer(16, 6, 4, dtype=jnp.bfloat16)
    p = e32.init(jax.random.PRNGKey(0), nf, ef)
    n32, f32o = e32.apply(p, nf, ef)
    nbf, fbfo = ebf.apply(p, nf, ef)
    assert nbf.dtype == fbfo.dtype == jnp.float32
    assert (jax.tree_util.tree_structure(
        ebf.init(jax.random.PRNGKey(0), nf, ef))
        == jax.tree_util.tree_structure(p))
    assert float(jnp.abs(n32 - nbf).max()) < 0.05 * float(
        jnp.abs(n32).max())
    assert float(jnp.abs(f32o - fbfo).max()) < 0.05 * float(
        jnp.abs(f32o).max())


def test_bias_layout_hnn_parity():
    """SpatialEncoder(layout='hnn') + GraphormerLayer(bias_layout='hnn')
    must equal the reference (B,N,N,H) path exactly."""
    import jax, jax.numpy as jnp, numpy as np
    rng4 = np.random.default_rng(6)
    dist = jnp.asarray(rng4.integers(-1, 6, (2, 10, 10)))
    x = jnp.asarray(rng4.normal(size=(2, 10, 16)).astype(np.float32))
    se_n = dglnn.SpatialEncoder(5, 4)
    se_h = dglnn.SpatialEncoder(5, 4, layout="hnn")
    p = se_n.init(jax.random.PRNGKey(0), dist)
    bn = se_n.apply(p, dist)
    bh = se_h.apply(p, dist)
    np.testing.assert_allclose(
        np.asarray(bn.transpose(0, 3, 1, 2)), np.asarray(bh), atol=0)
    gl_n = dglnn.GraphormerLayer(16, 32, 4, dropout=0.0,
                                 attn_dropout=0.0)
    gl_h = dglnn.GraphormerLayer(16, 32, 4, dropout=0.0,
                                 attn_dropout=0.0, bias_layout="hnn")
    pg = gl_n.init(jax.random.PRNGKey(1), x, attn_bias=bn)
    np.testing.assert_allclose(
        np.asarray(gl_n.apply(pg, x, attn_bias=bn)),
        np.asarray(gl_h.apply(pg, x, attn_bias=bh)), atol=1e-5)
