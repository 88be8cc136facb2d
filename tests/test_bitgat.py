"""Dense bit-masked flash-attention GAT (ops/pallas/bitgat.py) vs a
dense XLA oracle: forward parity, full VJP (el/er/z), zero-in-degree
rows, the simple-graph guard, and GATConv integration.

Reference semantics: GATConv attention chain
(``python/dgl/nn/pytorch/conv/gatconv.py:14``) = gsddmm u_add_v +
leaky_relu + edge_softmax + gspmm u_mul_e_sum
(``src/array/kernel.cc:309``).  Off-TPU the kernels run in Pallas
interpret mode (see ``bitmm._interpret``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu
from dgl_tpu.ops.pallas.bitmm import build_bit_format
from dgl_tpu.ops.pallas.bitgat import bitgat_attention_aggregate


def _rand_graph(rng, n_src, n_dst, e):
    """Simple (deduped) random bipartite edge list."""
    row = rng.integers(0, n_src, e)
    col = rng.integers(0, n_dst, e)
    key = np.unique(col.astype(np.int64) * n_src + row)
    return (key % n_src).astype(np.int64), (key // n_src).astype(np.int64)


def _oracle(adj, el, er, z, slope):
    """Dense per-dst softmax-attention aggregation (XLA)."""
    raw = el[:, None, :] + er[None, :, :]              # (s, d, H)
    sc = jnp.where(raw > 0, raw, slope * raw)
    p = jnp.where(jnp.asarray(adj)[:, :, None], jnp.exp(sc), 0.0)
    den = jnp.maximum(p.sum(0), 1e-20)                 # (d, H)
    return jnp.einsum("sdh,shf->dhf", p, z) / den[:, :, None]


def _setup(rng, n_src=300, n_dst=220, e=4000, heads=2, d=16):
    row, col = _rand_graph(rng, n_src, n_dst, e)
    bf = build_bit_format(row, col, n_src, n_dst)
    adj = np.zeros((n_src, n_dst), bool)
    adj[row, col] = True
    el = jnp.asarray(rng.normal(size=(n_src, heads)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(n_dst, heads)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(n_src, heads, d)), jnp.float32)
    return bf, adj, el, er, z


def test_bitgat_forward_matches_oracle(rng):
    bf, adj, el, er, z = _setup(rng)
    out = bitgat_attention_aggregate(bf, el, er, z)
    ref = _oracle(adj, el, er, z, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bitgat_forward_square_and_slope(rng):
    bf, adj, el, er, z = _setup(rng, n_src=180, n_dst=180, e=2500,
                                heads=3, d=8)
    out = bitgat_attention_aggregate(bf, el, er, z, negative_slope=0.4)
    ref = _oracle(adj, el, er, z, 0.4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bitgat_grads_match_oracle(rng):
    bf, adj, el, er, z = _setup(rng, n_src=150, n_dst=130, e=1500,
                                heads=2, d=8)
    w = jnp.asarray(rng.normal(size=(130, 2, 8)), jnp.float32)

    def loss_kernel(el, er, z):
        return (bitgat_attention_aggregate(bf, el, er, z) * w).sum()

    def loss_oracle(el, er, z):
        return (_oracle(adj, el, er, z, 0.2) * w).sum()

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(el, er, z)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(el, er, z)
    for gk, go, name in zip(g_k, g_o, ("el", "er", "z")):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_bitgat_zero_in_degree_rows(rng):
    # dst nodes 100.. have no in-edges -> output rows exactly 0
    row, col = _rand_graph(rng, 200, 100, 2000)
    bf = build_bit_format(row, col, 200, 150)
    el = jnp.asarray(rng.normal(size=(200, 2)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(150, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(200, 2, 8)), jnp.float32)
    out = np.asarray(bitgat_attention_aggregate(bf, el, er, z))
    assert out.shape == (150, 2, 8)
    np.testing.assert_array_equal(out[100:], 0.0)
    # ...and gradients through those rows are finite (not NaN)
    g = jax.grad(lambda z: bitgat_attention_aggregate(
        bf, el, er, z).sum())(z)
    assert np.isfinite(np.asarray(g)).all()


def test_bitgat_rejects_multigraph(rng):
    row = np.array([0, 0, 1], np.int64)
    col = np.array([1, 1, 2], np.int64)   # duplicate (0, 1)
    bf = build_bit_format(row, col, 8, 8)
    assert bf.rem_src.shape[0] > 0
    el = jnp.zeros((8, 1)); er = jnp.zeros((8, 1))
    z = jnp.zeros((8, 1, 4))
    with pytest.raises(ValueError, match="simple"):
        bitgat_attention_aggregate(bf, el, er, z)


def _keep_dense(n_src, n_dst, heads, seed, attn_drop):
    """Dense (s, d, H) keep mask — same hash as the kernels."""
    from dgl_tpu.ops.pallas.bitgat import dropout_keep_reference
    ii = jnp.repeat(jnp.arange(n_src, dtype=jnp.int32), n_dst)
    jj = jnp.tile(jnp.arange(n_dst, dtype=jnp.int32), n_src)
    return dropout_keep_reference(ii, jj, heads, seed, attn_drop
                                  ).reshape(n_src, n_dst, heads)


def _oracle_drop(adj, el, er, z, slope, keep_mask, keep_prob):
    """Dense oracle of the reference dropout semantics: normalize,
    mask the normalized weights, scale survivors by 1/keep."""
    raw = el[:, None, :] + er[None, :, :]
    sc = jnp.where(raw > 0, raw, slope * raw)
    p = jnp.where(jnp.asarray(adj)[:, :, None], jnp.exp(sc), 0.0)
    den = jnp.maximum(p.sum(0), 1e-20)
    a = p / den[None]
    a = jnp.where(keep_mask, a, 0.0) / keep_prob
    return jnp.einsum("sdh,shf->dhf", a, z)


def test_bitgat_dropout_forward_matches_oracle(rng):
    bf, adj, el, er, z = _setup(rng)
    drop, seed = 0.5, 1234
    out = bitgat_attention_aggregate(bf, el, er, z, attn_drop=drop,
                                     dropout_seed=seed)
    km = _keep_dense(adj.shape[0], adj.shape[1], el.shape[1], seed, drop)
    from dgl_tpu.ops.pallas.bitgat import drop_thresh, _DROP_RES
    keep_prob = drop_thresh(drop) / _DROP_RES
    ref = _oracle_drop(adj, el, er, z, 0.2, km, keep_prob)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # determinism + seed sensitivity
    out2 = bitgat_attention_aggregate(bf, el, er, z, attn_drop=drop,
                                      dropout_seed=seed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = bitgat_attention_aggregate(bf, el, er, z, attn_drop=drop,
                                      dropout_seed=seed + 1)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_bitgat_dropout_grads_match_oracle(rng):
    bf, adj, el, er, z = _setup(rng, n_src=150, n_dst=130, e=1500,
                                heads=2, d=8)
    drop, seed = 0.6, 77                    # the reference recipe's p
    w = jnp.asarray(rng.normal(size=(130, 2, 8)), jnp.float32)
    km = _keep_dense(150, 130, 2, seed, drop)
    from dgl_tpu.ops.pallas.bitgat import drop_thresh, _DROP_RES
    keep_prob = drop_thresh(drop) / _DROP_RES

    def loss_kernel(el, er, z):
        return (bitgat_attention_aggregate(
            bf, el, er, z, attn_drop=drop, dropout_seed=seed) * w).sum()

    def loss_oracle(el, er, z):
        return (_oracle_drop(adj, el, er, z, 0.2, km, keep_prob)
                * w).sum()

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(el, er, z)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(el, er, z)
    for gk, go, name in zip(g_k, g_o, ("el", "er", "z")):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-3,
            err_msg=f"dropout grad mismatch: {name}")


def test_bitgat_dropout_rate_and_unbiasedness():
    """The hash mask drops ~p of (pair, head) slots, per head."""
    from dgl_tpu.ops.pallas.bitgat import dropout_keep_reference
    n = 40_000
    ii = jnp.arange(n, dtype=jnp.int32)
    jj = jnp.flip(jnp.arange(n, dtype=jnp.int32)) * 7
    for drop in (0.3, 0.6):
        km = np.asarray(dropout_keep_reference(ii, jj, 4, 99, drop))
        rates = 1.0 - km.mean(0)
        np.testing.assert_allclose(rates, drop, atol=0.01)
    # heads decorrelate: joint keep ~= product of marginals
    km = np.asarray(dropout_keep_reference(ii, jj, 2, 5, 0.5))
    joint = (km[:, 0] & km[:, 1]).mean()
    np.testing.assert_allclose(joint, km[:, 0].mean() * km[:, 1].mean(),
                               atol=0.01)


def test_gatconv_attn_drop_rides_bitgat(rng, monkeypatch):
    """The reference recipe (attn_drop=0.6, training mode) stays on the
    bitgat fast path (VERDICT r4 #2: the gate is gone)."""
    import unittest.mock as mock
    from dgl_tpu.utils import config as _cfg
    import dgl_tpu.ops.pallas.bitgat as bg

    n, e = 260, 3200
    row, col = _rand_graph(rng, n, n, e)
    key = np.unique(np.r_[col.astype(np.int64) * n + row,
                          np.arange(n, dtype=np.int64) * n
                          + (np.arange(n) + 1) % n])
    row, col = key % n, key // n
    g = dgl_tpu.graph((jnp.asarray(row, jnp.int32),
                       jnp.asarray(col, jnp.int32)), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
    conv = dgl_tpu.nn.GATConv(12, 8, num_heads=2, attn_drop=0.6)
    params = conv.init(jax.random.PRNGKey(0), g, x)
    g.unit().create_bitmask_format()
    monkeypatch.setitem(_cfg._FLAGS, "pallas_spmm_min_edges", 1)
    with mock.patch.object(bg, "_bitgat_core",
                           wraps=bg._bitgat_core) as spy:
        out = conv.apply(params, g, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(3)})
        assert spy.call_count == 1, "bitgat path not taken with dropout"
    assert np.isfinite(np.asarray(out)).all()
    # eval mode: no dropout, still bitgat, deterministic
    oute = conv.apply(params, g, x, deterministic=True)
    out2 = conv.apply(params, g, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(4)})
    assert np.abs(np.asarray(out) - np.asarray(oute)).max() > 1e-4
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
    # grads flow through the dropout kernel path
    def loss(p):
        o = conv.apply(p, g, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(5)})
        return (o ** 2).sum()
    gb = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(gb):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gatconv_uses_bitgat_when_bits_present(rng, monkeypatch):
    """GATConv on a graph with a built bitmask format routes through
    bitgat and matches the XLA edge-chain path (values + grads)."""
    import unittest.mock as mock
    from dgl_tpu.utils import config as _cfg
    import dgl_tpu.ops.pallas.bitgat as bg

    n, e = 260, 3200
    row, col = _rand_graph(rng, n, n, e)
    # ensure every node has an in-edge (GATConv zero-in-degree contract);
    # dedupe the union so the graph stays simple (bitgat requirement)
    key = np.unique(np.r_[col.astype(np.int64) * n + row,
                          np.arange(n, dtype=np.int64) * n
                          + (np.arange(n) + 1) % n])
    row, col = key % n, key // n
    g = dgl_tpu.graph((jnp.asarray(row, jnp.int32),
                       jnp.asarray(col, jnp.int32)), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)

    conv = dgl_tpu.nn.GATConv(12, 8, num_heads=2)
    params = conv.init(jax.random.PRNGKey(0), g, x)
    ref = conv.apply(params, g, x)
    gref = jax.grad(lambda p: (conv.apply(p, g, x) ** 2).sum())(params)

    g.unit().create_bitmask_format()
    monkeypatch.setitem(_cfg._FLAGS, "pallas_spmm_min_edges", 1)
    with mock.patch.object(bg, "_bitgat_core",
                           wraps=bg._bitgat_core) as spy:
        out = conv.apply(params, g, x)
        assert spy.call_count == 1, "bitgat path not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    gbit = jax.grad(lambda p: (conv.apply(p, g, x) ** 2).sum())(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gref),
            jax.tree_util.tree_leaves_with_path(gbit)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"param grad mismatch: {ka}")
