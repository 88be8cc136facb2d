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
