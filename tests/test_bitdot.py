"""Dense bit-masked dot-product flash attention (ops/pallas/bitdot.py)
vs a dense XLA oracle: forward parity, full VJP (q/z), zero-in-degree
rows, the simple-graph guard, and DotGatConv integration.

Reference semantics: DotGatConv attention chain
(``python/dgl/nn/pytorch/conv/dotgatconv.py:12``) = gsddmm u_dot_v +
edge_softmax + gspmm u_mul_e_sum (``src/array/kernel.cc:309``).
Off-TPU the kernels run in Pallas interpret mode (``bitmm._interpret``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu
from dgl_tpu.ops.pallas.bitmm import build_bit_format
from dgl_tpu.ops.pallas.bitdot import bitdot_attention_aggregate


def _rand_graph(rng, n_src, n_dst, e):
    """Simple (deduped) random bipartite edge list."""
    row = rng.integers(0, n_src, e)
    col = rng.integers(0, n_dst, e)
    key = np.unique(col.astype(np.int64) * n_src + row)
    return (key % n_src).astype(np.int64), (key // n_src).astype(np.int64)


def _oracle(adj, q, z):
    """Dense per-dst dot-attention aggregation (XLA), same +-40 score
    clip contract as the kernel (gat_fused.py:515 family)."""
    d = z.shape[2]
    raw = jnp.einsum("shf,dhf->sdh", z, q) / jnp.sqrt(jnp.float32(d))
    sc = jnp.clip(raw, -40.0, 40.0)
    p = jnp.where(jnp.asarray(adj)[:, :, None], jnp.exp(sc), 0.0)
    den = jnp.maximum(p.sum(0), 1e-20)                 # (d, H)
    return jnp.einsum("sdh,shf->dhf", p, z) / den[:, :, None]


def _setup(rng, n_src=300, n_dst=220, e=4000, heads=2, d=16):
    row, col = _rand_graph(rng, n_src, n_dst, e)
    bf = build_bit_format(row, col, n_src, n_dst)
    adj = np.zeros((n_src, n_dst), bool)
    adj[row, col] = True
    q = jnp.asarray(rng.normal(size=(n_dst, heads, d)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(n_src, heads, d)), jnp.float32)
    return bf, adj, q, z


def test_bitdot_forward_matches_oracle(rng):
    bf, adj, q, z = _setup(rng)
    out = bitdot_attention_aggregate(bf, q, z)
    ref = _oracle(adj, q, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bitdot_forward_square(rng):
    bf, adj, q, z = _setup(rng, n_src=180, n_dst=180, e=2500,
                           heads=3, d=8)
    out = bitdot_attention_aggregate(bf, q, z)
    ref = _oracle(adj, q, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bitdot_grads_match_oracle(rng):
    bf, adj, q, z = _setup(rng, n_src=150, n_dst=130, e=1500,
                           heads=2, d=8)
    w = jnp.asarray(rng.normal(size=(130, 2, 8)), jnp.float32)

    def loss_kernel(q, z):
        return (bitdot_attention_aggregate(bf, q, z) * w).sum()

    def loss_oracle(q, z):
        return (_oracle(adj, q, z) * w).sum()

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(q, z)
    g_o = jax.grad(loss_oracle, argnums=(0, 1))(q, z)
    for gk, go, name in zip(g_k, g_o, ("q", "z")):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_bitdot_zero_in_degree_rows(rng):
    # dst nodes 100.. have no in-edges -> output rows exactly 0
    row, col = _rand_graph(rng, 200, 100, 2000)
    bf = build_bit_format(row, col, 200, 150)
    q = jnp.asarray(rng.normal(size=(150, 2, 8)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(200, 2, 8)), jnp.float32)
    out = np.asarray(bitdot_attention_aggregate(bf, q, z))
    assert out.shape == (150, 2, 8)
    np.testing.assert_array_equal(out[100:], 0.0)
    # ...and gradients through those rows are finite (not NaN)
    g = jax.grad(lambda z: bitdot_attention_aggregate(
        bf, q, z).sum())(z)
    assert np.isfinite(np.asarray(g)).all()


def test_bitdot_rejects_multigraph(rng):
    row = np.array([0, 0, 1], np.int64)
    col = np.array([1, 1, 2], np.int64)   # duplicate (0, 1)
    bf = build_bit_format(row, col, 8, 8)
    assert bf.rem_src.shape[0] > 0
    q = jnp.zeros((8, 1, 4)); z = jnp.zeros((8, 1, 4))
    with pytest.raises(ValueError, match="simple"):
        bitdot_attention_aggregate(bf, q, z)


def test_dotgatconv_uses_bitdot_when_bits_present(rng, monkeypatch):
    """DotGatConv on a graph with a built bitmask format routes through
    bitdot and matches the XLA edge-chain path (values + grads)."""
    import unittest.mock as mock
    from dgl_tpu.utils import config as _cfg
    import dgl_tpu.ops.pallas.bitdot as bd

    n, e = 260, 3200
    row, col = _rand_graph(rng, n, n, e)
    # every node gets an in-edge; dedupe the union (simple-graph req.)
    key = np.unique(np.r_[col.astype(np.int64) * n + row,
                          np.arange(n, dtype=np.int64) * n
                          + (np.arange(n) + 1) % n])
    row, col = key % n, key // n
    g = dgl_tpu.graph((jnp.asarray(row, jnp.int32),
                       jnp.asarray(col, jnp.int32)), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)

    conv = dgl_tpu.nn.DotGatConv(12, 64, num_heads=2)  # D >= 64 gate
    params = conv.init(jax.random.PRNGKey(0), g, x)
    ref = conv.apply(params, g, x)
    gref = jax.grad(lambda p: (conv.apply(p, g, x) ** 2).sum())(params)

    g.unit().create_bitmask_format()
    monkeypatch.setitem(_cfg._FLAGS, "pallas_spmm_min_edges", 1)
    with mock.patch.object(bd, "_bitdot_core",
                           wraps=bd._bitdot_core) as spy:
        out = conv.apply(params, g, x)
        assert spy.call_count == 1, "bitdot path not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    gbit = jax.grad(lambda p: (conv.apply(p, g, x) ** 2).sum())(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gref),
            jax.tree_util.tree_leaves_with_path(gbit)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"param grad mismatch: {ka}")
