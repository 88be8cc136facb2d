"""Mesh-sharded dense flash attention (parallel/bitgat_spmd.py) vs a
dense GAT oracle: forward parity, full VJP (el/er/z), and the
simple-graph guard — on the 8-device CPU mesh from conftest (the
Pallas kernels inside shard_map auto-select interpret mode off-TPU).

Reference semantics: the GATConv attention chain
(``python/dgl/nn/pytorch/conv/gatconv.py:14``) partitioned by dst —
softmax normalization is per-dst and therefore owner-local."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl_tpu.parallel import bitspmd, bitgat_spmd


def _mesh(p=8):
    devs = jax.devices()
    if len(devs) < p:
        pytest.skip(f"needs {p} devices")
    return Mesh(np.array(devs[:p]), ("data",))


def _simple_graph(rng, n, e):
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    key = np.unique(col.astype(np.int64) * n + row)
    return (key % n).astype(np.int64), (key // n).astype(np.int64)


def _oracle(adj, el, er, z, slope=0.2):
    """Dense per-dst softmax attention (same clip contract)."""
    el = jnp.clip(el, -20.0, 20.0)
    er = jnp.clip(er, -20.0, 20.0)
    raw = el[:, None, :] + er[None, :, :]              # (s, d, H)
    sc = jnp.where(raw > 0, raw, slope * raw)
    p = jnp.where(jnp.asarray(adj)[:, :, None], jnp.exp(sc), 0.0)
    den = jnp.maximum(p.sum(0), 1e-20)                 # (d, H)
    return jnp.einsum("sdh,shf->dhf", p, z) / den[:, :, None]


def _pad_put(fmt, mesh, x):
    return jax.device_put(bitspmd.pad_nodes(fmt, x),
                          NamedSharding(mesh, P("data")))


def _setup(rng, n=450, e=5000, heads=2, d=8):
    mesh = _mesh()
    row, col = _simple_graph(rng, n, e)
    fmt = bitgat_spmd.build_bit_sharded_format(row, col, n, 8)
    fmt = bitspmd.shard_format(fmt, mesh)
    adj = np.zeros((n, n), bool)
    adj[row, col] = True
    el = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(n, heads, d)), jnp.float32)
    return mesh, fmt, adj, el, er, z, n


def test_sharded_gat_forward_matches_oracle(rng):
    mesh, fmt, adj, el, er, z, n = _setup(rng)
    out = jax.jit(lambda fmt, a, b, c: bitgat_spmd.bit_sharded_gat(
        fmt, a, b, c, mesh, "data"))(
            fmt, _pad_put(fmt, mesh, el), _pad_put(fmt, mesh, er),
            _pad_put(fmt, mesh, z))
    ref = _oracle(adj, el, er, z)
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # padded dst rows produce exactly 0
    np.testing.assert_array_equal(np.asarray(out)[n:], 0.0)


def test_sharded_gat_grads_match_oracle(rng):
    mesh, fmt, adj, el, er, z, n = _setup(rng, n=380, e=3500)
    w = jnp.asarray(rng.normal(size=(380, 2, 8)), jnp.float32)
    elp, erp, zp = (_pad_put(fmt, mesh, el), _pad_put(fmt, mesh, er),
                    _pad_put(fmt, mesh, z))

    def loss_sharded(a, b, c):
        out = bitgat_spmd.bit_sharded_gat(fmt, a, b, c, mesh, "data")
        return (out[:380] * w).sum()

    def loss_oracle(a, b, c):
        return (_oracle(adj, a, b, c) * w).sum()

    g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(elp, erp, zp)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(el, er, z)
    for gs, go, name in zip(g_s, g_o, ("el", "er", "z")):
        np.testing.assert_allclose(
            np.asarray(gs)[:380], np.asarray(go), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_sharded_gat_rejects_multigraph(rng):
    mesh = _mesh()
    row = np.array([0, 0, 1], np.int64)
    col = np.array([5, 5, 7], np.int64)     # duplicate (0, 5)
    fmt = bitgat_spmd.build_bit_sharded_format(row, col, 16, 8)
    fmt = bitspmd.shard_format(fmt, mesh)
    el = _pad_put(fmt, mesh, jnp.zeros((16, 1)))
    er = _pad_put(fmt, mesh, jnp.zeros((16, 1)))
    z = _pad_put(fmt, mesh, jnp.zeros((16, 1, 8)))
    with pytest.raises(ValueError, match="simple"):
        bitgat_spmd.bit_sharded_gat(fmt, el, er, z, mesh, "data")
