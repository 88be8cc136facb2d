"""Mesh-sharded bitmask SpMM (parallel/bitspmd.py) vs dense oracle.

Runs on the 8-device CPU mesh from conftest; the Pallas kernel inside
shard_map auto-selects interpret mode off-TPU (bitmm._interpret)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl_tpu.parallel import bitspmd


def _mesh(p=8):
    devs = jax.devices()
    if len(devs) < p:
        pytest.skip(f"needs {p} devices")
    return Mesh(np.array(devs[:p]), ("data",))


def _rand_graph(rng, n, e, symmetric):
    if symmetric:
        r0 = rng.integers(0, n, e // 2).astype(np.int64)
        c0 = rng.integers(0, n, e // 2).astype(np.int64)
        row = np.r_[r0, c0]
        col = np.r_[c0, r0]
    else:
        row = rng.integers(0, n, e).astype(np.int64)
        col = rng.integers(0, n, e).astype(np.int64)
    return row, col


@pytest.mark.parametrize("symmetric", [True, False])
def test_bit_sharded_matches_dense(symmetric):
    mesh = _mesh()
    rng = np.random.default_rng(3)
    n, e, f = 500, 6000, 5
    row, col = _rand_graph(rng, n, e, symmetric)
    # force multi-edges so the remainder path is exercised
    row[:40] = row[0]
    col[:40] = col[0]
    if symmetric:
        row[e // 2:e // 2 + 40] = col[0]
        col[e // 2:e // 2 + 40] = row[0]
    fmt = bitspmd.build_bit_sharded_format(row, col, n, 8,
                                           symmetric=symmetric)
    assert fmt.rem_w.sum() > 0
    fmt = bitspmd.shard_format(fmt, mesh)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    xp = jax.device_put(bitspmd.pad_nodes(fmt, x),
                        NamedSharding(mesh, P("data")))

    out = np.asarray(bit_fwd(fmt, xp, mesh))[:n]
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (col, row), 1.0)
    ref = dense @ np.asarray(x)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-1)

    # per-device memory is O(N^2 / 8P): one (kp, W) slice, x2 if asym
    p_, kp_, w_ = fmt.shards.shape
    assert p_ == 8
    assert fmt.bytes_per_device == kp_ * w_ * 4 * (1 if symmetric else 2)


def bit_fwd(fmt, xp, mesh):
    return jax.jit(
        lambda fmt, xp: bitspmd.bit_sharded_spmm(fmt, xp, mesh, "data")
    )(fmt, xp)


@pytest.mark.parametrize("symmetric", [True, False])
def test_bit_sharded_grad(symmetric):
    mesh = _mesh()
    rng = np.random.default_rng(4)
    n, e, f = 400, 4000, 3
    row, col = _rand_graph(rng, n, e, symmetric)
    row[:20] = row[1]
    col[:20] = col[1]
    if symmetric:
        row[e // 2:e // 2 + 20] = col[1]
        col[e // 2:e // 2 + 20] = row[1]
    fmt = bitspmd.build_bit_sharded_format(row, col, n, 8,
                                           symmetric=symmetric)
    fmt = bitspmd.shard_format(fmt, mesh)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    xp = jax.device_put(bitspmd.pad_nodes(fmt, x),
                        NamedSharding(mesh, P("data")))

    def loss(fmt, xp):
        o = bitspmd.bit_sharded_spmm(fmt, xp, mesh, "data")
        return (o ** 2).sum()

    g = np.asarray(jax.jit(jax.grad(loss, argnums=1))(fmt, xp))[:n]
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (col, row), 1.0)
    ref = dense @ np.asarray(x)
    gref = 2 * dense.T @ ref
    np.testing.assert_allclose(g, gref, rtol=5e-2, atol=1.0)


def test_bit_sharded_train_step():
    """A jitted 2-layer GCN train step over the sharded format converges
    (the full-graph multi-chip training story at dense-regime scale)."""
    import optax
    mesh = _mesh()
    rng = np.random.default_rng(5)
    n, e, f, c = 480, 5000, 8, 4
    row, col = _rand_graph(rng, n, e, True)
    fmt = bitspmd.build_bit_sharded_format(row, col, n, 8, symmetric=True)
    fmt = bitspmd.shard_format(fmt, mesh)
    total = fmt.num_parts * fmt.npp
    y_np = (np.arange(n) * c // n).astype(np.int32)
    x_np = (rng.normal(size=(n, f)) +
            np.eye(c)[y_np] @ rng.normal(size=(c, f)) * 2).astype(
                np.float32)
    sh = NamedSharding(mesh, P("data"))
    x = jax.device_put(bitspmd.pad_nodes(
        fmt, jnp.asarray(x_np)), sh)
    y = jax.device_put(bitspmd.pad_nodes(
        fmt, jnp.asarray(y_np)[:, None])[:, 0], sh)
    mask = jax.device_put(bitspmd.pad_nodes(
        fmt, jnp.ones((n, 1), jnp.float32))[:, 0], sh)
    deg = bitspmd.sharded_in_degrees(fmt, row, col, mesh)
    deg = jnp.maximum(deg, 1.0)[:, None]

    params = {
        "w1": jnp.asarray(rng.normal(size=(f, 16), scale=0.3),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(16, c), scale=0.3),
                          jnp.float32),
    }
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, fmt, x, y):
        def loss_fn(p):
            h = bitspmd.bit_sharded_spmm(fmt, x @ p["w1"], mesh,
                                         "data") / deg
            h = jax.nn.relu(h)
            logits = bitspmd.bit_sharded_spmm(fmt, h, mesh,
                                              "data") / deg @ p["w2"]
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            return (ls * mask).sum() / mask.sum()
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    losses = []
    for i in range(15):
        params, opt, l = step(params, opt, fmt, x, y)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
