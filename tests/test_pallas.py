"""Pallas tiled-SpMM format + kernel tests.

The kernel itself needs TPU hardware; on CPU we verify the format builder
and run the kernel in interpreter mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import dgl_tpu.ops.pallas.tiled_spmm as ts


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)
        monkeypatch.setattr(ts.pl, "pallas_call", patched)
    yield


def test_format_builder_roundtrip():
    rng = np.random.default_rng(0)
    N, E = 700, 5000
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=256)
    # every edge appears exactly once
    eids = np.asarray(tf.eid)
    real = eids[eids >= 0]
    assert len(real) == E
    assert len(np.unique(real)) == E
    # local ids consistent with tiles
    sl = np.asarray(tf.src_local).reshape(tf.num_buckets, -1)
    dl = np.asarray(tf.dst_local).reshape(tf.num_buckets, -1)
    st = np.asarray(tf.src_tile)
    dt = np.asarray(tf.dst_tile)
    valid = np.asarray(tf.valid).reshape(tf.num_buckets, -1) > 0
    eid2 = eids.reshape(tf.num_buckets, -1)
    for b in range(tf.num_buckets):
        for c in np.nonzero(valid[b])[0]:
            e = eid2[b, c]
            assert row[e] == st[b] * 256 + sl[b, c]
            assert col[e] == dt[b] * 256 + dl[b, c]
    # dst tiles non-decreasing (accumulation contract)
    assert np.all(np.diff(dt) >= 0)


def test_tiled_spmm_matches_oracle():
    rng = np.random.default_rng(1)
    N, E, F = 600, 4000, 64
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    w = rng.random(E).astype(np.float32)
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=256)
    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, col, x[row] * w[:, None])
    out = ts.tiled_spmm(tf, jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)
    ref2 = np.zeros((N, F), np.float32)
    np.add.at(ref2, col, x[row])
    out2 = ts.tiled_spmm(tf, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=5e-2, rtol=5e-2)


def test_tiled_spmm_empty_rows_and_uneven():
    rng = np.random.default_rng(2)
    N, E, F = 300, 500, 32   # many zero-degree nodes, N not tile-aligned
    row = rng.integers(0, 50, E)   # sources concentrated
    col = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=128)
    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, col, x[row])
    out = ts.tiled_spmm(tf, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


def test_vjp_against_xla():
    """Gradients of the Pallas path match the XLA segment-sum path."""
    from dgl_tpu.ops.pallas.spmm import _spmm_tiled_vjp, _spmm_tiled_mul
    rng = np.random.default_rng(3)
    N, E, F = 500, 3000, 16
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ew = jnp.asarray((rng.random(E) + 0.5).astype(np.float32))
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=256)
    tr = ts.build_tiled_format(col, row, N, N, tile=256, cap=256)

    def loss_pallas(x, ew):
        return (_spmm_tiled_mul(tf, tr, jnp.asarray(row.astype(np.int32)),
                                jnp.asarray(col.astype(np.int32)), x,
                                ew) ** 2).sum()

    def loss_xla(x, ew):
        msg = jnp.take(x, jnp.asarray(row.astype(np.int32)), axis=0) \
            * ew[:, None]
        out = jax.ops.segment_sum(msg, jnp.asarray(col.astype(np.int32)),
                                  num_segments=N)
        return (out ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, ew)
    gx = jax.grad(loss_xla, argnums=(0, 1))(x, ew)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1,
                                   atol=0.5)
