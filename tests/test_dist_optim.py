"""Distributed sparse optimizers, mesh mode (reference
``python/dgl/distributed/optim/pytorch/sparse_optim.py``; KV mode is
covered in ``test_distributed_rpc.py``)."""
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.distributed import DistEmbedding
from dgl_tpu.distributed.optim import SparseAdam, SparseAdagrad


def adam_oracle(w, ids, grads, lr, b1, b2, eps, steps):
    """Dense numpy mirror of per-row sparse Adam with mean-coalescing."""
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    t = np.zeros(len(w))
    for sid, sgrad in zip(ids, grads):
        uniq, inv, cnt = np.unique(sid, return_inverse=True,
                                   return_counts=True)
        g = np.zeros((len(uniq), w.shape[1]), np.float32)
        np.add.at(g, inv, sgrad)
        g /= cnt[:, None]
        t[uniq] += 1
        m[uniq] = b1 * m[uniq] + (1 - b1) * g
        v[uniq] = b2 * v[uniq] + (1 - b2) * g * g
        mh = m[uniq] / (1 - b1 ** t[uniq][:, None])
        vh = v[uniq] / (1 - b2 ** t[uniq][:, None])
        w[uniq] -= lr * mh / (np.sqrt(vh) + eps)
    return w


def test_mesh_sparse_adam_matches_oracle():
    emb = DistEmbedding(64, 8, name="adam_emb")
    w0 = np.asarray(emb.data).copy()
    opt = SparseAdam([emb], lr=0.05)
    rng = np.random.default_rng(0)
    ids, grads = [], []
    for _ in range(3):
        sid = rng.integers(0, 64, 10)
        sid[0] = sid[1]  # force a duplicate -> mean coalescing
        ids.append(sid)
        grads.append(rng.normal(size=(10, 8)).astype(np.float32))
    for sid, g in zip(ids, grads):
        opt.step([(sid, jnp.asarray(g))])
    want = adam_oracle(w0.copy(), ids, grads, 0.05, 0.9, 0.999, 1e-8, 3)
    np.testing.assert_allclose(np.asarray(emb.data)[:64], want,
                               rtol=2e-5, atol=2e-6)
    # state is sharded like the table (O(rows/P) per device)
    assert opt._state[0]["m"].sharding == emb.data.sharding


def test_mesh_sparse_adagrad_decreases_loss():
    emb = DistEmbedding(32, 4, name="ada_emb")
    opt = SparseAdagrad([emb], lr=0.5)
    target = jnp.ones((32, 4))
    ids = np.arange(32)
    last = None
    for _ in range(30):
        w = emb.data[:32]
        loss = float(((w - target) ** 2).mean())
        grad = 2 * (w - target) / w.size * 32  # d/dw rows
        opt.step([(ids, grad)])
        if last is not None:
            assert loss <= last + 1e-9
        last = loss
    assert last < 0.05


def test_untouched_rows_unchanged():
    emb = DistEmbedding(16, 4, name="frozen_emb")
    w0 = np.asarray(emb.data).copy()
    opt = SparseAdam([emb], lr=1.0)
    opt.step([(np.array([2, 5]),
               jnp.ones((2, 4), jnp.float32))])
    w1 = np.asarray(emb.data)
    touched = np.zeros(16, bool)
    touched[[2, 5]] = True
    np.testing.assert_array_equal(w1[:16][~touched], w0[:16][~touched])
    assert not np.allclose(w1[2], w0[2])


def test_empty_step_and_type_check():
    emb = DistEmbedding(8, 2, name="e_emb")
    opt = SparseAdam([emb], lr=0.1)
    w0 = np.asarray(emb.data).copy()
    opt.step([(np.zeros(0, np.int32), jnp.zeros((0, 2)))])
    opt.step([(None, None)])
    np.testing.assert_array_equal(np.asarray(emb.data), w0)
    with pytest.raises(TypeError):
        SparseAdam([object()], lr=0.1)
    assert opt.param_groups[0]["lr"] == 0.1
