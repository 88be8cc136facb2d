"""Sparse optimizer semantics vs the reference contract
(``python/dgl/optim/pytorch/sparse_optim.py:814`` update):
duplicate-id mean-coalescing, per-row bias correction, state roundtrip."""
import numpy as np
import jax.numpy as jnp
import pytest

from dgl_tpu.nn import NodeEmbedding
from dgl_tpu.optim import SparseAdam, SparseAdagrad


def _lazy_adam_oracle(w, steps, lr=0.1, b1=0.9, b2=0.999, eps=1e-8):
    """Numpy lazy Adam with per-row step counts and duplicate-mean grads."""
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    t = np.zeros(w.shape[0], np.int64)
    for ids, grad in steps:
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        g = np.zeros((len(uniq), w.shape[1]), w.dtype)
        np.add.at(g, inv, grad)
        g = g / cnt[:, None]
        t[uniq] += 1
        ti = t[uniq].astype(np.float64)[:, None]
        m[uniq] = b1 * m[uniq] + (1 - b1) * g
        v[uniq] = b2 * v[uniq] + (1 - b2) * g * g
        m_hat = m[uniq] / (1 - b1 ** ti)
        v_hat = v[uniq] / (1 - b2 ** ti)
        w[uniq] -= lr * m_hat / (np.sqrt(v_hat) + eps)
    return w


def test_sparse_adam_duplicate_ids_match_oracle():
    rng = np.random.default_rng(0)
    emb = NodeEmbedding(20, 4, "dup")
    w0 = np.asarray(emb.weight).astype(np.float64).copy()
    opt = SparseAdam([emb], lr=0.1)

    steps = []
    for _ in range(3):
        ids = rng.integers(0, 20, size=7)  # duplicates likely
        ids[0] = ids[1]                    # force a duplicate
        grad = rng.normal(size=(7, 4))
        steps.append((ids, grad))
        opt.step([(jnp.asarray(ids), jnp.asarray(grad, jnp.float32))])

    want = _lazy_adam_oracle(w0.copy(), steps)
    got = np.asarray(emb.weight)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sparse_adam_per_row_bias_correction():
    # A row touched once at step 3 must be corrected as if at t=1,
    # not t=3 (per-row step counts).
    emb_a = NodeEmbedding(4, 2, "a")
    emb_b = NodeEmbedding(4, 2, "b")
    emb_b.all_set_embedding(emb_a.weight)
    opt_a = SparseAdam([emb_a], lr=0.1)
    opt_b = SparseAdam([emb_b], lr=0.1)
    g = jnp.ones((1, 2), jnp.float32)
    # a: rows 0,0,0 then 1; b: just 1 once
    for _ in range(3):
        opt_a.step([(jnp.array([0]), g)])
    opt_a.step([(jnp.array([1]), g)])
    opt_b.step([(jnp.array([1]), g)])
    np.testing.assert_allclose(np.asarray(emb_a.weight)[1],
                               np.asarray(emb_b.weight)[1], rtol=1e-6)


def test_sparse_adagrad_oracle():
    rng = np.random.default_rng(1)
    emb = NodeEmbedding(10, 3, "ag")
    w = np.asarray(emb.weight).astype(np.float64).copy()
    G = np.zeros_like(w)
    opt = SparseAdagrad([emb], lr=0.5, eps=1e-10)
    for _ in range(3):
        ids = rng.integers(0, 10, size=4)
        ids[2] = ids[3]
        grad = rng.normal(size=(4, 3))
        opt.step([(jnp.asarray(ids), jnp.asarray(grad, jnp.float32))])
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        g = np.zeros((len(uniq), 3))
        np.add.at(g, inv, grad)
        g /= cnt[:, None]
        G[uniq] += g * g
        w[uniq] -= 0.5 * g / (np.sqrt(G[uniq]) + 1e-10)
    np.testing.assert_allclose(np.asarray(emb.weight), w,
                               rtol=2e-4, atol=2e-5)


def test_state_dict_roundtrip():
    emb1 = NodeEmbedding(12, 4, "x")
    opt1 = SparseAdam([emb1], lr=0.05, betas=(0.8, 0.99))
    ids = jnp.array([2, 3, 5])
    g = jnp.ones((3, 4), jnp.float32)
    opt1.step([(ids, g)])
    sd = opt1.state_dict()
    assert sd["param_groups"][0]["betas"] == (0.8, 0.99)

    emb2 = NodeEmbedding(12, 4, "x")
    emb2.all_set_embedding(emb1.weight)
    opt2 = SparseAdam([emb2], lr=0.9)
    opt2.load_state_dict(sd)
    assert opt2.lr == 0.05 and opt2.beta1 == 0.8

    # identical next step from restored state
    opt1.step([(ids, g)])
    opt2.step([(ids, g)])
    np.testing.assert_allclose(np.asarray(emb1.weight),
                               np.asarray(emb2.weight), rtol=1e-6)


def test_rejects_non_embedding():
    with pytest.raises(TypeError):
        SparseAdam([jnp.zeros((3, 3))], lr=0.1)
