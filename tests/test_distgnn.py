"""distgnn split-vertex aggregation (VERDICT r1 item 8).

Reference: python/dgl/distgnn/ (Libra vertex-cut + split-node clone
databases) + DistGNN delayed updates (arXiv:2104.06700)."""
import numpy as np
import jax
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu.distgnn import (build_vertex_cut, partial_aggregate, combine,
                             DelayedAggregator)


def _graph(n=400, e=3000, seed=0):
    rng = np.random.default_rng(seed)
    return dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                     num_nodes=n), n


def test_vertex_cut_exact_aggregation():
    g, n = _graph()
    parts = build_vertex_cut(g, 2)
    assert parts.replication >= 1.0
    x = jnp.asarray(np.random.default_rng(1).normal(size=(n, 8))
                    .astype(np.float32))
    out = combine(parts, [partial_aggregate(parts, p, x)
                          for p in range(2)])
    row, col = (np.asarray(a) for a in g.unit().coo())
    ref = np.zeros((n, 8), np.float32)
    np.add.at(ref, col, np.asarray(x)[row])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_vertex_cut_training_matches_single_graph():
    """2-partition distgnn GCN training step == single-graph numerics."""
    import optax
    g, n = _graph(n=200, e=1200, seed=2)
    parts = build_vertex_cut(g, 2)
    agg = DelayedAggregator(parts, delay=0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(6, 3), scale=0.3).astype(np.float32))
    deg = jnp.maximum(jnp.asarray(np.bincount(
        np.asarray(g.unit().coo()[1]), minlength=n)).astype(jnp.float32),
        1.0)[:, None]

    def loss_parts(w):
        h = agg(x @ w) / deg
        return optax.softmax_cross_entropy_with_integer_labels(h, y).mean()

    row, col = (jnp.asarray(np.asarray(a)) for a in g.unit().coo())

    def loss_single(w):
        h = jax.ops.segment_sum((x @ w)[row], col, num_segments=n) / deg
        return optax.softmax_cross_entropy_with_integer_labels(h, y).mean()

    lp, gp = jax.value_and_grad(loss_parts)(w)
    ls, gs = jax.value_and_grad(loss_single)(w)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), rtol=1e-4,
                               atol=1e-5)


def test_delayed_aggregation_bounded_staleness():
    g, n = _graph(n=150, e=900, seed=4)
    parts = build_vertex_cut(g, 2)
    agg = DelayedAggregator(parts, delay=2)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    row, col = (np.asarray(a) for a in g.unit().coo())

    def exact(x):
        ref = np.zeros((n, 4), np.float32)
        np.add.at(ref, col, np.asarray(x)[row])
        return ref

    # refresh step: exact
    out0 = np.asarray(agg(x0))
    np.testing.assert_allclose(out0, exact(x0), rtol=1e-4, atol=1e-4)
    # stale step with same input: still exact (remote unchanged)
    out1 = np.asarray(agg(x0))
    np.testing.assert_allclose(out1, exact(x0), rtol=1e-4, atol=1e-4)
    # stale step with drifted input: approximate, refresh restores exact
    x1 = x0 * 1.5
    _ = agg(x1)        # step 2 -> refresh (step % delay == 0)
    out3 = np.asarray(agg(x1))
    np.testing.assert_allclose(out3, exact(x1), rtol=1e-2, atol=1e-2)
