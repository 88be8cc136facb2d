"""Pow2 degree-bucketed UDF reduction (VERDICT r1 item 4).

Reference semantics: ``python/dgl/core.py:99-174`` buckets dst nodes by
exact degree; on TPU that compiles one mailbox shape per distinct degree.
The pow2 path must (a) bound compiled shapes on power-law graphs and
(b) produce identical results, including for sequence reducers (lstm).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import function as fn
from dgl_tpu.utils import config


def _powerlaw_graph(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    # heavy-tailed in-degrees: many distinct values
    deg = np.minimum(rng.zipf(1.5, n), 400)
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, len(dst))
    return dgl.graph((src, dst), num_nodes=n), int(len(dst))


def test_distinct_degrees_bound_compiled_shapes():
    g, E = _powerlaw_graph()
    deg = np.asarray(g.in_degrees())
    n_distinct = len(np.unique(deg[deg > 0]))
    assert n_distinct > 30, "graph not power-law enough for the test"
    g.ndata["h"] = jnp.asarray(
        np.random.default_rng(1).normal(size=(g.num_nodes(), 8)).astype(
            np.float32))
    shapes = set()
    orig = fn_sum = None

    def reducer(nodes):
        shapes.add(tuple(nodes.mailbox["m"].shape))
        return {"o": nodes.mailbox["m"].sum(axis=1)}

    out = dgl.update_all(g, fn.copy_u("h", "m"), reducer)["o"]
    # pow2 bucketing: #mailbox shapes ~ log2(max_deg) * O(1), far below
    # the distinct-degree count
    assert len(shapes) <= 12, (len(shapes), n_distinct)
    ref = dgl.update_all(g, fn.copy_u("h", "m"), fn.sum("m", "o"))["o"]
    # accumulation order differs from the segment-sum at degree ~400
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_pow2_matches_exact_bucketing_sum_and_mask():
    g, _ = _powerlaw_graph(n=500, seed=2)
    g.ndata["h"] = jnp.asarray(
        np.random.default_rng(3).normal(size=(g.num_nodes(), 4)).astype(
            np.float32))

    def masked_max(nodes):
        m = nodes.mailbox["m"]
        if nodes.mailbox_mask is not None:
            neg = jnp.finfo(m.dtype).min
            m = jnp.where(nodes.mailbox_mask[..., None], m, neg)
        return {"o": m.max(axis=1)}

    out = dgl.update_all(g, fn.copy_u("h", "m"), masked_max)["o"]
    config.set("udf_pow2_bucketing", False)
    try:
        ref = dgl.update_all(g, fn.copy_u("h", "m"), masked_max)["o"]
    finally:
        config.set("udf_pow2_bucketing", True)
    deg = np.asarray(g.in_degrees())
    nz = deg > 0
    np.testing.assert_allclose(np.asarray(out)[nz], np.asarray(ref)[nz],
                               rtol=1e-5, atol=1e-5)


def test_sageconv_lstm_unchanged_by_pow2():
    from dgl_tpu import nn as dglnn
    g, _ = _powerlaw_graph(n=300, seed=4)
    g = dgl.add_self_loop(g)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(g.num_nodes(), 6)).astype(np.float32))
    conv = dglnn.SAGEConv(6, 5, aggregator_type="lstm")
    params = conv.init(jax.random.PRNGKey(0), g, x)
    out = conv.apply(params, g, x)
    config.set("udf_pow2_bucketing", False)
    try:
        ref = conv.apply(params, g, x)
    finally:
        config.set("udf_pow2_bucketing", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_degrees_helper():
    g = dgl.graph((np.array([0, 1, 2, 3]), np.array([1, 1, 1, 2])),
                  num_nodes=4)
    g.ndata["h"] = jnp.ones((4, 2))
    seen = {}

    def reducer(nodes):
        d = nodes.degrees()
        for n, dd in zip(np.asarray(nodes.nodes()), np.asarray(d)):
            seen.setdefault(int(n), int(dd))
        return {"o": nodes.mailbox["m"].sum(axis=1)}

    dgl.update_all(g, fn.copy_u("h", "m"), reducer)
    assert seen[1] == 3 and seen[2] == 1
