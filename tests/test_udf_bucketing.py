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


def test_frame_initializers_on_structural_edits():
    """set_n/e_initializer columns honored by add_nodes/add_edges
    (VERDICT r1 item 10; ref python/dgl/frame.py:56,167,571)."""
    g = dgl.graph((np.array([0, 1]), np.array([1, 2])), num_nodes=3)
    g.ndata["h"] = jnp.ones((3, 4))
    g.ndata["m"] = jnp.ones((3,))
    g.edata["w"] = jnp.ones((2,))

    def ones_init(shape, dtype, ctx, id_range):
        return np.full(shape, 7.0, dtype)

    g.set_n_initializer(ones_init, field="h")
    g.set_e_initializer(lambda shape, dtype: np.full(shape, 3.0, dtype))
    g2 = g.add_nodes(2)
    out_h = np.asarray(g2.ndata["h"])
    assert (out_h[3:] == 7.0).all()          # per-field initializer
    assert (np.asarray(g2.ndata["m"])[3:] == 0).all()   # default zero
    g3 = g2.add_edges(np.array([3]), np.array([4]))
    assert np.asarray(g3.edata["w"])[-1] == 3.0  # catch-all (2-arg form)


def test_shortest_dist_paths_reference_golden():
    """Reference docstring example, functional.py:3916-3931 (fixes the
    round-1 declared NotImplementedError hole)."""
    g = dgl.graph((np.array([0, 1, 1, 2]), np.array([2, 0, 3, 3])))
    dist, paths = dgl.shortest_dist(g, root=None, return_paths=True)
    want = np.array([[0, -1, 1, 2], [1, 0, 2, 1],
                     [-1, -1, 0, 1], [-1, -1, -1, 0]])
    np.testing.assert_array_equal(np.asarray(dist), want)
    p = np.asarray(paths)
    np.testing.assert_array_equal(p[0, 3], [0, 3])
    np.testing.assert_array_equal(p[0, 0], [-1, -1])
    d, pth = dgl.shortest_dist(g, root=1, return_paths=True)
    np.testing.assert_array_equal(np.asarray(d), [1, 0, 2, 1])
    np.testing.assert_array_equal(np.asarray(pth)[3], [2, -1])
