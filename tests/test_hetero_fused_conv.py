"""HeteroGraphConv fused GraphConv dispatch (VERDICT r1 item 7):
same-dst GraphConv relations batch through ONE stacked SpMM; outputs and
param structure must match the per-relation path exactly.
Ref: nn/pytorch/hetero.py:12, src/array/cuda/spmm_hetero.cu."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.utils import config


def _hetero(seed=0):
    rng = np.random.default_rng(seed)
    n_u, n_v, n_w = 40, 50, 30
    data = {
        ("user", "follows", "user"): (rng.integers(0, n_u, 200),
                                      rng.integers(0, n_u, 200)),
        ("item", "bought-by", "user"): (rng.integers(0, n_v, 300),
                                        rng.integers(0, n_u, 300)),
        ("tag", "tags", "user"): (rng.integers(0, n_w, 150),
                                  rng.integers(0, n_u, 150)),
        ("user", "rates", "item"): (rng.integers(0, n_u, 120),
                                    rng.integers(0, n_v, 120)),
    }
    g = dgl.heterograph(data, num_nodes_dict={"user": n_u, "item": n_v,
                                              "tag": n_w})
    x = {"user": jnp.asarray(rng.normal(size=(n_u, 8)).astype(np.float32)),
         "item": jnp.asarray(rng.normal(size=(n_v, 8)).astype(np.float32)),
         "tag": jnp.asarray(rng.normal(size=(n_w, 8)).astype(np.float32))}
    return g, x


@pytest.mark.parametrize("norm", ["both", "right", "none"])
def test_fused_matches_unfused(norm):
    g, x = _hetero()
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.GraphConv(8, 6, norm=norm,
                                   allow_zero_in_degree=True),
        "bought-by": dglnn.GraphConv(8, 6, norm=norm,
                                     allow_zero_in_degree=True),
        "tags": dglnn.GraphConv(8, 6, norm=norm,
                                allow_zero_in_degree=True),
        "rates": dglnn.GraphConv(8, 6, norm=norm,
                                 allow_zero_in_degree=True),
    }, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(0), g, x)
    out_fused = conv.apply(params, g, x)
    config.set("fuse_multi_update_all", False)
    try:
        params2 = conv.init(jax.random.PRNGKey(0), g, x)
        out_ref = conv.apply(params2, g, x)
    finally:
        config.set("fuse_multi_update_all", True)
    # identical param trees (names, shapes, values from the same seed)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for nt in out_ref:
        np.testing.assert_allclose(np.asarray(out_fused[nt]),
                                   np.asarray(out_ref[nt]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_gradients_match():
    import optax
    g, x = _hetero(seed=1)
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.GraphConv(8, 4, allow_zero_in_degree=True),
        "bought-by": dglnn.GraphConv(8, 4, allow_zero_in_degree=True),
        "tags": dglnn.GraphConv(8, 4, allow_zero_in_degree=True),
    }, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(1), g, x)

    def loss(p):
        out = conv.apply(p, g, x)
        return sum((v ** 2).sum() for v in out.values())

    gf = jax.grad(loss)(params)
    config.set("fuse_multi_update_all", False)
    try:
        gr = jax.grad(loss)(params)
    finally:
        config.set("fuse_multi_update_all", True)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_sage_matches_unfused():
    """Per-relation SAGEConv modules (mean aggregator) fuse into one
    union-graph SpMM + batched GEMM (VERDICT r2 item 6); outputs, param
    structure, and gradients must match the per-relation path."""
    g, x = _hetero(seed=2)
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.SAGEConv(8, 6),
        "bought-by": dglnn.SAGEConv(8, 6),
        "tags": dglnn.SAGEConv(8, 6),
        "rates": dglnn.SAGEConv(8, 6),
    }, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(3), g, x)
    out_fused = conv.apply(params, g, x)
    config.set("fuse_multi_update_all", False)
    try:
        params2 = conv.init(jax.random.PRNGKey(3), g, x)
        out_ref = conv.apply(params2, g, x)
    finally:
        config.set("fuse_multi_update_all", True)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for nt in out_ref:
        np.testing.assert_allclose(np.asarray(out_fused[nt]),
                                   np.asarray(out_ref[nt]),
                                   rtol=1e-4, atol=1e-5)

    def loss(p, fused):
        if not fused:
            config.set("fuse_multi_update_all", False)
        try:
            out = conv.apply(p, g, x)
        finally:
            config.set("fuse_multi_update_all", True)
        return sum((v ** 2).sum() for v in out.values())

    gf = jax.grad(lambda p: loss(p, True))(params)
    gr = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_fused_sage_mixed_with_graphconv():
    """Mixed module classes: SAGEConvs fuse among themselves, GraphConvs
    among themselves, leftovers (GAT) run per relation — one pass."""
    g, x = _hetero(seed=3)
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.SAGEConv(8, 6),
        "bought-by": dglnn.SAGEConv(8, 6),
        "tags": dglnn.GraphConv(8, 6, allow_zero_in_degree=True),
        "rates": dglnn.SAGEConv(8, 6),
    }, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(4), g, x)
    out_fused = conv.apply(params, g, x)
    config.set("fuse_multi_update_all", False)
    try:
        out_ref = conv.apply(params, g, x)
    finally:
        config.set("fuse_multi_update_all", True)
    for nt in out_ref:
        np.testing.assert_allclose(np.asarray(out_fused[nt]),
                                   np.asarray(out_ref[nt]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_gat_matches_unfused():
    """GAT-family fusion (VERDICT r3 #7): same-key GATConv relations
    batch their projections into one stacked einsum; outputs and grads
    must match the per-relation path exactly."""
    g, x = _hetero(3)
    conv = dglnn.HeteroGraphConv({
        "follows": dglnn.GATConv(8, 4, num_heads=2),
        "bought-by": dglnn.GATConv(8, 4, num_heads=2),
        "tags": dglnn.GATConv(8, 4, num_heads=2),
        "rates": dglnn.GATConv(8, 4, num_heads=2),
    }, aggregate="sum")
    # follows/bought-by/tags share dst 'user' but DIFFERENT src ntypes:
    # only same-(dt, st) relations group; the rest run per-relation.
    params = conv.init(jax.random.PRNGKey(0), g, x)

    def run(p):
        return conv.apply(p, g, x)

    got = run(params)
    config.set("fuse_multi_update_all", False)
    try:
        want = run(params)
    finally:
        config.set("fuse_multi_update_all", True)
    for nt in want:
        np.testing.assert_allclose(np.asarray(got[nt]),
                                   np.asarray(want[nt]),
                                   rtol=2e-5, atol=2e-5)

    def loss(p, fused):
        config.set("fuse_multi_update_all", fused)
        try:
            out = conv.apply(p, g, x)
        finally:
            config.set("fuse_multi_update_all", True)
        return sum((v ** 2).sum() for v in out.values())

    gf = jax.grad(lambda p: loss(p, True))(params)
    gu = jax.grad(lambda p: loss(p, False))(params)
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), gf, gu)))
    assert err < 2e-4, err


def test_fused_gat_same_src_groups():
    """Multiple same-(src, dst) GAT relations actually take the stacked
    path (>=2 in a group) and match per-relation numerics."""
    rng = np.random.default_rng(4)
    n = 60
    data = {
        ("n", f"rel{r}", "n"): (rng.integers(0, n, 150),
                                rng.integers(0, n, 150))
        for r in range(6)
    }
    g = dgl.heterograph(data, num_nodes_dict={"n": n})
    x = {"n": jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))}
    conv = dglnn.HeteroGraphConv({
        f"rel{r}": dglnn.GATConv(8, 4, num_heads=2) for r in range(6)
    }, aggregate="sum")
    params = conv.init(jax.random.PRNGKey(1), g, x)
    groups = conv.bind(params)._fused_gat_groups(g, x, {}, {})
    assert sum(len(v) for v in groups.values()) == 6
    got = conv.apply(params, g, x)
    config.set("fuse_multi_update_all", False)
    try:
        want = conv.apply(params, g, x)
    finally:
        config.set("fuse_multi_update_all", True)
    np.testing.assert_allclose(np.asarray(got["n"]),
                               np.asarray(want["n"]),
                               rtol=2e-5, atol=2e-5)
