"""Kernel correctness vs dense oracles + autodiff checks.

Mirrors reference ``tests/python/common/test_heterograph-kernel.py``: every
(op, reduce) combination is checked against a dense numpy reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.ops import gspmm, gsddmm, edge_softmax, segment_reduce, \
    segment_softmax, segment_mm, gather_mm

N, E, F = 23, 97, 5


@pytest.fixture(scope="module")
def gdata():
    rng = np.random.default_rng(42)
    row = rng.integers(0, N, E).astype(np.int32)
    col = rng.integers(0, N, E).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=N)
    x = rng.normal(size=(N, F)).astype(np.float32)
    e = rng.normal(size=(E, F)).astype(np.float32)
    return g, row, col, x, e


def ref_gspmm(row, col, op, red, x, e):
    msgs = {
        "add": lambda: x[row] + e,
        "sub": lambda: x[row] - e,
        "mul": lambda: x[row] * e,
        "div": lambda: x[row] / e,
        "copy_lhs": lambda: x[row],
        "copy_rhs": lambda: e,
    }[op]()
    out = np.zeros((N,) + msgs.shape[1:], np.float32)
    if red == "sum" or red == "mean":
        np.add.at(out, col, msgs)
        if red == "mean":
            deg = np.bincount(col, minlength=N).clip(1)
            out = out / deg[:, None]
        return out
    fill = -np.inf if red == "max" else np.inf
    out[:] = fill
    for i in range(len(col)):
        if red == "max":
            out[col[i]] = np.maximum(out[col[i]], msgs[i])
        else:
            out[col[i]] = np.minimum(out[col[i]], msgs[i])
    out[~np.isfinite(out)] = 0
    deg = np.bincount(col, minlength=N)
    out[deg == 0] = 0
    return out


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "copy_lhs",
                                "copy_rhs"])
@pytest.mark.parametrize("red", ["sum", "mean", "max", "min"])
def test_gspmm_all(gdata, op, red):
    g, row, col, x, e = gdata
    e_pos = np.abs(e) + 0.5  # avoid div blowups
    out = gspmm(g, op, red, jnp.asarray(x), jnp.asarray(e_pos))
    ref = ref_gspmm(row, col, op, red, x, e_pos)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("op,red", [("copy_lhs", "sum"), ("mul", "sum"),
                                    ("copy_lhs", "max"), ("add", "min")])
def test_gspmm_grads(gdata, op, red):
    g, row, col, x, e = gdata
    e_pos = np.abs(e) + 0.5

    def loss(x, e):
        return (gspmm(g, op, red, x, e) ** 2).sum()

    gx, ge = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x),
                                            jnp.asarray(e_pos))
    # finite differences on a few coordinates
    rng = np.random.default_rng(0)
    for _ in range(5):
        i, j = rng.integers(0, N), rng.integers(0, F)
        eps = 1e-3
        xp = x.copy(); xp[i, j] += eps
        xm = x.copy(); xm[i, j] -= eps
        fd = (loss(jnp.asarray(xp), jnp.asarray(e_pos))
              - loss(jnp.asarray(xm), jnp.asarray(e_pos))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gx)[i, j], float(fd),
                                   rtol=2e-2, atol=2e-2)


def test_gspmm_broadcast(gdata):
    g, row, col, x, e = gdata
    # edge scalar weight (E, 1) against (N, F) features
    w = np.abs(np.random.default_rng(3).normal(size=(E, 1))
               ).astype(np.float32)
    out = gspmm(g, "mul", "sum", jnp.asarray(x), jnp.asarray(w))
    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, col, x[row] * w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "dot"])
@pytest.mark.parametrize("lhs,rhs", [("u", "v"), ("u", "e"), ("e", "v"),
                                     ("v", "u")])
def test_gsddmm_all(gdata, op, lhs, rhs):
    g, row, col, x, e = gdata
    data = {"u": x[row], "v": x[col], "e": np.abs(e) + 0.5}
    lhs_input = {"u": x, "v": x, "e": np.abs(e) + 0.5}
    out = gsddmm(g, op, jnp.asarray(lhs_input[lhs]),
                 jnp.asarray(lhs_input[rhs]), lhs_target=lhs, rhs_target=rhs)
    a, b = data[lhs], data[rhs]
    ref = {
        "add": lambda: a + b,
        "sub": lambda: a - b,
        "mul": lambda: a * b,
        "div": lambda: a / b,
        "dot": lambda: (a * b).sum(-1, keepdims=True),
    }[op]()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_edge_softmax_dst(gdata):
    g, row, col, x, e = gdata
    score = e[:, :1]
    out = np.asarray(edge_softmax(g, jnp.asarray(score)))
    # oracle
    ref = np.zeros_like(score)
    for n in range(N):
        mask = col == n
        if mask.sum() == 0:
            continue
        s = score[mask]
        sm = np.exp(s - s.max(0))
        ref[mask] = sm / sm.sum(0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # rows sum to 1 per dst
    sums = np.zeros(N)
    np.add.at(sums, col, out[:, 0])
    deg = np.bincount(col, minlength=N)
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-5)


def test_edge_softmax_grad(gdata):
    g, row, col, x, e = gdata
    score = jnp.asarray(e[:, :1])

    def loss(s):
        return (edge_softmax(g, s) ** 3).sum()

    gr = jax.grad(loss)(score)
    eps = 1e-3
    rng = np.random.default_rng(1)
    s_np = np.asarray(score)
    for _ in range(5):
        i = rng.integers(0, E)
        sp = s_np.copy(); sp[i, 0] += eps
        sm = s_np.copy(); sm[i, 0] -= eps
        fd = (loss(jnp.asarray(sp)) - loss(jnp.asarray(sm))) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(gr)[i, 0]), float(fd),
                                   rtol=3e-2, atol=3e-3)


def test_edge_softmax_by_src(gdata):
    g, row, col, x, e = gdata
    out = np.asarray(edge_softmax(g, jnp.asarray(e[:, :1]), norm_by="src"))
    sums = np.zeros(N)
    np.add.at(sums, row, out[:, 0])
    deg = np.bincount(row, minlength=N)
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-5)


def test_segment_reduce():
    seglen = jnp.array([3, 0, 2, 4])
    x = jnp.arange(9.0).reshape(9, 1)
    out = segment_reduce(seglen, x, "sum")
    np.testing.assert_allclose(np.asarray(out).ravel(), [3, 0, 7, 26])
    out = segment_reduce(seglen, x, "max")
    np.testing.assert_allclose(np.asarray(out).ravel(), [2, 0, 4, 8])
    out = segment_reduce(seglen, x, "mean")
    np.testing.assert_allclose(np.asarray(out).ravel(), [1, 0, 3.5, 6.5])


def test_segment_softmax():
    seglen = jnp.array([2, 3])
    x = jnp.array([[1.0], [1.0], [0.0], [0.0], [0.0]])
    out = np.asarray(segment_softmax(seglen, x)).ravel()
    np.testing.assert_allclose(out[:2], 0.5)
    np.testing.assert_allclose(out[2:], 1 / 3, rtol=1e-6)


def test_segment_mm():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 4)).astype(np.float32)
    b = rng.normal(size=(3, 4, 6)).astype(np.float32)
    seglen = np.array([4, 0, 6], np.int32)
    out = segment_mm(jnp.asarray(a), jnp.asarray(b), jnp.asarray(seglen))
    ref = np.concatenate([a[:4] @ b[0], a[4:] @ b[2]])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gather_mm():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 4)).astype(np.float32)
    b = rng.normal(size=(3, 4, 6)).astype(np.float32)
    idx = rng.integers(0, 3, 10).astype(np.int32)
    out = gather_mm(jnp.asarray(a), jnp.asarray(b), idx_b=jnp.asarray(idx))
    ref = np.stack([a[i] @ b[idx[i]] for i in range(10)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gather_mm_grad():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3, 4, 6)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 3, 10).astype(np.int32))

    def loss(a, b):
        return (gather_mm(a, b, idx_b=idx) ** 2).sum()

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gb)).all()


def test_generated_op_names():
    import dgl_tpu.ops as ops
    assert hasattr(ops, "u_mul_e_sum")
    assert hasattr(ops, "copy_u_sum")
    assert hasattr(ops, "u_dot_v")
    assert hasattr(ops, "u_add_v")
    g = dgl.graph(([0, 1], [1, 0]))
    x = jnp.ones((2, 3))
    out = ops.copy_u_sum(g, x)
    assert out.shape == (2, 3)


def test_udf_vs_builtin(gdata):
    g, row, col, x, e = gdata
    import dgl_tpu.function as fn
    g = g.clone()
    g.ndata["h"] = jnp.asarray(x)
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "o1"))
    g.update_all(lambda edges: {"m": edges.src["h"]},
                 lambda nodes: {"o2": nodes.mailbox["m"].sum(axis=1)})
    np.testing.assert_allclose(np.asarray(g.ndata["o1"]),
                               np.asarray(g.ndata["o2"]), rtol=1e-5,
                               atol=1e-5)


def test_edgeflat_ops_match_reference():
    """Flat (E*H,) edge layout ops agree with the (E,H,1) reference path."""
    import numpy as np
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu.ops import gsddmm, edge_softmax_unit, gspmm
    from dgl_tpu.ops.edgeflat import (sddmm_flat, edge_softmax_flat,
                                      spmm_mul_flat)

    rng = np.random.default_rng(0)
    n, e, H, F = 40, 200, 3, 5
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    unit = g.unit()
    el = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    # sddmm add
    want = np.asarray(gsddmm(g, "add", el[:, :, None], er[:, :, None],
                             "u", "v")).reshape(e, H)
    got = np.asarray(sddmm_flat(unit, "add", el, er)).reshape(e, H)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # softmax
    s = jnp.asarray(rng.normal(size=(e, H)).astype(np.float32))
    want = np.asarray(edge_softmax_unit(unit, s[:, :, None])).reshape(e, H)
    got = np.asarray(edge_softmax_flat(unit, s.reshape(-1), H)
                     ).reshape(e, H)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # weighted aggregation
    x = jnp.asarray(rng.normal(size=(n, H, F)).astype(np.float32))
    w = jnp.asarray(rng.random((e, H)).astype(np.float32))
    want = np.asarray(gspmm(unit, "mul", "sum", x, w[:, :, None]))
    got = np.asarray(spmm_mul_flat(unit, x, w.reshape(-1), H))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gatconv_flat_path_matches():
    """GATConv produces identical output through the flat-edge fast path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.utils import config

    rng = np.random.default_rng(1)
    n, e = 50, 300
    g = dgl.add_self_loop(dgl.graph(
        (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    mod = dglnn.GATConv(6, 4, num_heads=2)
    params = mod.init(jax.random.PRNGKey(0), g, x)
    out_std = mod.apply(params, g, x)
    old = config.get("pallas_spmm_min_edges")
    try:
        config.set("pallas_spmm_min_edges", 1)   # force the flat path
        out_flat = mod.apply(params, g, x)
    finally:
        config.set("pallas_spmm_min_edges", old)
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_std),
                               rtol=1e-4, atol=1e-5)
