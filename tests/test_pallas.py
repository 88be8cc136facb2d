"""Pallas tiled-SpMM format + kernel tests.

The kernel itself needs TPU hardware; on CPU we verify the format builder
and run the kernel in interpreter mode.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import dgl_tpu.ops.pallas.tiled_spmm as ts
import dgl_tpu.ops.pallas.gat_fused as gf


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)
        monkeypatch.setattr(ts.pl, "pallas_call", patched)
        monkeypatch.setattr(gf.pl, "pallas_call", patched)
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


def test_multihead_spmm_and_sddmm():
    """Multihead tiled SpMM / SDDMM-dot vs dense oracles."""
    rng = np.random.default_rng(0)
    N, E, H, Fh = 300, 2000, 4, 8
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=256)
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    w2 = rng.random((E, H)).astype(np.float32)

    from dgl_tpu.ops.edgeflat import _w_slot_from_flat
    w_slot = _w_slot_from_flat(tf, jnp.asarray(w2.reshape(-1)), H)
    out = np.asarray(ts.tiled_spmm_multihead(tf, x, w_slot, H, Fh))
    want = np.zeros((N, H, Fh), np.float32)
    xn = np.asarray(x)
    for e in range(E):
        want[col[e]] += w2[e][:, None] * xn[row[e]]
    np.testing.assert_allclose(out, want, rtol=5e-2, atol=1e-2)

    z = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    e_slot = np.asarray(ts.tiled_sddmm_dot_multihead(tf, x, z, H, Fh))
    eid = np.asarray(tf.eid)
    zn = np.asarray(z)
    got = np.zeros((E, H), np.float32)
    B, C = e_slot.shape[0], e_slot.shape[2]
    for b in range(B):
        for c in range(C):
            k = eid[b * C + c]
            if k >= 0:
                got[k] = e_slot[b, :, c]
    want_e = np.einsum("ehf,ehf->eh", xn[row], zn[col])
    # bf16 MXU dots: absolute error ~ sqrt(Fh) * 2^-8
    np.testing.assert_allclose(got, want_e, rtol=5e-2, atol=6e-2)


def test_multihead_vjp_grads():
    """Gradients of the multihead fused path match the XLA fallback."""
    import dgl_tpu as dgl
    from dgl_tpu.ops.edgeflat import spmm_mul_flat
    from dgl_tpu.utils import config

    rng = np.random.default_rng(1)
    N, E, H, Fh = 120, 900, 2, 4
    g = dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)),
                  num_nodes=N)
    unit = g.unit()
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    w = jnp.asarray(rng.random(E * H).astype(np.float32))

    def loss(x, w, forced):
        old = config.get("pallas_spmm_min_edges")
        config.set("pallas_spmm_min_edges", 1 if forced else 10**9)
        try:
            out = spmm_mul_flat(unit, x, w, H)
        finally:
            config.set("pallas_spmm_min_edges", old)
        return (out ** 2).sum()

    gx_t, gw_t = jax.grad(lambda x, w: loss(x, w, True),
                          argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(lambda x, w: loss(x, w, False),
                          argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_r),
                               rtol=5e-2, atol=6e-2)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r),
                               rtol=5e-2, atol=6e-2)


def test_gat_fused_matches_reference():
    """Fused slot-space GAT == the unfused edge-softmax composition,
    values and all three gradients."""
    import dgl_tpu as dgl
    from dgl_tpu.ops.pallas.gat_fused import gat_attention_aggregate
    from dgl_tpu.ops import gsddmm, edge_softmax_unit, gspmm

    rng = np.random.default_rng(0)
    N, E, H, Fh = 260, 1500, 4, 8
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    unit = g.unit()
    tf, _ = unit.tiled_format(tile=256, cap=256)
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    slope = 0.2

    def ref(el, er, x):
        e = gsddmm(unit, "add", el[:, :, None], er[:, :, None], "u", "v")
        e = jnp.where(e >= 0, e, slope * e)
        a = edge_softmax_unit(unit, e)
        return gspmm(unit, "mul", "sum", x, a)

    def fused(el, er, x):
        return gat_attention_aggregate(tf, el, er, x, H, Fh, slope)

    out_r = ref(el, er, x)
    out_f = fused(el, er, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=5e-2, atol=6e-2)

    def loss(f):
        return lambda el, er, x: (f(el, er, x) ** 2).sum()

    gr = jax.grad(loss(ref), argnums=(0, 1, 2))(el, er, x)
    gfu = jax.grad(loss(fused), argnums=(0, 1, 2))(el, er, x)
    # del/der involve lrelu' — edges whose raw score lands within bf16
    # rounding of the kink can flip the subgradient branch (measured: one
    # edge at raw=-6e-4).  Require 99.5% elementwise agreement there and
    # strict agreement for dx (continuous through the kink).
    for a, b, name in zip(gfu[:2], gr[:2], ("del", "der")):
        d = np.abs(np.asarray(a) - np.asarray(b))
        tol = 2e-1 + 8e-2 * np.abs(np.asarray(b))
        assert (d > tol).mean() < 0.005, name
    np.testing.assert_allclose(np.asarray(gfu[2]), np.asarray(gr[2]),
                               rtol=8e-2, atol=2e-1, err_msg="dx")


def test_dot_gat_fused_matches_reference():
    """Fused dot-product attention == unfused composition, + grads."""
    import dgl_tpu as dgl
    from dgl_tpu.ops.pallas.gat_fused import dot_gat_attention_aggregate
    from dgl_tpu.ops import gsddmm, edge_softmax_unit, gspmm

    rng = np.random.default_rng(3)
    N, E, H, D = 260, 1500, 2, 8
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    unit = g.unit()
    tf, _ = unit.tiled_format(tile=256, cap=256)
    q = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))

    def ref(q, k, x):
        e = gsddmm(unit, "dot", k, q, "u", "v") / np.sqrt(D)
        a = edge_softmax_unit(unit, e)
        return gspmm(unit, "mul", "sum", x, a)

    def fused(q, k, x):
        return dot_gat_attention_aggregate(tf, q, k, x, H, D, D)

    np.testing.assert_allclose(np.asarray(fused(q, k, x)),
                               np.asarray(ref(q, k, x)),
                               rtol=5e-2, atol=6e-2)
    gr = jax.grad(lambda q, k, x: (ref(q, k, x) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, x)
    gf = jax.grad(lambda q, k, x: (fused(q, k, x) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, x)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dx")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-2, atol=2e-1, err_msg=name)


def test_gatv2_fused_matches_reference():
    """Fused GATv2 == unfused composition (values + dU/dV/dx/da)."""
    import dgl_tpu as dgl
    from dgl_tpu.ops.pallas.gat_fused import gatv2_attention_aggregate
    from dgl_tpu.ops import gsddmm, edge_softmax_unit, gspmm

    rng = np.random.default_rng(7)
    N, E, H, D = 260, 1500, 2, 8
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    unit = g.unit()
    tf, _ = unit.tiled_format(tile=256, cap=256)
    U = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32))
    slope = 0.2

    def ref(U, V, attn):
        e = gsddmm(unit, "add", U, V, "u", "v")            # (E, H, D)
        e = jnp.where(e >= 0, e, slope * e)
        e = (e * attn[None]).sum(-1, keepdims=True)        # (E, H, 1)
        a = edge_softmax_unit(unit, e)
        return gspmm(unit, "mul", "sum", U, a)

    def fused(U, V, attn):
        return gatv2_attention_aggregate(tf, U, V, U, attn, H, D, D,
                                         slope)

    np.testing.assert_allclose(np.asarray(fused(U, V, attn)),
                               np.asarray(ref(U, V, attn)),
                               rtol=5e-2, atol=6e-2)
    gr = jax.grad(lambda U, V, a: (ref(U, V, a) ** 2).sum(),
                  argnums=(0, 1, 2))(U, V, attn)
    gf = jax.grad(lambda U, V, a: (fused(U, V, a) ** 2).sum(),
                  argnums=(0, 1, 2))(U, V, attn)
    # lrelu-kink-aware agreement for the attention-path grads; da
    # accumulates bf16 products of exp-scale magnitudes -> wider rtol
    for a, b, name, rt in zip(gf, gr, ("dU", "dV", "da"),
                              (8e-2, 8e-2, 2e-1)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        tol = 2.5e-1 + rt * np.abs(np.asarray(b))
        assert (d > tol).mean() < 0.01, (name, float(d.max()))


def test_attention_modules_fused_dispatch_matches():
    """GATConv / GATv2Conv / DotGatConv produce the same outputs through
    the fused slot-space dispatch as through the unfused path."""
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.utils import config
    import flax.linen as nn

    rng = np.random.default_rng(11)
    N, E = 300, 2000
    g = dgl.add_self_loop(dgl.graph(
        (rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N))
    g.unit().tiled_format(tile=256, cap=256)
    x = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))

    for mod in (dglnn.GATConv(12, 6, num_heads=2),
                dglnn.GATv2Conv(12, 6, num_heads=2),
                dglnn.DotGatConv(12, 6, num_heads=2)):
        params = mod.init(jax.random.PRNGKey(0), g, x)
        old = config.get("pallas_spmm_min_edges")
        try:
            config.set("pallas_spmm_min_edges", 10 ** 9)
            out_ref = mod.apply(params, g, x)
            config.set("pallas_spmm_min_edges", 1)
            out_fused = mod.apply(params, g, x)
        finally:
            config.set("pallas_spmm_min_edges", old)
        d = np.abs(np.asarray(out_fused) - np.asarray(out_ref))
        tol = 6e-2 + 5e-2 * np.abs(np.asarray(out_ref))
        assert (d > tol).mean() < 0.005, type(mod).__name__


def test_slot_edge_weights_and_static_spmm():
    """Pre-permuted slot weights: forward + grad match the gather path."""
    import dgl_tpu.ops.pallas.spmm as ps
    rng = np.random.default_rng(5)
    N, E, F = 500, 3000, 32
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    w = (rng.random(E).astype(np.float32) + 0.5)
    tf = ts.build_tiled_format(row, col, N, N, tile=256, cap=256)
    tfr = ts.build_tiled_format(col, row, N, N, tile=256, cap=256)
    wsf = ts.slot_edge_weights(tf, jnp.asarray(w))
    wsr = ts.slot_edge_weights(tfr, jnp.asarray(w))
    # slot layout: scatter back by eid reproduces w
    eids = np.asarray(tf.eid).reshape(-1)
    vals = np.asarray(wsf).reshape(-1)
    got = np.zeros(E, np.float32)
    got[eids[eids >= 0]] = vals[eids >= 0]
    np.testing.assert_allclose(got, w, rtol=1e-6)

    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, col, x[row] * w[:, None])
    out = ps._spmm_tiled_static(tf, tfr, wsf, wsr, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)

    # dX through the static path == dX through the mul path
    def f_static(xx):
        return ps._spmm_tiled_static(tf, tfr, wsf, wsr, xx).sum()

    dz = np.ones((N, F), np.float32)
    dx_ref = np.zeros((N, F), np.float32)
    np.add.at(dx_ref, row, dz[col] * w[:, None])
    dx = jax.grad(f_static)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=5e-2, rtol=5e-2)


def test_unitgraph_cache_edge_weights_roundtrip():
    import dgl_tpu
    rng = np.random.default_rng(6)
    N, E = 400, 2500
    g = dgl_tpu.graph((rng.integers(0, N, E), rng.integers(0, N, E)),
                      num_nodes=N)
    w = jnp.asarray(rng.random(E).astype(np.float32))
    g.edata["w"] = w
    g.cache_edge_weights("w")
    unit = g.unit()
    assert "w" in unit._slot_weights
    wsf, wsr, ref = unit._slot_weights["w"]
    assert wsf.shape == unit._tiled.valid.shape
    assert ref is w  # staleness fingerprint = the cached edata object
    g.unit().uncache_edge_weights("w")
    assert "w" not in unit._slot_weights


def test_egat_attention_aggregate_matches_oracle():
    """Fused additive-edge-bias attention (raw = el[u]+er[v]+ee_e):
    forward + all four gradients vs the dense oracle."""
    rng = np.random.default_rng(9)
    N, E, H, Fh = 500, 3000, 2, 32
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    tf = ts.build_tiled_format(row, col, N, N, tile=256,
                               cap=256).with_src_first()
    el2 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * 0.3)
    er2 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * 0.3)
    ee = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32) * 0.3)
    x3 = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    slope = 0.2

    from dgl_tpu.ops.edgeflat import _w_slot_from_flat
    ee_slot = _w_slot_from_flat(tf, ee.reshape(-1), H)

    def fused(el2, er2, ee_slot, x3):
        return gf.egat_attention_aggregate(tf, el2, er2, ee_slot, x3,
                                           H, Fh, slope)

    out = fused(el2, er2, ee_slot, x3)

    # dense oracle
    def oracle(el2, er2, ee, x3):
        raw = el2[row] + er2[col] + ee                       # (E, H)
        lr = jnp.where(raw >= 0, raw, slope * raw)
        p = jnp.exp(jnp.clip(lr, -40, 40))
        den = jax.ops.segment_sum(p, jnp.asarray(col), num_segments=N)
        num = jax.ops.segment_sum(p[..., None] * x3[row],
                                  jnp.asarray(col), num_segments=N)
        return num / jnp.maximum(den, 1e-20)[..., None]

    ref = oracle(el2, er2, ee, x3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)

    # gradients: compare fused (through the slot permutation) vs oracle
    def loss_fused(el2, er2, ee, x3):
        es = _w_slot_from_flat(tf, ee.reshape(-1), H)
        return (fused(el2, er2, es, x3) ** 2).sum()

    def loss_ref(el2, er2, ee, x3):
        return (oracle(el2, er2, ee, x3) ** 2).sum()

    gf_ = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(el2, er2, ee, x3)
    gr_ = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(el2, er2, ee, x3)
    # bf16 contractions of exp-scale terms leave rare cancellation
    # outliers (<=0.5% of elements here; the PLAIN fused-GAT path shows
    # the same outliers at this size, so this is kernel-family noise,
    # not an ee-path defect): bound bulk accuracy + outlier fraction
    for a, b, name in zip(gf_, gr_, ["del", "der", "dee", "dx"]):
        a = np.asarray(a)
        b = np.asarray(b)
        ok = np.isclose(a, b, atol=2e-1, rtol=8e-2)
        assert ok.mean() >= 0.99, (name, 1 - ok.mean())
        assert np.median(np.abs(a - b)) < 2e-2, name


def test_hybrid_spmm_matches_oracle():
    import dgl_tpu.ops.pallas.hybrid as hb
    if jax.default_backend() != "tpu":
        import unittest.mock as mock
        orig = pl.pallas_call
        patcher = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patcher.start()
    try:
        rng = np.random.default_rng(7)
        N, F = 900, 32
        # heavy-tailed dst: node 0..9 are hubs
        hub_dst = rng.integers(0, 10, 3000)
        rest_dst = rng.integers(0, N, 2000)
        col = np.concatenate([hub_dst, rest_dst])
        row = rng.integers(0, N, len(col))
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        hf = hb.build_hybrid_format(row, col, N, N, k_dense=16,
                                    min_degree=64, tile=256, cap=256)
        assert hf.k >= 10
        out = np.asarray(hb.hybrid_spmm(hf, x))
        oracle = np.zeros((N, F), np.float32)
        np.add.at(oracle, col, np.asarray(x)[row])
        # hub rows sum ~300 bf16 terms: abs error grows with the sum
        np.testing.assert_allclose(out, oracle, rtol=5e-2, atol=2e-1)

        # gradient vs dense oracle
        g = jax.grad(lambda v: (hb.hybrid_spmm(hf, v) ** 2).sum())(x)
        g_ref = jax.grad(lambda v: ((jnp.asarray(oracle) * 0 +
                                     _dense_spmm(row, col, N, v)) ** 2
                                    ).sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=5e-2, atol=2.0)
    finally:
        if jax.default_backend() != "tpu":
            patcher.stop()


def _dense_spmm(row, col, N, x):
    return jax.ops.segment_sum(jnp.take(x, jnp.asarray(row), axis=0),
                               jnp.asarray(col), num_segments=N)


def test_tiled_spmm_chunked(monkeypatch):
    """Bucket-chunked multi-call path (SMEM limit at Reddit scale):
    forced tiny chunks must match the oracle, incl. empty dst tiles."""
    monkeypatch.setattr(ts, "MAX_BUCKETS_PER_CALL", 4)
    rng = np.random.default_rng(11)
    N, E, F = 1500, 6000, 32
    row = rng.integers(0, N, E)
    # leave tiles [512, 1024) empty to exercise the covered mask
    col = np.where(rng.uniform(size=E) < 0.5,
                   rng.integers(0, 512, E), rng.integers(1024, N, E))
    x = rng.normal(size=(N, F)).astype(np.float32)
    tf = ts.build_tiled_format(row, col, N, N, tile=512, cap=128)
    assert tf.chunk_ranges is not None and len(tf.chunk_ranges) > 1
    assert tf.covered_mask is not None
    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, col, x[row])
    out = ts.tiled_spmm(tf, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)
    # weighted path through the same chunking
    w = rng.random(E).astype(np.float32)
    ref2 = np.zeros((N, F), np.float32)
    np.add.at(ref2, col, x[row] * w[:, None])
    out2 = ts.tiled_spmm(tf, jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=5e-2,
                               rtol=5e-2)


def test_egatconv_fused_matches_oracle():
    """Fused EGATConv (lrelu INSIDE the attn dot, slot-space edge term):
    forward + all five gradients vs the dense composition."""
    from dgl_tpu.ops.pallas.gat_fused import (
        egatconv_attention_aggregate, slot_edge_tensor, _lane_pad)

    rng = np.random.default_rng(3)
    N, E, H, De, Fh = 260, 1600, 2, 8, 8
    slope = 0.2
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    tf = ts.build_tiled_format(row, col, N, N, tile=256,
                               cap=256).with_src_first()
    fni = jnp.asarray(rng.normal(size=(N, H, De)).astype(np.float32) * .4)
    fnj = jnp.asarray(rng.normal(size=(N, H, De)).astype(np.float32) * .4)
    fe = jnp.asarray(rng.normal(size=(E, H, De)).astype(np.float32) * .4)
    attn = jnp.asarray(rng.normal(size=(H, De)).astype(np.float32) * .4)
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))

    D_pad = _lane_pad(H, De)
    fe_wide = jnp.zeros((E, H, D_pad)).at[:, :, :De].set(fe)
    fe_slot = slot_edge_tensor(tf, np.asarray(
        fe_wide.reshape(E, H * D_pad)), H * D_pad)

    def fused(fni, fnj, fe_slot, attn, x):
        return egatconv_attention_aggregate(
            tf, fni, fnj, fe_slot, attn, x, H, De, Fh, slope)

    def dense(fni, fnj, fe, attn, x):
        raw = fni[row] + fnj[col] + fe                  # (E, H, De)
        f_out = jax.nn.leaky_relu(raw, slope)
        e = (f_out * attn[None]).sum(-1)                # (E, H)
        p = jnp.exp(e)
        den = jax.ops.segment_sum(p, jnp.asarray(col), num_segments=N)
        num = jax.ops.segment_sum(p[:, :, None] * x[row],
                                  jnp.asarray(col), num_segments=N)
        return num / jnp.maximum(den, 1e-20)[:, :, None]

    out_f = np.asarray(fused(fni, fnj, fe_slot, attn, x))
    out_d = np.asarray(dense(fni, fnj, fe, attn, x))
    deg = np.bincount(col, minlength=N) > 0
    np.testing.assert_allclose(out_f[deg], out_d[deg], rtol=6e-2,
                               atol=6e-2)

    def loss_f(args):
        return (fused(*args, x) ** 2).sum()

    def loss_d(args):
        return (dense(*args, x) ** 2).sum()

    gf_ = jax.grad(loss_f)((fni, fnj, fe_slot, attn))
    gd_ = jax.grad(loss_d)((fni, fnj, fe, attn))
    # bf16 MXU accumulation: a few elements land ~0.1-0.2 abs off
    np.testing.assert_allclose(np.asarray(gf_[0]), np.asarray(gd_[0]),
                               rtol=6e-2, atol=2e-1)   # dFNI
    np.testing.assert_allclose(np.asarray(gf_[1]), np.asarray(gd_[1]),
                               rtol=6e-2, atol=2e-1)   # dFNJ
    np.testing.assert_allclose(np.asarray(gf_[3]), np.asarray(gd_[3]),
                               rtol=6e-2, atol=2e-1)   # dattn
    # dFE comes back in slot space: scatter the dense dFE into slots
    dfe_slot_want = np.asarray(slot_edge_tensor(
        tf, np.asarray(jnp.zeros((E, H, D_pad)).at[:, :, :De].set(
            gd_[2]).reshape(E, H * D_pad)), H * D_pad))
    np.testing.assert_allclose(np.asarray(gf_[2]), dfe_slot_want,
                               rtol=6e-2, atol=2e-1)
    # dx
    gx_f = jax.grad(lambda x: (fused(fni, fnj, fe_slot, attn, x)
                               ** 2).sum())(x)
    gx_d = jax.grad(lambda x: (dense(fni, fnj, fe, attn, x)
                               ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_d),
                               rtol=6e-2, atol=2e-1)


def test_hybrid_format_disk_cache_roundtrip(tmp_path):
    """cache_path write + load reproduces identical outputs/grads."""
    import dgl_tpu.ops.pallas.hybrid as hb
    if jax.default_backend() != "tpu":
        import unittest.mock as mock
        orig = pl.pallas_call
        patcher = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patcher.start()
    try:
        rng = np.random.default_rng(3)
        N = 900
        col = np.concatenate([rng.integers(0, 10, 3000),
                              rng.integers(0, N, 2000)]).astype(np.int32)
        row = rng.integers(0, N, len(col)).astype(np.int32)
        x = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
        path = str(tmp_path / "hf.npz")
        kw = dict(k_dense=16, min_degree=64, tile=256, cap=256,
                  cache_path=path)
        hf1 = hb.build_hybrid_format(row, col, N, N, **kw)
        assert os.path.exists(path)
        hf2 = hb.build_hybrid_format(row, col, N, N, **kw)  # loads cache
        np.testing.assert_array_equal(
            np.asarray(hb.hybrid_spmm(hf1, x)),
            np.asarray(hb.hybrid_spmm(hf2, x)))
        g1 = jax.grad(lambda v: hb.hybrid_spmm(hf1, v).sum())(x)
        g2 = jax.grad(lambda v: hb.hybrid_spmm(hf2, v).sum())(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    finally:
        if jax.default_backend() != "tpu":
            patcher.stop()


def test_hybrid_multires_matches_oracle(tmp_path):
    """Multi-resolution routing (dense pairs at small T + catch-all)
    reproduces the dense oracle for outputs and grads, and roundtrips
    through the disk cache."""
    import dgl_tpu.ops.pallas.hybrid as hb
    if jax.default_backend() != "tpu":
        import unittest.mock as mock
        orig = pl.pallas_call
        patcher = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patcher.start()
    try:
        rng = np.random.default_rng(11)
        N = 1024
        # strata: hub dst rows + one dense community block + sparse rest
        col = np.concatenate([
            rng.integers(0, 8, 2000),                      # hubs
            rng.integers(256, 512, 6000),                  # dense block dst
            rng.integers(0, N, 1500)]).astype(np.int32)    # scattered
        row = np.concatenate([
            rng.integers(0, N, 2000),
            rng.integers(256, 512, 6000),                  # dense block src
            rng.integers(0, N, 1500)]).astype(np.int32)
        x = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
        path = str(tmp_path / "mr.npz")
        kw = dict(k_dense=8, min_degree=64,
                  multires=((128, 128), (512, 128)), fill_min=0.5,
                  cache_path=path)
        hf = hb.build_hybrid_format(row, col, N, N, **kw)
        assert isinstance(hf.tf_fwd, tuple) and len(hf.tf_fwd) == 2
        out = np.asarray(hb.hybrid_spmm(hf, x))
        oracle = np.zeros((N, 16), np.float32)
        np.add.at(oracle, col, np.asarray(x)[row])
        np.testing.assert_allclose(out, oracle, rtol=5e-2, atol=2e-1)
        g = jax.grad(lambda v: (hb.hybrid_spmm(hf, v) ** 2).sum())(x)
        g_ref = jax.grad(lambda v: (_dense_spmm(row, col, N, v) ** 2
                                    ).sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=5e-2, atol=2.0)
        # cache roundtrip preserves levels + outputs exactly
        hf2 = hb.build_hybrid_format(row, col, N, N, **kw)
        assert isinstance(hf2.tf_fwd, tuple) and len(hf2.tf_fwd) == 2
        np.testing.assert_array_equal(out,
                                      np.asarray(hb.hybrid_spmm(hf2, x)))
    finally:
        if jax.default_backend() != "tpu":
            patcher.stop()


def test_edgegat_fused_matches_oracle():
    """Fused EdgeGATConv (additive scalar logits, slot-space edge
    message): forward + all five gradients vs the dense composition."""
    from dgl_tpu.ops.pallas.gat_fused import (
        edgegat_attention_aggregate, slot_edge_tensor, _lane_pad)

    rng = np.random.default_rng(5)
    N, E, H, Fh = 260, 1600, 2, 8
    slope = 0.2
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    tf = ts.build_tiled_format(row, col, N, N, tile=256,
                               cap=256).with_src_first()
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * .4)
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * .4)
    ee = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32) * .4)
    fe = jnp.asarray(rng.normal(size=(E, H, Fh)).astype(np.float32) * .5)
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))

    Fh_pad = _lane_pad(H, Fh)
    ee_slot = jnp.transpose(
        slot_edge_tensor(tf, np.asarray(ee), H), (0, 2, 1))  # (B, H, C)
    fe_wide = jnp.zeros((E, H, Fh_pad)).at[:, :, :Fh].set(fe)
    fe_slot = slot_edge_tensor(tf, np.asarray(
        fe_wide.reshape(E, H * Fh_pad)), H * Fh_pad).astype(jnp.bfloat16)

    def fused(el, er, ee_slot, fe_slot, x):
        return edgegat_attention_aggregate(
            tf, el, er, ee_slot, fe_slot, x, H, Fh, slope)

    def dense(el, er, ee, fe, x):
        raw = el[row] + er[col] + ee                     # (E, H)
        p = jnp.exp(jax.nn.leaky_relu(raw, slope))
        den = jax.ops.segment_sum(p, jnp.asarray(col), num_segments=N)
        num = jax.ops.segment_sum(p[:, :, None] * (x[row] + fe),
                                  jnp.asarray(col), num_segments=N)
        return num / jnp.maximum(den, 1e-20)[:, :, None]

    out_f = np.asarray(fused(el, er, ee_slot, fe_slot, x))
    out_d = np.asarray(dense(el, er, ee, fe, x))
    deg = np.bincount(col, minlength=N) > 0
    np.testing.assert_allclose(out_f[deg], out_d[deg], rtol=6e-2,
                               atol=6e-2)

    gf_ = jax.grad(lambda a: (fused(*a, x) ** 2).sum())(
        (el, er, ee_slot, fe_slot))
    gd_ = jax.grad(lambda a: (dense(*a, x) ** 2).sum())(
        (el, er, ee, fe))
    np.testing.assert_allclose(np.asarray(gf_[0]), np.asarray(gd_[0]),
                               rtol=6e-2, atol=2e-1)   # del
    np.testing.assert_allclose(np.asarray(gf_[1]), np.asarray(gd_[1]),
                               rtol=6e-2, atol=2e-1)   # der
    # dee comes back in slot space (B, H, C)
    dee_want = np.transpose(np.asarray(slot_edge_tensor(
        tf, np.asarray(gd_[2]), H)), (0, 2, 1))
    np.testing.assert_allclose(np.asarray(gf_[2]), dee_want,
                               rtol=6e-2, atol=2e-1)
    # dfe comes back in slot space (B, C, H*Fh_pad) bf16
    dfe_want = np.asarray(slot_edge_tensor(
        tf, np.asarray(jnp.zeros((E, H, Fh_pad)).at[:, :, :Fh].set(
            gd_[3]).reshape(E, H * Fh_pad)), H * Fh_pad))
    np.testing.assert_allclose(np.asarray(gf_[3]).astype(np.float32),
                               dfe_want, rtol=8e-2, atol=2e-1)
    gx_f = jax.grad(lambda x: (fused(el, er, ee_slot, fe_slot, x)
                               ** 2).sum())(x)
    gx_d = jax.grad(lambda x: (dense(el, er, ee, fe, x) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_d),
                               rtol=6e-2, atol=2e-1)


def test_int8_matmul_interpret():
    """int8 streaming matmul (both orientations) vs numpy, interpret
    mode on CPU."""
    import dgl_tpu.ops.pallas.int8mm as i8
    orig = pl.pallas_call
    if jax.default_backend() != "tpu":
        import unittest.mock as mock
        patcher = mock.patch.object(
            i8.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patcher.start()
    try:
        rng = np.random.default_rng(0)
        K, N, F = 64, 300, 16
        a = rng.integers(0, 4, (K, N)).astype(np.int8)
        ap = jnp.asarray(i8.pad_int8_block(a, bk=64, bn=128))
        # block sizes: monkeypatch small blocks for the tiny test
        i8.BK, i8.BN = 64, 128
        x = rng.normal(size=(N, F)).astype(np.float32)
        z = rng.normal(size=(K, F)).astype(np.float32)
        out = np.asarray(i8.int8_matmul(ap, jnp.asarray(x)))[:K]
        ref = a.astype(np.float32) @ x
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-1)
        out_t = np.asarray(i8.int8_matmul(ap, jnp.asarray(z),
                                          contract_rows=True))[:N]
        ref_t = a.astype(np.float32).T @ z
        np.testing.assert_allclose(out_t, ref_t, rtol=2e-2, atol=2e-1)
    finally:
        i8.BK, i8.BN = 1024, 2048
        if jax.default_backend() != "tpu":
            patcher.stop()


def test_hybrid_int8_fallback_matches_dense():
    """HybridFormat now holds int8 hub blocks; the CPU fallback upcast
    path must match the dense oracle (fwd + grad)."""
    import dgl_tpu.ops.pallas.hybrid as hb
    import unittest.mock as mock
    rng = np.random.default_rng(7)
    N, E, F = 500, 8000, 8
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        hf = hb.build_hybrid_format(row, col, N, N, k_dense=32,
                                    min_degree=1, tile=256, cap=256)
        assert hf.a_dense.dtype == jnp.int8
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        out = np.asarray(hb.hybrid_spmm(hf, x))
        dense = np.zeros((N, N), np.float32)
        np.add.at(dense, (col, row), 1.0)
        ref = dense @ np.asarray(x)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-1)
        g = jax.grad(lambda x: (hb.hybrid_spmm(hf, x) ** 2).sum())(x)
        xd = np.asarray(x)
        gref = 2 * dense.T @ (dense @ xd)
        np.testing.assert_allclose(np.asarray(g), gref, rtol=5e-2,
                                   atol=2.0)
    finally:
        if jax.default_backend() != "tpu":
            patch.stop()


def test_hybrid_symmetric_matches_dense():
    """symmetric=True: one int8 hub block serves rows AND columns; the
    VJP is the forward.  Oracle vs dense matmul (fwd + grad)."""
    import dgl_tpu.ops.pallas.hybrid as hb
    import unittest.mock as mock
    rng = np.random.default_rng(11)
    N, Eh, F = 400, 4000, 8
    # symmetric edge multiset: sample half, emit both directions
    r = rng.integers(0, N, Eh)
    c = rng.integers(0, N, Eh)
    row = np.concatenate([r, c])
    col = np.concatenate([c, r])
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        hf = hb.build_hybrid_format(row, col, N, N, k_dense=48,
                                    min_degree=1, tile=256, cap=256,
                                    symmetric=True)
        assert hf.symmetric and hf.tf_rev is hf.tf_fwd
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        out = np.asarray(hb.hybrid_spmm(hf, x))
        dense = np.zeros((N, N), np.float32)
        np.add.at(dense, (col, row), 1.0)
        np.testing.assert_allclose(dense, dense.T)   # sanity: symmetric
        ref = dense @ np.asarray(x)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-1)
        g = jax.grad(lambda x: (hb.hybrid_spmm(hf, x) ** 2).sum())(x)
        gref = 2 * dense.T @ (dense @ np.asarray(x))
        np.testing.assert_allclose(np.asarray(g), gref, rtol=5e-2,
                                   atol=2.0)
    finally:
        if jax.default_backend() != "tpu":
            patch.stop()


def test_hybrid_symmetric_disk_cache_roundtrip(tmp_path):
    """symmetric cache: rev levels are not stored; reload keeps
    tf_rev is tf_fwd and identical outputs."""
    import dgl_tpu.ops.pallas.hybrid as hb
    import unittest.mock as mock
    rng = np.random.default_rng(12)
    N, Eh, F = 300, 2500, 4
    r = rng.integers(0, N, Eh)
    c = rng.integers(0, N, Eh)
    row, col = np.concatenate([r, c]), np.concatenate([c, r])
    cpath = str(tmp_path / "sym.npz")
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            ts.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        hf1 = hb.build_hybrid_format(row, col, N, N, k_dense=32,
                                     min_degree=1, tile=256, cap=256,
                                     symmetric=True, cache_path=cpath)
        hf2 = hb.load_hybrid_format(cpath)
        assert hf2 is not None and hf2.symmetric
        assert hf2.tf_rev is hf2.tf_fwd
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(hb.hybrid_spmm(hf1, x)),
                                   np.asarray(hb.hybrid_spmm(hf2, x)),
                                   rtol=1e-5, atol=1e-4)
    finally:
        if jax.default_backend() != "tpu":
            patch.stop()


def test_bitmask_spmm_matches_dense():
    """Bit-packed dense SpMM (ops/pallas/bitmm.py): fwd + grad vs dense
    oracle, asymmetric graph WITH multi-edges (COO remainder path)."""
    import dgl_tpu.ops.pallas.bitmm as bm
    import unittest.mock as mock
    rng = np.random.default_rng(21)
    N_src, N_dst, E, F = 300, 220, 4000, 8
    row = rng.integers(0, N_src, E)
    col = rng.integers(0, N_dst, E)
    # force multi-edges
    row[:50] = row[0]
    col[:50] = col[0]
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            bm.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        bf = bm.build_bit_format(row, col, N_src, N_dst)
        assert bf.rem_w.shape[0] > 0          # remainder exercised
        x = jnp.asarray(rng.normal(size=(N_src, F)).astype(np.float32))
        out = np.asarray(bm.bit_spmm(bf, x))
        dense = np.zeros((N_dst, N_src), np.float32)
        np.add.at(dense, (col, row), 1.0)
        ref = dense @ np.asarray(x)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-1)
        g = jax.grad(lambda x: (bm.bit_spmm(bf, x) ** 2).sum())(x)
        gref = 2 * dense.T @ ref
        np.testing.assert_allclose(np.asarray(g), gref, rtol=5e-2,
                                   atol=1.0)
        # wide F routes through the 128-lane kernel (_bit_matmul)
        xw = jnp.asarray(rng.normal(size=(N_src, 136)).astype(np.float32))
        outw = np.asarray(bm.bit_spmm(bf, xw))
        np.testing.assert_allclose(outw, dense @ np.asarray(xw),
                                   rtol=5e-2, atol=1e-1)
    finally:
        if jax.default_backend() != "tpu":
            patch.stop()


def test_bitmask_remainder_chunked_scan():
    """Large COO remainders take the lax.scan chunked path (the single
    (R, F) gather OOMs HBM at R in the tens of millions); forcing a tiny
    _REM_CHUNK must not change values or gradients."""
    import dgl_tpu.ops.pallas.bitmm as bm
    import unittest.mock as mock
    rng = np.random.default_rng(23)
    N_src, N_dst, E, F = 300, 220, 4000, 8
    row = rng.integers(0, N_src, E)
    col = rng.integers(0, N_dst, E)
    # 200 distinct duplicated pairs -> remainder has >64 entries
    row[200:400] = row[:200]
    col[200:400] = col[:200]
    patches = [mock.patch.object(bm, "_REM_CHUNK", 64)]
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patches.append(mock.patch.object(
            bm.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True})))
    for p in patches:
        p.start()
    try:
        bf = bm.build_bit_format(row, col, N_src, N_dst)
        assert bf.rem_w.shape[0] > bm._REM_CHUNK   # scan path exercised
        x = jnp.asarray(rng.normal(size=(N_src, F)).astype(np.float32))
        out = np.asarray(bm.bit_spmm(bf, x))
        dense = np.zeros((N_dst, N_src), np.float32)
        np.add.at(dense, (col, row), 1.0)
        ref = dense @ np.asarray(x)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-1)
        g = jax.grad(lambda x: (bm.bit_spmm(bf, x) ** 2).sum())(x)
        gref = 2 * dense.T @ ref
        np.testing.assert_allclose(np.asarray(g), gref, rtol=5e-2,
                                   atol=1.0)
    finally:
        for p in patches:
            p.stop()


def test_bitmask_spmm_symmetric_shares_block(tmp_path):
    """symmetric=True: packed_rev IS packed; disk cache round-trips."""
    import dgl_tpu.ops.pallas.bitmm as bm
    import unittest.mock as mock
    rng = np.random.default_rng(22)
    N, Eh, F = 256, 2000, 4
    r, c = rng.integers(0, N, Eh), rng.integers(0, N, Eh)
    row, col = np.concatenate([r, c]), np.concatenate([c, r])
    cpath = str(tmp_path / "bits.npz")
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            bm.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        bf = bm.build_bit_format(row, col, N, N, symmetric=True,
                                 cache_path=cpath)
        assert bf.symmetric and bf.packed_rev is bf.packed
        bf2 = bm.load_bit_format(cpath)
        assert bf2 is not None and bf2.symmetric
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        out1 = np.asarray(bm.bit_spmm(bf, x))
        out2 = np.asarray(bm.bit_spmm(bf2, x))
        np.testing.assert_allclose(out1, out2, rtol=1e-6)
        dense = np.zeros((N, N), np.float32)
        np.add.at(dense, (col, row), 1.0)
        np.testing.assert_allclose(out1, dense @ np.asarray(x),
                                   rtol=5e-2, atol=1e-1)
        # symmetric VJP = forward
        g = jax.grad(lambda x: (bm.bit_spmm(bf, x) * 1.0).sum())(x)
        np.testing.assert_allclose(
            np.asarray(g),
            dense.T @ np.ones((N, F), np.float32), rtol=5e-2, atol=1e-1)
    finally:
        if jax.default_backend() != "tpu":
            patch.stop()


def test_bitmask_dispatch_through_gspmm():
    """gspmm copy_lhs/sum routes to the bitmask kernel when a unit has
    the bit format (mocked onto-TPU dispatch, interpret kernel); output
    matches the XLA reference path."""
    import dgl_tpu.ops.pallas.bitmm as bm
    import dgl_tpu.ops.pallas.dispatch as disp
    from dgl_tpu.utils import config as cfg
    from dgl_tpu.ops.gspmm import gspmm_unit
    from dgl_tpu.graph.unitgraph import UnitGraph
    import unittest.mock as mock
    rng = np.random.default_rng(23)
    N, Eh, F = 300, 3000, 8
    r, c = rng.integers(0, N, Eh), rng.integers(0, N, Eh)
    row, col = np.concatenate([r, c]), np.concatenate([c, r])
    unit = UnitGraph.from_coo(N, N, row.astype(np.int32),
                              col.astype(np.int32))
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ref = np.asarray(gspmm_unit(unit, "copy_lhs", "sum", x, None))
    old_min = cfg.get("pallas_spmm_min_edges")
    orig = pl.pallas_call
    patches = [
        mock.patch.object(disp, "_on_tpu", lambda: True),
        mock.patch.object(
            bm.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True})),
    ]
    try:
        for p in patches:
            p.start()
        cfg.set("pallas_spmm_min_edges", 1)
        unit.create_bitmask_format(symmetric=True)
        assert unit._bits is not None
        with mock.patch.object(bm, "bit_spmm",
                               wraps=bm.bit_spmm) as spy:
            out = np.asarray(gspmm_unit(unit, "copy_lhs", "sum", x, None))
            assert spy.called          # actually took the bit path
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-1)
    finally:
        cfg.set("pallas_spmm_min_edges", old_min)
        for p in patches:
            p.stop()


def test_auto_format_selection():
    """auto_format picks the family by density/budget/skew and builds it."""
    import dgl_tpu as dgl
    rng = np.random.default_rng(7)

    # dense-ish symmetric graph within budget -> bitmask (symmetric shared)
    n, e = 2000, 1_200_000
    r0 = rng.integers(0, n, e // 2)
    c0 = rng.integers(0, n, e // 2)
    g = dgl.graph((np.r_[r0, c0], np.r_[c0, r0]), num_nodes=n)
    u = g.unit()
    assert u.auto_format() == "bitmask"
    assert u._bits is not None and u._bits.symmetric

    # same graph, budget too small for the bitmask, heavy-tailed -> hybrid
    hub = rng.integers(0, 64, e)            # 64 hub dst rows
    src = rng.integers(0, 30000, e)
    g2 = dgl.graph((src, hub), num_nodes=30000)
    u2 = g2.unit()
    assert u2.auto_format(hbm_budget_bytes=1 << 20) == "hybrid"
    assert u2._hybrid is not None

    # small sparse graph -> tiled
    g3 = dgl.graph((rng.integers(0, 5000, 20000),
                    rng.integers(0, 5000, 20000)))
    u3 = g3.unit()
    assert u3.auto_format() == "tiled"
    assert u3._tiled is not None


def test_tiled_cap_auto():
    """Auto cap stays at DEFAULT_CAP (fastest for plain SpMM) and only
    escalates when the estimated bucket count would overflow the fused
    kernels' SMEM prefetch budget; explicit caps always win."""
    import dgl_tpu as dgl
    from dgl_tpu.graph.unitgraph import _auto_cap
    # full-Reddit numbers: 114.6M edges, 228^2 tile pairs -> 2048
    assert _auto_cap(114_615_892, 228 * 228, 512) == 2048
    # 23M-edge graph: 45k + 52k buckets fits -> stays 512
    assert _auto_cap(23_000_000, 228 * 228, 512) == 512
    rng = np.random.default_rng(12)
    g2 = dgl.graph((rng.integers(0, 100_000, 200_000),
                    rng.integers(0, 100_000, 200_000)))
    tf2, _ = g2.unit().tiled_format()
    assert tf2.cap == ts.DEFAULT_CAP
    g3 = dgl.graph((rng.integers(0, 4000, 1_000_000),
                    rng.integers(0, 4000, 1_000_000)))
    tf3, _ = g3.unit().tiled_format(cap=256)
    assert tf3.cap == 256


def test_edgegat_v2_in_kernel_transform():
    """EdgeGAT v2 (edge transform computed in-kernel, no fe_slot tensor)
    vs a dense jnp reference: values + all six gradients."""
    import dgl_tpu as dgl
    import unittest.mock as mock
    import dgl_tpu.ops.pallas.gat_fused as gfm
    from dgl_tpu.ops.pallas.gat_fused import (
        edgegat_attention_aggregate_v2, slot_edge_tensor_t, pad_We_heads,
        _lane_pad)

    rng = np.random.default_rng(13)
    N, E, H, Fh, Fe = 300, 2500, 2, 8, 5
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    tf, _ = g.unit().tiled_format(tile=256, cap=128)
    tf = tf.with_src_first()
    g.unit()._tiled = tf

    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ef = rng.normal(size=(E, Fe)).astype(np.float32)
    We = jnp.asarray(rng.normal(size=(Fe, H * Fh), scale=0.4
                                ).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(H, Fh)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, H, Fh)).astype(np.float32))
    slope = 0.2

    ef_t = slot_edge_tensor_t(tf, ef)
    We_p = pad_We_heads(We, H, Fh)

    patch = None
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        patch = mock.patch.object(
            gfm.pl, "pallas_call",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        patch.start()
    try:
        def fused(el, er, ef_t, We_p, attn, x):
            return edgegat_attention_aggregate_v2(
                tf, el, er, ef_t, We_p, attn, x, H, Fh, slope)

        out = np.asarray(fused(el, er, ef_t, We_p, attn, x))

        # dense reference (f64-ish in f32 jnp)
        def ref(el, er, We, attn, x):
            fe = (jnp.asarray(ef) @ We).reshape(E, H, Fh)
            ee = jnp.einsum("ehf,hf->eh", fe, attn)
            raw = el[row] + er[col] + ee
            lr = jnp.where(raw >= 0, raw, slope * raw)
            p = jnp.exp(jnp.clip(lr, -40, 40))
            den = jax.ops.segment_sum(p, jnp.asarray(col), N)
            msg = (x[row] + fe) * p[:, :, None]
            num = jax.ops.segment_sum(msg, jnp.asarray(col), N)
            return num / jnp.maximum(den, 1e-20)[:, :, None]

        want = np.asarray(ref(el, er, We, attn, x))
        np.testing.assert_allclose(out, want, rtol=5e-2, atol=5e-2)

        # gradients: compare the fused VJP against the reference's for
        # every differentiable input (ef grad read back from slot space)
        dZ = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
        gf = jax.grad(lambda *a: (fused(*a) * dZ).sum(),
                      argnums=(0, 1, 2, 3, 4, 5))(el, er, ef_t, We_p,
                                                  attn, x)
        gr = jax.grad(lambda el, er, We, attn, x:
                      (ref(el, er, We, attn, x) * dZ).sum(),
                      argnums=(0, 1, 2, 3, 4))(el, er, We, attn, x)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                                   rtol=1e-1, atol=1e-1)   # del
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                                   rtol=1e-1, atol=1e-1)   # der
        # dWe: padded grid -> extract head blocks
        Fh_pad = _lane_pad(H, Fh)
        dWe = np.zeros((Fe, H * Fh), np.float32)
        gWp = np.asarray(gf[3])
        for h in range(H):
            dWe[:, h * Fh: (h + 1) * Fh] = \
                gWp[:Fe, h * Fh_pad: h * Fh_pad + Fh]
        np.testing.assert_allclose(dWe, np.asarray(gr[2]), rtol=1e-1,
                                   atol=1e-1)
        np.testing.assert_allclose(np.asarray(gf[4]), np.asarray(gr[3]),
                                   rtol=1e-1, atol=1e-1)   # dattn
        np.testing.assert_allclose(np.asarray(gf[5]), np.asarray(gr[4]),
                                   rtol=1e-1, atol=1e-1)   # dx
        # d(ef): slot-space grad scattered back to canonical order
        B, C = tf.num_buckets, tf.cap
        eid = np.asarray(tf.eid).reshape(-1)
        def_t = np.asarray(gf[2]).transpose(0, 2, 1).reshape(B * C, -1)
        m = eid >= 0
        def_c = np.zeros((E, Fe), np.float32)
        def_c[eid[m]] = def_t[np.nonzero(m)[0], :Fe]
        # reference d(ef)
        def ref_ef(efv):
            fe = (efv @ We).reshape(E, H, Fh)
            ee = jnp.einsum("ehf,hf->eh", fe, attn)
            raw = el[row] + er[col] + ee
            lr = jnp.where(raw >= 0, raw, slope * raw)
            p = jnp.exp(jnp.clip(lr, -40, 40))
            den = jax.ops.segment_sum(p, jnp.asarray(col), N)
            msg = (x[row] + fe) * p[:, :, None]
            num = jax.ops.segment_sum(msg, jnp.asarray(col), N)
            return num / jnp.maximum(den, 1e-20)[:, :, None]
        gref = np.asarray(jax.grad(
            lambda efv: (ref_ef(efv) * dZ).sum())(jnp.asarray(ef)))
        # exclude edges whose logit sits at the leaky-relu kink: the
        # fused bf16 path and the f32 reference can disagree on the sign
        # of raw ~ 0, flipping the derivative (1 vs slope) legitimately
        fe_r = (np.asarray(ef) @ np.asarray(We)).reshape(E, H, Fh)
        ee_r = np.einsum("ehf,hf->eh", fe_r, np.asarray(attn))
        raw_r = np.asarray(el)[row] + np.asarray(er)[col] + ee_r
        safe = (np.abs(raw_r) > 2e-2).all(axis=1)
        np.testing.assert_allclose(def_c[safe], gref[safe], rtol=1e-1,
                                   atol=1e-1)
    finally:
        if patch is not None:
            patch.stop()
