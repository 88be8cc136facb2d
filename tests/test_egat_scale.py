"""EGATConv scale path: chunked flat-layout attention must match the
standard (E, H, De)-materializing path exactly, including gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu
from dgl_tpu import nn as dglnn
from dgl_tpu.utils import config


def _setup(seed=0, n=60, e=400, fin=10, fe=6, H=3, dn=8, de=5):
    rng = np.random.default_rng(seed)
    g = dgl_tpu.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                      num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, fin)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(e, fe)).astype(np.float32))
    layer = dglnn.EGATConv(fin, fe, dn, de, H)
    params = layer.init(jax.random.PRNGKey(1), g, x, ef)
    return g, x, ef, layer, params


def _with_threshold(thresh):
    old = config.get("pallas_spmm_min_edges")
    config.set("pallas_spmm_min_edges", thresh)
    return old


def test_flat_path_matches_standard():
    g, x, ef, layer, params = _setup()
    h_ref, f_ref = layer.apply(params, g, x, ef)
    old = _with_threshold(1)      # force the scale path
    try:
        h_flat, f_flat = layer.apply(params, g, x, ef)
    finally:
        config.set("pallas_spmm_min_edges", old)
    np.testing.assert_allclose(np.asarray(h_flat), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_flat), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-4)


def test_flat_path_skips_edge_feats():
    g, x, ef, layer, params = _setup()
    old = _with_threshold(1)
    try:
        h, f = layer.apply(params, g, x, ef, compute_edge_feats=False)
    finally:
        config.set("pallas_spmm_min_edges", old)
    assert f is None and h.shape == (g.num_nodes(), 3, 8)


def test_flat_path_gradients_match():
    g, x, ef, layer, params = _setup()

    def loss(p, x, ef):
        h, f = layer.apply(p, g, x, ef, compute_edge_feats=False)
        return (h ** 2).sum()

    def loss_ref(p, x, ef):
        h, f = layer.apply(p, g, x, ef)
        return (h ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, ef)
    old = _with_threshold(1)
    try:
        g_flat = jax.grad(loss, argnums=(0, 1, 2))(params, x, ef)
    finally:
        config.set("pallas_spmm_min_edges", old)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_new, _ = jax.flatten_util.ravel_pytree(g_flat)
    np.testing.assert_allclose(np.asarray(flat_new), np.asarray(flat_ref),
                               rtol=2e-3, atol=2e-3)


def test_chunking_crosses_boundaries():
    """Edge count not divisible by the chunk: padded tail must not leak."""
    from dgl_tpu.nn.conv.gatconv import _egat_logits_chunked
    rng = np.random.default_rng(3)
    n, e, H, De, fe = 30, 1001, 2, 4, 5
    row = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    col = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    f_ni = jnp.asarray(rng.normal(size=(n, H * De)).astype(np.float32))
    f_nj = jnp.asarray(rng.normal(size=(n, H * De)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(e, fe)).astype(np.float32))
    Wf = jnp.asarray(rng.normal(size=(fe, H * De)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(1, H, De)).astype(np.float32))
    out = _egat_logits_chunked(f_ni, f_nj, ef, Wf, None, attn,
                               row, col, H, De, chunk=128)
    import flax.linen as fnn
    full = fnn.leaky_relu(
        jnp.take(f_ni, row, 0) + jnp.take(f_nj, col, 0) + ef @ Wf)
    ref = (full.reshape(-1, H, De) * attn).sum(-1).reshape(-1)
    assert out.shape == (e * H,)   # flat layout (no (E, H) HBM tensor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_edge_gat_flat_matches_standard():
    rng = np.random.default_rng(1)
    n, e, fin, fe, H, D = 50, 300, 9, 5, 3, 6
    g = dgl_tpu.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                      num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, fin)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(e, fe)).astype(np.float32))
    layer = dglnn.EdgeGATConv(fin, fe, D, H)
    params = layer.init(jax.random.PRNGKey(0), g, x, ef)
    ref = layer.apply(params, g, x, ef)
    old = _with_threshold(1)
    try:
        out = layer.apply(params, g, x, ef)
    finally:
        config.set("pallas_spmm_min_edges", old)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(p, variant_thresh):
        old = _with_threshold(variant_thresh)
        try:
            return (layer.apply(p, g, x, ef) ** 2).sum()
        finally:
            config.set("pallas_spmm_min_edges", old)

    g_ref = jax.grad(lambda p: loss(p, 10**9))(params)
    g_flat = jax.grad(lambda p: loss(p, 1))(params)
    r, _ = jax.flatten_util.ravel_pytree(g_ref)
    f, _ = jax.flatten_util.ravel_pytree(g_flat)
    np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                               rtol=2e-3, atol=2e-3)
