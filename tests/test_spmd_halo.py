"""Halo all_to_all SPMD path (v2) — VERDICT r1 item 1.

Asserts, on the 8-device CPU mesh:
  (a) halo_spmm_sum == all_gather path == dense oracle (fwd and grad);
  (b) per-device feature-table rows are O(N/P + halo), far below N;
  (c) a full halo-path GCN train step matches the replicated train step.
Reference being matched: ``python/dgl/partition.py:139``
(partition_graph_with_halo), ``distributed/partition.py:648``.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dgl_tpu as dgl
from dgl_tpu.parallel import (
    build_sharded_graph, build_halo_sharded_graph, halo_spmm_sum,
    halo_degrees, pad_node_features, sharded_spmm_sum,
)

NDEV = 8


def _mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} devices")
    return Mesh(np.array(devs[:NDEV]), ("data",))


def _clustered_graph(n=1024, intra=0.92, seed=0):
    """Planted 8-community graph: most edges intra-community, so the
    halo (boundary rows) is small under the planted partition."""
    rng = np.random.default_rng(seed)
    comm = np.arange(n) * NDEV // n
    e = n * 12
    src = rng.integers(0, n, e)
    is_intra = rng.uniform(size=e) < intra
    # intra edges: rewrite dst into src's community block
    block = n // NDEV
    dst_intra = (src // block) * block + rng.integers(0, block, e)
    dst_rand = rng.integers(0, n, e)
    dst = np.where(is_intra, dst_intra, dst_rand)
    g = dgl.graph((src, dst), num_nodes=n)
    return g, comm


def test_halo_matches_allgather_and_oracle():
    mesh = _mesh()
    g, comm = _clustered_graph()
    n, f = g.num_nodes(), 16
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, f)).astype(np.float32)

    hg, perm = build_halo_sharded_graph(g, NDEV, partition=comm)
    sg, perm2 = build_sharded_graph(g, NDEV, partition=comm)
    np.testing.assert_array_equal(perm, perm2)

    xp = pad_node_features(jnp.asarray(x[perm]), hg)
    spec = NamedSharding(mesh, P("data"))
    xp = jax.device_put(xp, spec)

    out_halo = np.asarray(halo_spmm_sum(hg, xp, mesh))
    out_ag = np.asarray(sharded_spmm_sum(sg, xp, mesh))
    np.testing.assert_allclose(out_halo, out_ag, rtol=1e-6, atol=1e-6)

    # dense oracle in the original order
    row, col = (np.asarray(a) for a in g.unit().coo())
    oracle = np.zeros((n, f), np.float32)
    np.add.at(oracle, col, x[row])
    np.testing.assert_allclose(out_halo[:n][np.argsort(perm)][perm[
        np.argsort(perm)]], out_halo[:n])  # sanity of perm round trip
    np.testing.assert_allclose(out_halo[:n], oracle[perm], rtol=1e-4,
                               atol=1e-4)


def test_halo_memory_is_o_n_over_p_plus_halo():
    g, comm = _clustered_graph()
    hg, _ = build_halo_sharded_graph(g, NDEV, partition=comm)
    stats = hg.comm_stats(feat_dim=16)
    n = g.num_nodes()
    # per-device rows: own shard + received halo — must be way below N
    assert stats["table_rows_per_device"] < 0.55 * n, stats
    # and the wire volume must be way below the all_gather equivalent
    assert stats["bytes_wire"] < 0.25 * stats["allgather_bytes_equiv"], stats


def test_halo_gradients_match_oracle():
    mesh = _mesh()
    g, comm = _clustered_graph(n=512)
    n, f = g.num_nodes(), 8
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(f, 4)).astype(np.float32)

    hg, perm = build_halo_sharded_graph(g, NDEV, partition=comm)
    spec = NamedSharding(mesh, P("data"))
    xp = jax.device_put(pad_node_features(jnp.asarray(x[perm]), hg), spec)
    wj = jnp.asarray(w)

    def loss_halo(xp, w):
        return (halo_spmm_sum(hg, xp @ w, mesh) ** 2).sum()

    gx, gw = jax.grad(loss_halo, argnums=(0, 1))(xp, wj)

    row, col = (np.asarray(a) for a in g.unit().coo())

    def loss_dense(x, w):
        msg = (x @ w)[row]
        agg = jax.ops.segment_sum(msg, col, num_segments=n)
        return (agg ** 2).sum()

    gx_ref, gw_ref = jax.grad(loss_dense, argnums=(0, 1))(
        jnp.asarray(x), wj)
    np.testing.assert_allclose(np.asarray(gx)[:n], np.asarray(gx_ref)[perm],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-3, atol=1e-3)


def test_halo_train_step_matches_replicated():
    import optax
    mesh = _mesh()
    g, comm = _clustered_graph(n=512)
    n, f, c = g.num_nodes(), 8, 4
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)

    hg, perm = build_halo_sharded_graph(g, NDEV, partition=comm)
    spec = NamedSharding(mesh, P("data"))
    xp = jax.device_put(pad_node_features(jnp.asarray(x[perm]), hg), spec)
    ypad = np.full(hg.num_parts * hg.nodes_per_part, -1, np.int32)
    ypad[:n] = y[perm]
    yp = jax.device_put(jnp.asarray(ypad), spec)
    deg = jnp.maximum(halo_degrees(hg, mesh), 1.0)[:, None]

    params = {"w1": jnp.asarray(rng.normal(size=(f, 16), scale=0.3)
                                .astype(np.float32)),
              "w2": jnp.asarray(rng.normal(size=(16, c), scale=0.3)
                                .astype(np.float32))}

    def model_halo(p, xp):
        h = jax.nn.relu(halo_spmm_sum(hg, xp @ p["w1"], mesh) / deg)
        return halo_spmm_sum(hg, h @ p["w2"], mesh) / deg

    @jax.jit
    def loss_halo(p):
        logits = model_halo(p, xp)
        mask = yp >= 0
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(yp, 0))
        return jnp.where(mask, ls, 0).sum() / mask.sum()

    row, col = (np.asarray(a) for a in g.unit().coo())
    degd = np.maximum(np.bincount(col, minlength=n), 1)[:, None]

    def model_dense(p, x):
        def spmm(v):
            return jax.ops.segment_sum(v[row], jnp.asarray(col),
                                       num_segments=n)
        h = jax.nn.relu(spmm(x @ p["w1"]) / degd)
        return spmm(h @ p["w2"]) / degd

    def loss_dense(p):
        logits = model_dense(p, jnp.asarray(x))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()

    l_halo, g_halo = jax.value_and_grad(loss_halo)(params)
    l_dense, g_dense = jax.value_and_grad(loss_dense)(params)
    np.testing.assert_allclose(float(l_halo), float(l_dense), rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_halo[k]),
                                   np.asarray(g_dense[k]),
                                   rtol=2e-3, atol=2e-3)
