"""Non-toy-scale gate for the sampled-minibatch mesh plane
(VERDICT r4 #1c): 1M nodes / 10M edges on the 8-device CPU mesh,
standalone sampled-plane build (no halo plane), correctness of the
owner-routed samples against a host CSC, and training steps under scan.

Reference regime being matched: sampled training over a partitioned
100M-edge-class graph (``distributed/graph_services.py:35-255``,
``dist_graph.py:519``).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from dgl_tpu.parallel.mesh_minibatch import (
    build_mesh_csc_edges, mesh_shard_rows, sample_frontier,
    gather_frontier, frontier_sizes, block_mean)

N, E, FEAT, CLASSES = 1_000_000, 10_000_000, 16, 5
S, FANOUTS = 8, [4, 3]


@pytest.fixture(scope="module")
def big():
    rng = np.random.default_rng(0)
    row = rng.integers(0, N, E).astype(np.int32)
    col = rng.integers(0, N, E).astype(np.int32)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    mcsc, perm = build_mesh_csc_edges(row, col, N, mesh)
    # host CSC (dst-sorted edge list) for membership checks
    order = np.argsort(col, kind="stable")
    col_s, row_s = col[order], row[order]
    return rng, mesh, mcsc, perm, row, col_s, row_s


def test_build_is_light(big):
    rng, mesh, mcsc, perm, row, col_s, row_s = big
    P_ = len(jax.devices())
    assert mcsc.num_parts == P_
    assert mcsc.nodes_per_part == -(-N // P_)
    # per-device graph state is O(E/P): indices (E_max,) + indptr slice.
    per_dev = (mcsc.indices.shape[1] + mcsc.indptr.shape[1]) * 4
    assert per_dev < 2.0 * (E // P_) * 4 + mcsc.nodes_per_part * 8
    # edge conservation: per-part indptr totals sum to E
    tot = int(np.asarray(mcsc.indptr)[:, -1].sum())
    assert tot == E


def test_sampled_frontier_members(big):
    rng, mesh, mcsc, perm, row, col_s, row_s = big
    P_ = len(jax.devices())
    seeds = rng.integers(0, N, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(1), mesh)
    ids_h = np.asarray(ids)
    sizes = frontier_sizes(S, FANOUTS)
    assert ids_h.shape == (P_, sizes[-1])
    assert np.array_equal(ids_h[:, :S], seeds)
    # level-0 membership: every valid sampled neighbor is a true
    # in-neighbor (perm is identity for the default contiguous build,
    # so new-order ids == original ids)
    m0 = np.asarray(masks[0])
    k = FANOUTS[0]
    for p in range(P_):
        for si in range(S):
            seed = int(seeds[p, si])
            lo = np.searchsorted(col_s, seed, "left")
            hi = np.searchsorted(col_s, seed, "right")
            nbrs = set(row_s[lo:hi].tolist())
            got = ids_h[p, S + si * k: S + (si + 1) * k]
            for j in range(k):
                if m0[p, si, j]:
                    assert int(got[j]) in nbrs
            # mask reflects degree: deg >= k -> all valid (no replace)
            if hi - lo >= k:
                assert m0[p, si].all()
            else:
                assert m0[p, si].sum() <= hi - lo


def test_gather_and_train_under_scan(big):
    rng, mesh, mcsc, perm, row, col_s, row_s = big
    P_ = len(jax.devices())
    x = rng.normal(size=(N, FEAT)).astype(np.float32)
    y = (np.arange(N) % CLASSES).astype(np.int32)
    xs = mesh_shard_rows(x, perm, mcsc, mesh)
    ys = mesh_shard_rows(y[:, None], perm, mcsc, mesh)[:, 0]
    # gather parity at scale: pulled rows == original rows
    seeds = rng.integers(0, N, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(2), mesh)
    feats = np.asarray(gather_frontier(xs, ids, mcsc, mesh))
    ids_h = np.asarray(ids)
    np.testing.assert_allclose(feats[:, :S], x[ids_h[:, :S]], rtol=0,
                               atol=0)

    sizes = frontier_sizes(S, FANOUTS)
    params = {
        "w1": jnp.asarray(rng.normal(size=(FEAT, 8), scale=0.3),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(8, CLASSES), scale=0.3),
                          jnp.float32),
    }
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def fwd(p, feats, masks):
        h = feats
        for li in reversed(range(len(FANOUTS))):
            dstv, mean = block_mean(h, masks[li], sizes[li], FANOUTS[li])
            w = p["w1"] if li == len(FANOUTS) - 1 else p["w2"]
            h = (dstv + mean) @ w
            if li == len(FANOUTS) - 1:
                h = jax.nn.relu(h)
        return h

    def one_step(carry, key):
        p, o = carry
        seeds = jax.random.randint(key, (P_, S), 0, N, jnp.int32)
        ids, masks = sample_frontier(mcsc, seeds, FANOUTS, key, mesh)
        feats = gather_frontier(xs, ids, mcsc, mesh)
        yb = gather_frontier(ys[:, None].astype(jnp.float32),
                             ids[:, :S], mcsc, mesh)[..., 0].astype(
                                 jnp.int32)

        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                fwd(p, feats, masks), yb).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return (optax.apply_updates(p, up), o), l

    @jax.jit
    def run(p, o, key):
        (p, o), ls = jax.lax.scan(one_step, (p, o),
                                  jax.random.split(key, 4))
        return p, o, ls

    params, opt, ls = run(params, opt, jax.random.PRNGKey(3))
    ls = np.asarray(ls)
    assert np.all(np.isfinite(ls))
