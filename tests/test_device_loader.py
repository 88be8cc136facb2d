"""Fully on-device minibatch pipeline (dataloading/device_loader.py):
block contract vs host oracle + a jitted 2-layer GraphSAGE train step
with zero host round-trips per batch."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from dgl_tpu.dataloading.device_loader import (
    sample_block_device, gather_block_features, mean_aggregate,
    seed_features)


def _csc(n, e, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    order = np.argsort(col, kind="stable")
    row, col = row[order], col[order]
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, col + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return indptr, row.astype(np.int32)


def test_block_contract():
    n, e, s, fanout, cap = 400, 6000, 32, 6, 256
    indptr, indices = _csc(n, e)
    seeds = jnp.asarray(np.arange(s, dtype=np.int32) * 7 % n)
    blk = sample_block_device(jnp.asarray(indptr), jnp.asarray(indices),
                              seeds, fanout, cap, jax.random.PRNGKey(0))
    src = np.asarray(blk.src_ids)
    k = int(blk.num_src)
    # sorted unique, -1 padded, seeds included (to_block contract)
    assert np.all(np.diff(src[:k]) > 0)
    assert np.all(src[k:] == -1)
    assert set(np.asarray(seeds).tolist()) <= set(src[:k].tolist())
    # local indices round-trip to globals
    np.testing.assert_array_equal(src[np.asarray(blk.seeds_local)],
                                  np.asarray(seeds))
    m = np.asarray(blk.mask)
    nb_g = src[np.asarray(blk.nbr_local)]
    eids = np.asarray(blk.eids)
    # every valid neighbor is the CSC row at its eid
    assert np.all(nb_g[m] == indices[eids[m]])


def test_mean_aggregate_matches_oracle():
    n, e, s, fanout, cap = 300, 9000, 24, 50, 2048
    indptr, indices = _csc(n, e, seed=1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    seeds_np = rng.choice(n, s, replace=False).astype(np.int32)
    # fanout >= max degree -> take-all -> mean == full-neighborhood mean
    assert (indptr[1:] - indptr[:-1]).max() <= fanout
    blk = sample_block_device(jnp.asarray(indptr), jnp.asarray(indices),
                              jnp.asarray(seeds_np), fanout, cap,
                              jax.random.PRNGKey(3))
    h_src = gather_block_features(blk, jnp.asarray(x))
    agg = np.asarray(mean_aggregate(blk, h_src))
    for i, sd in enumerate(seeds_np):
        nb = indices[indptr[sd]:indptr[sd + 1]]
        want = x[nb].mean(axis=0) if len(nb) else np.zeros(8)
        np.testing.assert_allclose(agg[i], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seed_features(blk, h_src)),
                               x[seeds_np], rtol=1e-6, atol=0)


def test_on_device_sage_training():
    """2-layer GraphSAGE minibatch training: sampling, compaction,
    feature gather, both layers, loss + adam — ONE jit, seeds only."""
    n, e, f, c = 600, 9000, 16, 4
    rng = np.random.default_rng(4)
    # planted community signal
    y_np = (np.arange(n) * c // n).astype(np.int32)
    blocks = np.eye(c)[y_np]
    intra = np.repeat(np.arange(n), 10)
    dst = intra
    src = np.where(rng.uniform(size=len(dst)) < 0.85,
                   (y_np[dst] * n // c + rng.integers(0, n // c,
                                                      len(dst))),
                   rng.integers(0, n, len(dst))).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, dst[order] + 1, 1)
    indptr = jnp.asarray(np.cumsum(indptr).astype(np.int32))
    indices = jnp.asarray(src[order].astype(np.int32))
    x = jnp.asarray((rng.normal(size=(n, f)) + blocks @
                     rng.normal(size=(c, f)) * 3).astype(np.float32))
    y = jnp.asarray(y_np)

    s, fanout, cap1, cap2 = 64, 5, 4096, 512
    params = {
        "w_self1": jnp.asarray(rng.normal(size=(f, 32), scale=0.3),
                               jnp.float32),
        "w_nbr1": jnp.asarray(rng.normal(size=(f, 32), scale=0.3),
                              jnp.float32),
        "w_self2": jnp.asarray(rng.normal(size=(32, c), scale=0.3),
                               jnp.float32),
        "w_nbr2": jnp.asarray(rng.normal(size=(32, c), scale=0.3),
                              jnp.float32),
    }
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, seeds, key):
        k1, k2 = jax.random.split(key)
        # layer-2 block over the seeds, layer-1 block over ITS srcs
        blk2 = sample_block_device(indptr, indices, seeds, fanout, cap2,
                                   k1)
        inner_seeds = jnp.where(blk2.src_ids >= 0, blk2.src_ids, 0)
        blk1 = sample_block_device(indptr, indices, inner_seeds, fanout,
                                   cap1, k2)

        def loss_fn(p):
            h0 = gather_block_features(blk1, x)
            h1 = jax.nn.relu(
                seed_features(blk1, h0) @ p["w_self1"]
                + mean_aggregate(blk1, h0) @ p["w_nbr1"])   # (cap2, 32)
            h1 = jnp.where((blk2.src_ids >= 0)[:, None], h1, 0)
            h2 = (seed_features(blk2, h1) @ p["w_self2"]
                  + mean_aggregate(blk2, h1) @ p["w_nbr2"])  # (S, c)
            yy = jnp.take(y, seeds)
            return optax.softmax_cross_entropy_with_integer_labels(
                h2, yy).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        key, k1, k2 = jax.random.split(key, 3)
        seeds = jax.random.randint(k1, (s,), 0, n, dtype=jnp.int32)
        params, opt, l = step(params, opt, seeds, k2)
        losses.append(float(l))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.6, (
        losses[:5], losses[-5:])


def test_multilayer_blocks_contract():
    """sample_blocks_device: outermost-first order, each layer's dst set
    == the next layer's seeds (the reference sample_blocks contract)."""
    from dgl_tpu.dataloading import sample_blocks_device
    n, e = 500, 8000
    indptr, indices = _csc(n, e, seed=9)
    seeds = jnp.asarray(np.arange(40, dtype=np.int32) * 11 % n)
    blocks = sample_blocks_device(
        jnp.asarray(indptr), jnp.asarray(indices), seeds,
        fanouts=[4, 8], capacities=[4096, 512],
        key=jax.random.PRNGKey(7))
    assert len(blocks) == 2
    outer, inner = blocks          # outermost (input layer) first
    # inner block's dst = the given seeds
    np.testing.assert_array_equal(
        np.asarray(inner.src_ids)[np.asarray(inner.seeds_local)],
        np.asarray(seeds))
    # outer block's seeds = inner block's src set (padded with 0s)
    k = int(inner.num_src)
    outer_seed_globals = np.asarray(outer.src_ids)[
        np.asarray(outer.seeds_local)]
    np.testing.assert_array_equal(
        outer_seed_globals[:k], np.asarray(inner.src_ids)[:k])
    # fanouts applied per layer (inner=8, outer=4)
    assert inner.mask.shape[1] == 8 and outer.mask.shape[1] == 4
