"""On-device jittable neighbor sampling (sampling/device.py) vs host
semantics (reference src/array/cuda/rowwise_sampling.cu contract)."""
import numpy as np
import jax
import jax.numpy as jnp

from dgl_tpu.sampling.device import (sample_neighbors_device,
                                     unique_with_capacity)


def _csc(n, e, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    order = np.argsort(col, kind="stable")
    row, col = row[order], col[order]
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, col + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return jnp.asarray(indptr), jnp.asarray(row.astype(np.int32)), row, col


def test_without_replacement_exact():
    n, e = 200, 3000
    indptr, indices, row, col = _csc(n, e)
    seeds = jnp.arange(n, dtype=jnp.int32)
    fanout = 7
    nbrs, eids, mask = sample_neighbors_device(indptr, indices, seeds,
                                               fanout, jax.random.PRNGKey(0))
    ip = np.asarray(indptr)
    deg = ip[1:] - ip[:-1]
    eids_np = np.asarray(eids)
    mask_np = np.asarray(mask)
    nbrs_np = np.asarray(nbrs)
    for s in range(n):
        k = mask_np[s].sum()
        assert k == min(deg[s], fanout)
        ee = eids_np[s][mask_np[s]]
        # distinct picks, inside the seed's CSC range
        assert len(set(ee.tolist())) == k
        assert np.all((ee >= ip[s]) & (ee < ip[s + 1]))
        # neighbor ids consistent with the eid positions
        assert np.all(np.asarray(indices)[ee] == nbrs_np[s][mask_np[s]])
        if deg[s] <= fanout:     # take-all: every edge exactly once
            assert set(ee.tolist()) == set(range(ip[s], ip[s + 1]))


def test_with_replacement_and_zero_degree():
    n = 50
    # node 0 has no in-edges
    col = np.repeat(np.arange(1, n), 4)
    row = np.random.default_rng(1).integers(0, n, len(col))
    order = np.argsort(col, kind="stable")
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, col[order] + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    nbrs, eids, mask = sample_neighbors_device(
        jnp.asarray(indptr), jnp.asarray(row[order].astype(np.int32)),
        jnp.arange(n, dtype=jnp.int32), 6, jax.random.PRNGKey(2),
        replace=True)
    m = np.asarray(mask)
    assert not m[0].any()              # zero-degree seed fully masked
    assert m[1:].all()                 # others fully sampled (replace)
    ip = indptr
    e = np.asarray(eids)
    for s in range(1, n):
        assert np.all((e[s] >= ip[s]) & (e[s] < ip[s + 1]))


def test_uniformity():
    """Each neighbor of a high-degree node is picked ~uniformly."""
    deg, fanout, reps = 40, 5, 400
    indptr = jnp.asarray(np.array([0, deg], np.int32))
    indices = jnp.asarray(np.arange(deg, dtype=np.int32))
    seeds = jnp.zeros((1,), jnp.int32)
    counts = np.zeros(deg)
    for r in range(reps):
        nbrs, _, mask = sample_neighbors_device(
            indptr, indices, seeds, fanout, jax.random.PRNGKey(r))
        counts[np.asarray(nbrs)[0][np.asarray(mask)[0]]] += 1
    expected = reps * fanout / deg
    assert np.all(counts > expected * 0.5), counts
    assert np.all(counts < expected * 1.6), counts


def test_unique_with_capacity():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 30, (16, 4)).astype(np.int32)
    mask = rng.uniform(size=ids.shape) < 0.8
    cap = 64
    out, cnt = unique_with_capacity(jnp.asarray(ids), jnp.asarray(mask),
                                    cap)
    want = np.unique(ids[mask])
    out = np.asarray(out)
    assert int(cnt) == len(want)
    np.testing.assert_array_equal(out[:len(want)], want)
    assert np.all(out[len(want):] == -1)


def test_inside_jit_pipeline():
    """Sampler + unique compose inside one jitted step (the UVA-style
    on-device frontier expansion)."""
    n, e = 300, 5000
    indptr, indices, _, _ = _csc(n, e, seed=4)

    @jax.jit
    def frontier(seeds, key):
        nbrs, _, mask = sample_neighbors_device(indptr, indices, seeds,
                                                10, key)
        uniq, cnt = unique_with_capacity(nbrs, mask, 512)
        return uniq, cnt

    uniq, cnt = frontier(jnp.arange(32, dtype=jnp.int32),
                         jax.random.PRNGKey(5))
    assert 0 < int(cnt) <= 320
    u = np.asarray(uniq)[: int(cnt)]
    assert len(np.unique(u)) == int(cnt)


def test_bit_has_edge_and_negative_sampling():
    """bit_has_edge oracle + device negative sampler: every returned
    valid pair is a true non-edge and not a self-loop."""
    from dgl_tpu.ops.pallas.bitmm import build_bit_format
    from dgl_tpu.sampling.device import (
        bit_has_edge, global_uniform_negative_sampling_device)
    rng = np.random.default_rng(6)
    n, e = 120, 4000                    # dense-ish: rejection exercised
    row = rng.integers(0, n, e).astype(np.int64)
    col = rng.integers(0, n, e).astype(np.int64)
    bf = build_bit_format(row, col, n, n)
    A = np.zeros((n, n), bool)
    A[col, row] = True

    # oracle: existence of every (u, v) pair on a grid sample
    us = jnp.asarray(rng.integers(0, n, 500).astype(np.int32))
    vs = jnp.asarray(rng.integers(0, n, 500).astype(np.int32))
    got = np.asarray(bit_has_edge(bf, us, vs))
    np.testing.assert_array_equal(got, A[np.asarray(vs), np.asarray(us)])

    src, dst, mask = global_uniform_negative_sampling_device(
        bf, jax.random.PRNGKey(0), 2000, n)
    src, dst, mask = (np.asarray(a) for a in (src, dst, mask))
    assert mask.sum() > 1500                     # rejection converges
    assert not A[dst[mask], src[mask]].any()     # true negatives
    assert (src[mask] != dst[mask]).all()        # no self-loops


def test_labor_device_semantics():
    """Device LABOR-0: exact inclusion marginals min(1, k/deg), shared
    per-node randomness (identical frontiers for same-neighborhood
    seeds), unbiased SpMM-mean weights."""
    from dgl_tpu.sampling.device import sample_labors_device
    n = 150
    k = 4
    rng = np.random.default_rng(8)
    # two seeds with IDENTICAL neighbor sets (deg 20 <= cap) + one hub
    nbrs_shared = rng.choice(n, 12, replace=False)  # <= cap 16
    hub_nbrs = rng.choice(n, 120, replace=False)     # deg 120 > cap 16
    col = np.r_[np.zeros(12), np.ones(12), np.full(120, 2)].astype(int)
    row = np.r_[nbrs_shared, nbrs_shared, hub_nbrs]
    order = np.argsort(col, kind="stable")
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, col[order] + 1, 1)
    indptr = jnp.asarray(np.cumsum(indptr).astype(np.int32))
    indices = jnp.asarray(row[order].astype(np.int32))
    seeds = jnp.asarray(np.array([0, 1, 2], np.int32))

    inc = np.zeros(3)
    reps = 300
    shared_equal = 0
    for rep in range(reps):
        nb, eids, mask, w = sample_labors_device(
            indptr, indices, seeds, k, jax.random.PRNGKey(rep))
        m = np.asarray(mask)
        inc += m.sum(axis=1)
        f0 = set(np.asarray(nb)[0][m[0]].tolist())
        f1 = set(np.asarray(nb)[1][m[1]].tolist())
        shared_equal += f0 == f1
        # weights = 1/pi on kept edges
        wv = np.asarray(w)
        assert np.allclose(wv[m][np.asarray(nb)[m] >= 0].min(),
                           wv[m].min())
    # expected picks per seed = k (deg d: d*(k/d) = k for all three)
    np.testing.assert_allclose(inc / reps, [k, k, k], rtol=0.25)
    # shared randomness: same-neighborhood seeds pick IDENTICAL frontiers
    assert shared_equal == reps
    # unbiased mean: E[sum w*x / deg... ] check on seed 0 vs exact sum
    x = rng.normal(size=(n,)).astype(np.float32)
    est = np.zeros(400)
    for rep in range(400):
        nb, _, mask, w = sample_labors_device(
            indptr, indices, seeds, k, jax.random.PRNGKey(10_000 + rep))
        m = np.asarray(mask)[0]
        est[rep] = (np.asarray(w)[0][m] * x[np.asarray(nb)[0][m]]).sum()
    exact = x[nbrs_shared].sum()
    assert abs(est.mean() - exact) < 4 * est.std() / np.sqrt(400) + 1e-3
