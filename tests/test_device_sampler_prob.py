"""Device-side probs_or_mask + per-etype-fanout sampling
(sampling/device.py) — option-parity contracts with the reference GPU
prob sampler (``src/array/cuda/rowwise_sampling_prob.cu``,
``fused_csc_sampling_graph.h:296-345``): mask adherence, distinct picks
without replacement, take-all at low degree, frequency ~ probs for both
replace modes (A-ES/Gumbel top-k), per-etype fanout shapes."""


def test_prob_device_sampler_contracts():
    import numpy as np, jax, jax.numpy as jnp

    from dgl_tpu.sampling.device import (sample_neighbors_prob_device,
                                         sample_neighbors_etype_device,
                                         sample_neighbors_device)

    rng = np.random.default_rng(0)
    n, e = 200, 3000
    col = np.sort(np.concatenate([np.zeros(4, np.int64),
                                  rng.integers(1, n, e - 4)]))
    row = rng.integers(0, n, e)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, col + 1, 1)
    indptr = np.cumsum(indptr)
    probs = rng.uniform(0.1, 1.0, e).astype(np.float32)
    mask = rng.uniform(size=e) < 0.5
    ip, ix = jnp.asarray(indptr), jnp.asarray(row.astype(np.int32))
    seeds = jnp.asarray(rng.choice(n, 64, replace=False).astype(np.int32))

    # 1: mask sampling only picks mask-True edges
    nb, eid, m = sample_neighbors_prob_device(ip, ix, jnp.asarray(mask), seeds, 5, jax.random.PRNGKey(0), cap=256)
    eidn = np.asarray(eid); mn = np.asarray(m)
    assert (mask[eidn[mn]]).all(), "picked a masked-out edge"
    print("mask contract OK")

    # 2: no duplicates without replacement
    for s in range(len(seeds)):
        v = eidn[s][mn[s]]
        assert len(set(v.tolist())) == len(v), "duplicate picks w/o replacement"
    print("no-dup OK")

    # 3: exactness for deg<=fanout: all positive edges returned
    deg = np.diff(indptr)
    pos = np.where(deg > 0)[0]
    k = int(pos[np.argmin(deg[pos])])
    nb2, eid2, m2 = sample_neighbors_prob_device(ip, ix, jnp.asarray(probs), jnp.asarray([k], dtype=jnp.int32), int(deg[k]) + 2, jax.random.PRNGKey(1), cap=64)
    got = set(np.asarray(eid2)[0][np.asarray(m2)[0]].tolist())
    want = set(range(int(indptr[k]), int(indptr[k+1])))
    assert got == want, (got, want)
    print("take-all OK")

    # 4: frequency ~ probs (replace=True), one seed with 4 edges
    cand = np.where(deg == 4)[0]
    assert len(cand), "need a degree-4 node for the frequency test"
    k4 = int(cand[0])
    pr = probs.copy()
    seg = slice(int(indptr[k4]), int(indptr[k4]+4))
    pr[seg] = [0.1, 0.2, 0.3, 0.4]
    counts = np.zeros(4)
    for t in range(300):
        nb3, eid3, m3 = sample_neighbors_prob_device(ip, ix, jnp.asarray(pr), jnp.asarray([k4], dtype=jnp.int32), 1, jax.random.PRNGKey(100+t), cap=64, replace=True)
        counts[int(np.asarray(eid3)[0,0]) - int(indptr[k4])] += 1
    freq = counts / counts.sum()
    assert np.abs(freq - np.array([0.1,0.2,0.3,0.4])).max() < 0.08, freq
    print("replace frequency OK", freq)

    # 5: Gumbel top-1 frequency ~ probs (w/o replacement first pick)
    counts = np.zeros(4)
    for t in range(300):
        nb3, eid3, m3 = sample_neighbors_prob_device(ip, ix, jnp.asarray(pr), jnp.asarray([k4], dtype=jnp.int32), 1, jax.random.PRNGKey(500+t), cap=64)
        counts[int(np.asarray(eid3)[0,0]) - int(indptr[k4])] += 1
    freq = counts / counts.sum()
    assert np.abs(freq - np.array([0.1,0.2,0.3,0.4])).max() < 0.08, freq
    print("gumbel frequency OK", freq)

    # 6: per-etype fanouts
    outs = sample_neighbors_etype_device(
        [(ip, ix), (ip, ix)], seeds, [3, 7], jax.random.PRNGKey(2),
        probs_per_etype=[None, jnp.asarray(probs)])
    assert outs[0][0].shape == (64, 3) and outs[1][0].shape == (64, 7)
    print("etype fanouts OK")