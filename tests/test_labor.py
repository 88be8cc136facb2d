"""LABOR sampler: vectorized picker + importance sampling (VERDICT r1 #6).

Reference: src/array/cpu/labor_pick.h (LABOR-0 + iterative importance
sampling), python/dgl/sampling/labor.py.
"""
import time
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.sampling import sample_labors


def _graph(n=2000, d=20, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n), d)
    src = rng.integers(0, n, len(dst))
    return dgl.graph((src, dst), num_nodes=n)


def test_labor0_shared_randomness_and_weights():
    g = _graph()
    seeds = np.arange(100)
    sub, weights = sample_labors(g, seeds, 5, random_seed=7)
    row, col = (np.asarray(x) for x in sub.unit().coo())
    assert set(col.tolist()) <= set(seeds.tolist())
    w = np.asarray(weights[0])
    assert np.all(w >= 1.0 - 1e-6)
    # shared randomness: same seed -> identical pick
    sub2, _ = sample_labors(g, seeds, 5, random_seed=7)
    np.testing.assert_array_equal(
        np.sort(np.asarray(sub.edata[dgl.EID])),
        np.sort(np.asarray(sub2.edata[dgl.EID])))
    # frontier sharing: LABOR frontier smaller than independent sampling's
    srcs = np.unique(row)
    rng = np.random.default_rng(0)
    ind_srcs = set()
    u = g.unit()
    indptr = np.asarray(u.csc().indptr)
    indices = np.asarray(u.csc().indices)
    for s in seeds:
        nb = indices[indptr[s]:indptr[s + 1]]
        take = min(5, len(nb))
        ind_srcs.update(rng.choice(nb, take, replace=False).tolist())
    assert len(srcs) < len(ind_srcs)


def test_labor_importance_sampling_unbiased_mean():
    """fn.mean with the is!=0 weights must estimate the true neighbor
    mean (reference labor_pick.h:260 'so that fn.mean can be used')."""
    g = _graph(n=500, d=40, seed=1)
    x = np.random.default_rng(2).normal(size=(500,)).astype(np.float64)
    u = g.unit()
    indptr = np.asarray(u.csc().indptr)
    indices = np.asarray(u.csc().indices)
    seeds = np.arange(500)
    true_mean = np.array([x[indices[indptr[s]:indptr[s + 1]]].mean()
                          for s in seeds])
    est = np.zeros(500)
    reps = 40
    for rep in range(reps):
        sub, weights = sample_labors(g, seeds, 8, importance_sampling=2,
                                     random_seed=100 + rep)
        row, col = (np.asarray(a) for a in sub.unit().coo())
        w = np.asarray(weights[0], np.float64)
        num = np.bincount(col, weights=w * x[row], minlength=500)
        den = np.bincount(col, minlength=500)
        est += np.where(den > 0, num / np.maximum(den, 1), 0.0)
    est /= reps
    # statistical tolerance: 40 reps of 8-of-40 sampling
    assert np.abs(est - true_mean).mean() < 0.12


def test_labor_importance_convergence_mode():
    g = _graph(n=300, d=30, seed=3)
    seeds = np.arange(50)
    sub, weights = sample_labors(g, seeds, 4, importance_sampling=-1,
                                 random_seed=1)
    assert sub.num_edges() > 0
    assert np.isfinite(np.asarray(weights[0])).all()


def test_labor_weighted_prob():
    g = _graph(n=300, d=30, seed=4)
    rng = np.random.default_rng(5)
    g.edata["p"] = jnp.asarray(rng.uniform(0.1, 1.0, g.num_edges())
                               .astype(np.float32))
    sub, weights = sample_labors(g, np.arange(60), 5, prob="p",
                                 importance_sampling=1, random_seed=2)
    assert sub.num_edges() > 0
    assert np.isfinite(np.asarray(weights[0])).all()


def test_labor_vectorized_speed():
    """100k seeds in well under a second (the old per-seed Python loop
    took minutes at this scale)."""
    g = _graph(n=100_000, d=25, seed=6)
    seeds = np.arange(100_000)
    t0 = time.time()
    sub, _ = sample_labors(g, seeds, 10, random_seed=0)
    dt = time.time() - t0
    assert sub.num_edges() > 0
    assert dt < 30.0, f"labor pick too slow: {dt:.1f}s"
