"""On-device (jittable) neighbor sampling — the TPU analog of the
reference's GPU samplers (``src/array/cuda/rowwise_sampling.cu``,
``graphbolt/src/cuda/neighbor_sampler.cu``).

Host samplers (``sampling/neighbor.py`` + the OpenMP pickers) own the
general case; this module covers the UVA-style regime where the graph's
CSC lives in device HBM and sampling should happen inside the jitted
step with NO host round-trip.  Everything is static-shape: outputs are
``(num_seeds, fanout)`` id tensors + validity masks, so a sampled
frontier feeds a padded block directly.

Design notes (XLA semantics):
* without-replacement picks run an exact Fisher-Yates over the virtual
  identity array — per pick, the "already swapped" positions are
  resolved by a most-recent-write scan over the O(fanout) recorded
  swaps (fanout^2 vectorized ``where``s; fanout <= 32 in practice,
  trivially cheap next to the gathers);
* randomness comes from a ``jax.random`` key (counter-based, splittable
  inside jit) — the moral analog of the reference's per-thread PCG
  (``src/random/random.cc``);
* the neighbor gather is one ``jnp.take`` of (S*fanout) rows — small
  next to feature tensors, so the TPU's weak gather is acceptable here.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fanout", "replace"))
def sample_neighbors_device(indptr, indices, seeds, fanout: int, key,
                            replace: bool = False):
    """Uniformly sample ``fanout`` in-neighbors per seed on device.

    Args:
      indptr, indices: device CSC (or CSR for out-neighbors) arrays.
      seeds: (S,) int32 node ids.
      fanout: static picks per seed.
      key: jax PRNG key.
      replace: sample with replacement (True) or exact distinct picks
        (False; seeds with degree < fanout return all their edges).

    Returns (nbrs, eids, mask):
      nbrs (S, fanout) int32 — sampled neighbor ids (0 where invalid),
      eids (S, fanout) int32 — positions into ``indices`` (= edge ids of
        the CSC order; -1 where invalid),
      mask (S, fanout) bool.
    """
    seeds = seeds.astype(jnp.int32)
    start = jnp.take(indptr, seeds).astype(jnp.int32)          # (S,)
    end = jnp.take(indptr, seeds + 1).astype(jnp.int32)
    deg = end - start
    s = seeds.shape[0]
    u = jax.random.uniform(key, (s, fanout))
    steps = jnp.arange(fanout, dtype=jnp.int32)                # (fanout,)

    if replace:
        j = jnp.floor(u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(deg - 1, 0)[:, None])
        mask = deg[:, None] > 0
    else:
        # exact Fisher-Yates on the virtual identity array [0, deg):
        # at step i pick j ~ U[0, deg-i); the value at j is resolved
        # through the recorded swaps; then virtual[j] <- virtual[deg-1-i]
        picks = []
        wpos = []   # written position per step
        wval = []   # value moved into it (fully resolved at write time)

        def resolve(x, upto):
            # most recent write wins: scan recorded swaps newest-first
            found = jnp.zeros_like(x, dtype=bool)
            val = x
            for k in range(upto - 1, -1, -1):
                hit = (~found) & (x == wpos[k])
                val = jnp.where(hit, wval[k], val)
                found = found | hit
            return val

        for i in range(fanout):
            span = jnp.maximum(deg - i, 1)
            j = jnp.floor(u[:, i] * span).astype(jnp.int32)
            j = jnp.minimum(j, span - 1)
            picks.append(resolve(j, i))
            tail = jnp.maximum(deg - 1 - i, 0)
            wpos.append(j)
            wval.append(resolve(tail, i))
        j = jnp.stack(picks, axis=1)
        mask = steps[None, :] < deg[:, None]

    eids = start[:, None] + j
    eids = jnp.where(mask, eids, 0)
    nbrs = jnp.take(indices, eids.reshape(-1)).reshape(s, fanout)
    nbrs = jnp.where(mask, nbrs, 0).astype(jnp.int32)
    eids = jnp.where(mask, eids, -1).astype(jnp.int32)
    return nbrs, eids, mask


@partial(jax.jit, static_argnames=("fanout", "cap"))
def sample_labors_device(indptr, indices, seeds, fanout: int, key,
                         cap: int = 0):
    """LABOR-0 on device (reference ``labor_sampling.cu`` /
    ``labor_pick.h``; arXiv:2210.13339), static shapes.

    Every source node t draws ONE uniform ``r_t`` per call (shared
    across seeds — the variance-reduction trick); the edge (t -> seed s)
    is kept iff ``r_t <= pi_s`` with ``pi_s = min(1, fanout/deg_s)``,
    and kept edges carry weight ``1/pi_s`` so SpMM-mean stays unbiased.

    XLA needs a static output: each seed gets ``cap`` probe slots
    (default ``4*fanout``).  Seeds with ``deg <= cap`` examine every
    edge — exact LABOR-0.  Hub seeds probe a uniform without-replacement
    subset of ``cap`` edges with the keep test rescaled to
    ``r_t <= fanout/cap``, which keeps the marginal inclusion
    probability exactly ``fanout/deg`` (two-stage thinning) at the cost
    of partial frontier sharing on those seeds only.

    Returns (nbrs, eids, mask, weights), all (S, cap).
    """
    if cap <= 0:
        cap = 4 * fanout
    seeds = seeds.astype(jnp.int32)
    k1, k2 = jax.random.split(key)
    start = jnp.take(indptr, seeds).astype(jnp.int32)
    deg = jnp.take(indptr, seeds + 1).astype(jnp.int32) - start
    s = seeds.shape[0]
    num_nodes = indptr.shape[0] - 1
    r = jax.random.uniform(k1, (num_nodes,))

    # probe positions: take-all when deg <= cap, else FY w/o replacement
    take_all = deg[:, None] <= cap
    j_all = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32), (s, cap))
    _, eids_fy, m_fy = sample_neighbors_device(indptr, indices, seeds,
                                               cap, k2, replace=False)
    j = jnp.where(take_all, j_all, eids_fy - start[:, None])
    probe_mask = jnp.where(take_all,
                           j_all < deg[:, None], m_fy)
    eids = start[:, None] + j
    eids = jnp.where(probe_mask, eids, 0)
    t = jnp.take(indices, eids.reshape(-1)).reshape(s, cap)

    pi = jnp.minimum(1.0, fanout / jnp.maximum(deg, 1))[:, None]
    thresh = jnp.where(take_all, pi, fanout / cap)
    keep = (jnp.take(r, t.reshape(-1)).reshape(s, cap) <= thresh) \
        & probe_mask
    w = jnp.where(keep, 1.0 / jnp.maximum(pi, 1e-12), 0.0)
    nbrs = jnp.where(keep, t, 0).astype(jnp.int32)
    eids = jnp.where(keep, eids, -1).astype(jnp.int32)
    return nbrs, eids, keep, w.astype(jnp.float32)


@partial(jax.jit, static_argnames=("fanout", "cap", "replace"))
def sample_neighbors_prob_device(indptr, indices, probs, seeds,
                                 fanout: int, key, cap: int = None,
                                 replace: bool = False):
    """Weighted (``probs_or_mask``) neighbor sampling on device —
    option parity with the reference's GPU prob sampler
    (``src/array/cuda/rowwise_sampling_prob.cu``,
    ``fused_csc_sampling_graph.h:296-345``).

    ``probs``: (num_edges,) float weights or bool mask in CSC edge
    order (weight 0 / False = never picked).  Without replacement uses
    Gumbel top-k over the log-weights — exactly the reference's
    Efraimidis–Spirakis A-ES successive weighted sampling; with
    replacement uses per-pick categorical draws.

    Static-shape note: each seed examines at most ``cap`` edges
    (default ``max(4*fanout, 64)``); seeds with degree <= cap are
    EXACT.  Hubs beyond cap sample a uniform without-replacement probe
    subset first (the same two-stage regime as
    ``sample_labors_device``) — pass ``cap >= max_degree`` for
    exactness everywhere.

    Returns (nbrs, eids, mask) like :func:`sample_neighbors_device`.
    """
    if cap is None:
        cap = max(4 * fanout, 64)
    seeds = seeds.astype(jnp.int32)
    start = jnp.take(indptr, seeds).astype(jnp.int32)
    end = jnp.take(indptr, seeds + 1).astype(jnp.int32)
    deg = end - start
    s = seeds.shape[0]
    k_probe, k_draw = jax.random.split(key)

    # probe positions (S, cap): all edges when deg <= cap, else a
    # uniform without-replacement subset via per-seed random keys
    steps = jnp.arange(cap, dtype=jnp.int32)
    take_all = deg[:, None] > steps[None, :]
    r = jax.random.uniform(k_probe, (s, cap))
    probe_rand = jnp.floor(
        r * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
    pos = jnp.where(deg[:, None] <= cap, steps[None, :], probe_rand)
    pos = jnp.minimum(pos, jnp.maximum(deg - 1, 0)[:, None])
    valid = jnp.where(deg[:, None] <= cap, take_all, deg[:, None] > 0)
    epos = start[:, None] + pos                           # (S, cap)
    w = jnp.take(probs.astype(jnp.float32), epos.reshape(-1)
                 ).reshape(s, cap)
    w = jnp.where(valid, w, 0.0)
    logit = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-38)), -jnp.inf)

    if replace:
        # (S, fanout) categorical draws over the probe logits
        picks = jax.random.categorical(
            k_draw, logit[:, None, :], axis=-1,
            shape=(s, fanout))                            # (S, fanout)
        any_w = (w > 0).any(axis=1)
        mask = jnp.broadcast_to(any_w[:, None], (s, fanout))
    else:
        # Gumbel top-k == weighted sampling WITHOUT replacement
        gmb = jax.random.gumbel(k_draw, (s, cap))
        scored = jnp.where(jnp.isfinite(logit), logit + gmb, -jnp.inf)
        _, picks = jax.lax.top_k(scored, fanout)          # (S, fanout)
        # slot i valid iff at least i+1 positive-weight edges
        n_pos = (w > 0).sum(axis=1)
        mask = jnp.arange(fanout)[None, :] < n_pos[:, None]

    eids = jnp.take_along_axis(epos, picks, axis=1)
    eids = jnp.where(mask, eids, 0)
    nbrs = jnp.take(indices, eids.reshape(-1)).reshape(s, fanout)
    nbrs = jnp.where(mask, nbrs, 0).astype(jnp.int32)
    eids = jnp.where(mask, eids, -1).astype(jnp.int32)
    return nbrs, eids, mask


def sample_neighbors_etype_device(csc_per_etype, seeds, fanouts, key,
                                  probs_per_etype=None,
                                  replace: bool = False):
    """Per-edge-type fanouts on device (reference contract
    ``fused_csc_sampling_graph.h:296-345``: ``len(fanouts) == 1`` =
    shared across etypes, else one per etype; ``-1`` = take every
    edge is NOT supported here — static shapes need a finite fanout).

    ``csc_per_etype``: sequence of (indptr, indices) device arrays, one
    per etype; ``probs_per_etype``: optional per-etype edge
    probs/masks.  Returns a list of (nbrs, eids, mask) per etype.
    """
    n_et = len(csc_per_etype)
    if isinstance(fanouts, int):
        fanouts = [fanouts] * n_et
    elif len(fanouts) == 1:
        fanouts = list(fanouts) * n_et
    if len(fanouts) != n_et:
        raise ValueError(f"{len(fanouts)} fanouts for {n_et} etypes")
    out = []
    for i, (indptr, indices) in enumerate(csc_per_etype):
        key, sub = jax.random.split(key)
        probs = probs_per_etype[i] if probs_per_etype is not None \
            else None
        if probs is None:
            out.append(sample_neighbors_device(
                indptr, indices, seeds, int(fanouts[i]), sub,
                replace=replace))
        else:
            out.append(sample_neighbors_prob_device(
                indptr, indices, probs, seeds, int(fanouts[i]), sub,
                replace=replace))
    return out


def bit_has_edge(bitfmt, u, v):
    """Vectorized O(1) edge-existence test against a bit-packed
    adjacency (``ops.pallas.bitmm.BitFormat``): one word gather + bit
    test per query, jittable.

    ``u``/``v``: int32 arrays of src/dst ids.  Returns bool of the same
    shape.  (The packed layout: ``packed[d, j]`` bit ``b`` set iff edge
    ``(src = b*N32 + j) -> d`` exists.)
    """
    n32 = bitfmt.packed.shape[1]
    b = (u // n32).astype(jnp.uint32)
    j = u % n32
    words = bitfmt.packed[v, j]
    return ((words >> b) & 1).astype(bool)


@partial(jax.jit, static_argnames=("num_samples", "num_retries",
                                   "exclude_self_loops"))
def global_uniform_negative_sampling_device(bitfmt, key,
                                            num_samples: int,
                                            num_nodes: int,
                                            num_retries: int = 3,
                                            exclude_self_loops: bool =
                                            True):
    """Uniform negative-edge sampling with EXACT rejection on device
    (reference ``src/array/cpu/negative_sampling.cc`` — hash-based
    rejection; here the bit-packed adjacency answers existence in one
    gather).  Static shapes: returns ``(src, dst, mask)`` of length
    ``num_samples``; slots that still collide after ``num_retries``
    redraws are masked out (expected fraction density^retries).
    """
    src = jnp.zeros((num_samples,), jnp.int32)
    dst = jnp.zeros((num_samples,), jnp.int32)
    bad = jnp.ones((num_samples,), bool)
    for _ in range(num_retries):
        key, k1, k2 = jax.random.split(key, 3)
        u = jax.random.randint(k1, (num_samples,), 0, num_nodes,
                               dtype=jnp.int32)
        v = jax.random.randint(k2, (num_samples,), 0, num_nodes,
                               dtype=jnp.int32)
        take = bad
        src = jnp.where(take, u, src)
        dst = jnp.where(take, v, dst)
        exists = bit_has_edge(bitfmt, src, dst)
        if exclude_self_loops:
            exists = exists | (src == dst)
        bad = bad & exists
    return src, dst, ~bad


@partial(jax.jit, static_argnames=("capacity",))
def unique_with_capacity(ids, mask, capacity: int):
    """Static-shape unique: distinct valid ids compacted to the front of
    a ``(capacity,)`` buffer (-1 padded), plus the distinct count.

    The device-side piece of ``unique_and_compact``
    (``graphbolt/src/unique_and_compact.cc:121``) for block building.
    """
    flat = ids.reshape(-1).astype(jnp.int32)
    m = mask.reshape(-1)
    big = jnp.iinfo(jnp.int32).max
    vals = jnp.where(m, flat, big)
    vals = jnp.sort(vals)
    first = jnp.concatenate(
        [jnp.array([True]), vals[1:] != vals[:-1]]) & (vals != big)
    pos = jnp.cumsum(first) - 1
    out = jnp.full((capacity + 1,), -1, jnp.int32)
    scatter_to = jnp.where(first, jnp.minimum(pos, capacity - 1), capacity)
    out = out.at[scatter_to].set(jnp.where(first, vals, -1))
    return out[:capacity], jnp.minimum(first.sum(), capacity)
