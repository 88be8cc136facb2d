"""LABOR sampling (reference ``src/array/cpu/labor_pick.h``,
``python/dgl/sampling/labor.py``; arXiv:2210.13339).

Layer-dependent variance-reduced sampling.  Each source node t gets one
uniform r_t ~ U(0,1) per layer (shared across all seeds of the layer); an
edge (t -> s) is kept iff ``r_t <= pi_{t,s}``.  Shared randomness makes
different seeds pick the *same* source nodes, shrinking the sampled
frontier vs independent sampling.

Variants (matching the reference's ``importance_sampling`` argument,
``labor_pick.h:50-165``):

* ``importance_sampling == 0`` (LABOR-0): ``pi = min(1, k/d_s)``; kept
  edges get weights ``1/pi`` so SpMM-mean stays unbiased.
* ``importance_sampling != 0`` (LABOR-*): iteratively refine per-source
  probabilities ``pi_t = max_s(c_s)`` (Eq 18) and per-seed scale ``c_s``
  solving the variance fixed point (Eq 22), for the given number of
  iterations (negative = until the expected frontier stops shrinking).
  Kept edges get per-row normalized ``A/p`` weights so ``fn.mean`` is
  unbiased (reference ``labor_pick.h:260-266``).

The picker is fully vectorized over all seed rows (no per-seed Python
loop): per-iteration cost is O(total_hop_edges) numpy.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, EID
from ..utils import np_rng

_EPS = 1e-4


def _labor_pick_rows(indptr: np.ndarray, indices: np.ndarray,
                     eids: np.ndarray, seeds: np.ndarray, k: int,
                     r: np.ndarray, A: Optional[np.ndarray],
                     importance_sampling: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized LABOR pick over all seed rows at once.

    Returns (positions into the indptr/indices layout, weights)."""
    deg = (indptr[seeds + 1] - indptr[seeds]).astype(np.int64)
    nz = deg > 0
    seeds_nz = seeds[nz]
    deg_nz = deg[nz]
    n_rows = len(seeds_nz)
    if n_rows == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    # flat positions of every hop edge: starts repeated + intra-row offset
    starts = indptr[seeds_nz]
    row_of = np.repeat(np.arange(n_rows), deg_nz)
    pos = np.repeat(starts, deg_nz) + (
        np.arange(deg_nz.sum()) - np.repeat(
            np.cumsum(deg_nz) - deg_nz, deg_nz))
    t = indices[pos]
    weighted = A is not None
    Ae = A[eids[pos]].astype(np.float64) if weighted else None
    d_tilde = (np.bincount(row_of, weights=Ae, minlength=n_rows)
               if weighted else deg_nz.astype(np.float64))
    with np.errstate(divide="ignore"):
        c = np.where(d_tilde > 0, k / d_tilde, 0.0)

    imp = int(importance_sampling)
    if imp >= 0:
        imp += int(weighted)  # reference: weighted costs one extra iter

    hop = None            # pi_t over the unique frontier (Eq 18)
    ut = inv_t = None
    if imp:
        ut, inv_t = np.unique(t, return_inverse=True)
        prev_ex = float(len(t)) * max(k, 1)
        iters = 0
        while iters < imp or importance_sampling < 0:
            if (not weighted) or iters:
                cur_e = c[row_of] * (Ae if (weighted and iters == 1)
                                     else 1.0)
                m2 = np.zeros(len(ut))
                np.maximum.at(m2, inv_t, cur_e)
                hop = m2 if hop is None else hop * m2
            ps_e = (Ae if hop is None else hop[inv_t])
            # variance target: RHS of Eq 22
            var_target = d_tilde * d_tilde / k
            if weighted:
                var_target = (var_target - d_tilde * d_tilde / deg_nz +
                              np.bincount(row_of, weights=Ae * Ae,
                                          minlength=n_rows))
            a2 = Ae * Ae if weighted else 1.0
            # fixed-point for c_s, all rows at once
            for _ in range(64):
                denom = np.minimum(1.0, c[row_of] * ps_e)
                term = np.where(denom > 0, a2 / np.maximum(denom, 1e-300),
                                0.0)
                var_1 = np.bincount(row_of, weights=term, minlength=n_rows)
                ratio = np.where(var_target > 0, var_1 / var_target, 1.0)
                c = c * ratio
                conv = (np.minimum(var_1, var_target) /
                        np.maximum(np.maximum(var_1, var_target), 1e-300))
                if np.all(conv >= 1 - _EPS):
                    break
            iters += 1
            if (not weighted) or iters > 1:
                if hop is not None:
                    cur_ex = float(np.minimum(1.0, hop).sum())
                    if cur_ex / prev_ex >= 1 - _EPS:
                        break
                    prev_ex = cur_ex

    if imp:
        p_e = np.minimum(1.0, c[row_of] * (hop[inv_t] if imp - weighted
                                           else Ae))
    else:
        p_e = np.minimum(1.0, c[row_of] * (Ae if weighted else 1.0))
    keep = r[t] <= p_e
    kept_pos = pos[keep]
    if imp:
        w = (Ae[keep] if weighted else 1.0) / p_e[keep]
        rows_k = row_of[keep]
        norm_num = np.bincount(rows_k, minlength=n_rows).astype(np.float64)
        norm_den = np.bincount(rows_k, weights=w, minlength=n_rows)
        # mask the denominator BEFORE dividing: np.where still evaluates
        # the 0/0 branch, and the RuntimeWarning it emits would mask
        # real NaN regressions in this file's probability math
        safe_den = np.where(norm_den > 0, norm_den, 1.0)
        norm = np.where(norm_den > 0, norm_num / safe_den, 1.0)
        w = w * norm[rows_k]
    else:
        w = 1.0 / p_e[keep]
    return kept_pos, w.astype(np.float32)


def sample_labors(g: Graph, nodes, fanout, edge_dir: str = "in",
                  prob: Optional[str] = None, importance_sampling: int = 0,
                  random_seed=None, copy_ndata: bool = True,
                  copy_edata: bool = True, output_device=None):
    """Returns (subgraph, edge_weights_list) like the reference
    (``python/dgl/sampling/labor.py:42``)."""
    if not isinstance(nodes, dict):
        if len(g.ntypes) > 1:
            raise ValueError("node dict required for heterographs")
        nodes = {g.ntypes[0]: nodes}
    nodes = {nt: np.asarray(v).astype(np.int64) for nt, v in nodes.items()}
    rng = (np.random.default_rng(random_seed) if random_seed is not None
           else np_rng())

    edge_sel = {}
    weights_out = {}
    for etid, cet in enumerate(g.canonical_etypes):
        st, et, dt = cet
        unit = g._units[etid]
        k = fanout.get(et, fanout.get(cet, 0)) if isinstance(fanout, dict) \
            else fanout
        seed_type = dt if edge_dir == "in" else st
        seeds = nodes.get(seed_type, np.zeros(0, np.int64))
        if len(seeds) == 0 or k == 0:
            edge_sel[cet] = np.zeros(0, np.int64)
            weights_out[cet] = np.zeros(0, np.float32)
            continue
        sp = unit.csc() if edge_dir == "in" else unit.csr()
        indptr = np.asarray(sp.indptr)
        indices = np.asarray(sp.indices)
        eids = np.asarray(sp.eids)
        # one uniform per source node for this layer (shared randomness)
        r = rng.random(unit.num_src if edge_dir == "in" else unit.num_dst)
        A = None
        if prob is not None:
            A = np.asarray(g._edge_frames[etid][prob]).reshape(-1)
        if k < 0:  # full neighborhood
            pos = np.concatenate([np.arange(indptr[s], indptr[s + 1])
                                  for s in seeds]) if len(seeds) else \
                np.zeros(0, np.int64)
            w = np.ones(len(pos), np.float32)
        else:
            pos, w = _labor_pick_rows(indptr, indices, eids, seeds, k, r,
                                      A, importance_sampling)
        edge_sel[cet] = eids[pos]
        weights_out[cet] = w

    from ..graph.subgraph import edge_subgraph
    sub = edge_subgraph(g, edge_sel, relabel_nodes=False, store_ids=True)
    w_list = []
    for etid, cet in enumerate(g.canonical_etypes):
        w = jnp.asarray(weights_out[cet])
        sub._edge_frames[etid]["edge_weights"] = w
        w_list.append(w)
    return sub, w_list
