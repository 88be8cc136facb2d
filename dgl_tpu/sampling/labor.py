"""LABOR sampling (reference ``src/array/cpu/labor_pick.h``,
``python/dgl/sampling/labor.py``; arXiv:2210.13339).

LABOR-0: layer-dependent variance-reduced sampling.  Each source node t gets
one uniform r_t ~ U(0,1) per layer (shared across all seeds of the layer);
an edge (t -> s) is kept iff ``r_t <= k / d_s`` where d_s is the in-degree
of seed s (capped at 1).  Shared randomness makes different seeds pick the
*same* source nodes, shrinking the sampled-subgraph frontier vs independent
sampling — the property that matters for minibatch cost.

Kept edges get importance weights 1/min(1, k/d_s) so SpMM-mean stays
unbiased (``edge_weights`` output, as in the reference's labor sampler).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, EID
from ..utils import np_rng


def sample_labors(g: Graph, nodes, fanout, edge_dir: str = "in",
                  prob: Optional[str] = None, importance_sampling: int = 0,
                  random_seed=None, copy_ndata: bool = True,
                  copy_edata: bool = True, output_device=None):
    """Returns (subgraph, edge_weights_list) like the reference."""
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
        src_type = st if edge_dir == "in" else dt
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
        picks = []
        ws = []
        for s in seeds:
            lo, hi = indptr[s], indptr[s + 1]
            d = hi - lo
            if d == 0:
                continue
            if k < 0 or d <= k:
                pos = np.arange(lo, hi)
                w = np.ones(len(pos))
            else:
                pi = k / d
                keep = r[indices[lo:hi]] <= pi
                pos = np.arange(lo, hi)[keep]
                w = np.full(len(pos), 1.0 / pi)
            picks.append(pos)
            ws.append(w)
        if picks:
            pos = np.concatenate(picks)
            edge_sel[cet] = eids[pos]
            weights_out[cet] = np.concatenate(ws).astype(np.float32)
        else:
            edge_sel[cet] = np.zeros(0, np.int64)
            weights_out[cet] = np.zeros(0, np.float32)

    from ..graph.subgraph import edge_subgraph
    sub = edge_subgraph(g, edge_sel, relabel_nodes=False, store_ids=True)
    w_list = []
    for etid, cet in enumerate(g.canonical_etypes):
        w = jnp.asarray(weights_out[cet])
        sub._edge_frames[etid]["edge_weights"] = w
        w_list.append(w)
    return sub, w_list
