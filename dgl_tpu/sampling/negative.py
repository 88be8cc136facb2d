"""Global uniform negative edge sampling (reference
``python/dgl/sampling/negative.py:39``, C++ ``negative_sampling.cc``):
propose uniform (u, v) pairs, reject existing edges via hash lookup, redraw.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph
from ..utils import np_rng


def global_uniform_negative_sampling(g: Graph, num_samples: int,
                                     exclude_self_loops: bool = True,
                                     replace: bool = False,
                                     etype=None, redundancy: float = 1.3):
    unit = g.unit(etype)
    rng = np_rng()
    row, col = (np.asarray(x) for x in unit.coo())
    existing = set(zip(row.tolist(), col.tolist()))
    out_u, out_v = [], []
    seen = set()
    budget = int(num_samples * redundancy) + 16
    tries = 0
    while len(out_u) < num_samples and tries < 10:
        u = rng.integers(0, unit.num_src, budget)
        v = rng.integers(0, unit.num_dst, budget)
        for uu, vv in zip(u.tolist(), v.tolist()):
            if exclude_self_loops and uu == vv:
                continue
            if (uu, vv) in existing:
                continue
            if not replace:
                if (uu, vv) in seen:
                    continue
                seen.add((uu, vv))
            out_u.append(uu)
            out_v.append(vv)
            if len(out_u) >= num_samples:
                break
        tries += 1
    return (jnp.asarray(np.array(out_u, np.int32)),
            jnp.asarray(np.array(out_v, np.int32)))
