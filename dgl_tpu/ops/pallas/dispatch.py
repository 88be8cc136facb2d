"""Dispatch to Pallas TPU fast-path kernels when profitable.

The XLA gather+segment-reduce path in ``gspmm.py`` is the always-correct
reference; this module routes the hot (op, reduce) combinations to Pallas
kernels when the graph/operand shapes qualify.  Controlled by
``dgl_tpu.utils.config`` flags (analogue of the reference's libxsmm toggle,
``python/dgl/global_config.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import config


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def try_spmm(unit, op, u_data, e_data):
    """Return result of a Pallas SpMM-sum, or None to fall back to XLA."""
    if not config.use_pallas():
        return None
    if not _on_tpu():
        return None
    if getattr(unit, "prefer_xla", False):
        # builder opted this unit out: e.g. the HeteroGraphConv SAGE
        # union graph replicates the dst domain R times, which explodes
        # the tile-pair count — XLA segment_sum wins there (measured
        # 38.7 ms vs 625 ms at 32 x 100k edges)
        return None
    # Fast path: copy_lhs / mul with 2-D node features, no broadcast.
    if u_data is None or u_data.ndim != 2:
        return None
    if op == "copy_lhs":
        pass
    elif op in ("mul", "div") and e_data is not None and (
            e_data.ndim == 1 or (e_data.ndim == 2 and e_data.shape[1] == 1)):
        pass
    else:
        return None
    try:
        from . import spmm as pallas_spmm
        return pallas_spmm.spmm_sum(unit, op, u_data, e_data)
    except (NotImplementedError, ImportError):
        return None


def try_spmm_static(unit, op, u_data, field, current_w=None):
    """Static-weight SpMM from cached slot weights (see
    ``UnitGraph.cache_edge_weights``), or None to fall back.
    ``current_w`` = the live edata value; staleness guard compares it
    against the object cached at ``cache_edge_weights`` time."""
    if not config.use_pallas() or not _on_tpu():
        return None
    try:
        from . import spmm as pallas_spmm
        return pallas_spmm.spmm_sum_static(unit, op, u_data, field,
                                           current_w=current_w)
    except (NotImplementedError, ImportError):
        return None
