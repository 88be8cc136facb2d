"""Operator namespace: fused message-passing ops.

Mirrors the reference's generated API surface
(``python/dgl/ops/spmm.py:224-237``, ``ops/sddmm.py:146-153``): every
``{op}_{reduce}`` / ``{lhs}_{op}_{rhs}`` name is generated here.
"""
from __future__ import annotations

import sys

from .gspmm import gspmm, gspmm_unit
from .gsddmm import gsddmm, gsddmm_unit
from .edge_softmax import edge_softmax, edge_softmax_unit
from .segment import (
    segment_reduce,
    segment_softmax,
    segment_mm,
    gather_mm,
    scatter_add,
)

__all__ = [
    "gspmm", "gsddmm", "edge_softmax", "segment_reduce", "segment_softmax",
    "segment_mm", "gather_mm", "scatter_add", "copy_u", "copy_e",
]

_mod = sys.modules[__name__]


def copy_u(g, x):
    """Per-edge copy of source data (reference ``ops.copy_u``)."""
    return gsddmm(g, "copy_lhs", x, None, "u", "v")


def copy_e(g, x):
    return gsddmm(g, "copy_rhs", None, x, "u", "e")


def copy_v(g, x):
    """Per-edge copy of destination data (reference ``ops.copy_v``,
    ``ops/sddmm.py:179``)."""
    return gsddmm(g, "copy_rhs", None, x, "u", "v")


def _make_gspmm(binary_op, reduce_op):
    if binary_op.startswith("copy_"):
        if binary_op == "copy_u":
            def func(g, x, etype=None):
                return gspmm(g, "copy_lhs", reduce_op, x, None, etype=etype)
        else:
            def func(g, x, etype=None):
                return gspmm(g, "copy_rhs", reduce_op, None, x, etype=etype)
        func.__name__ = f"{binary_op}_{reduce_op}"
        func.__doc__ = (f"gspmm: message = {binary_op}, reduce = {reduce_op} "
                        f"(reference ops/spmm.py generated op)")
        return func

    def func(g, x, y, etype=None):
        return gspmm(g, binary_op, reduce_op, x, y, etype=etype)
    func.__name__ = f"u_{binary_op}_e_{reduce_op}"
    func.__doc__ = (f"gspmm: message = u {binary_op} e, reduce = {reduce_op}")
    return func


for _r in ("sum", "max", "min", "mean"):
    for _b in ("add", "sub", "mul", "div"):
        setattr(_mod, f"u_{_b}_e_{_r}", _make_gspmm(_b, _r))
        __all__.append(f"u_{_b}_e_{_r}")
    for _c in ("copy_u", "copy_e"):
        setattr(_mod, f"{_c}_{_r}", _make_gspmm(_c, _r))
        __all__.append(f"{_c}_{_r}")


_TARGET = {"u": "u", "v": "v", "e": "e"}


def _make_gsddmm(lhs, binary_op, rhs):
    def func(g, x, y, etype=None):
        return gsddmm(g, binary_op, x, y, lhs_target=lhs, rhs_target=rhs,
                      etype=etype)
    func.__name__ = f"{lhs}_{binary_op}_{rhs}"
    func.__doc__ = (f"gsddmm: out = {lhs} {binary_op} {rhs} per edge "
                    f"(reference ops/sddmm.py generated op)")
    return func


for _b in ("add", "sub", "mul", "div", "dot"):
    for _l in ("u", "v", "e"):
        for _r2 in ("u", "v", "e"):
            if _l == _r2:
                continue
            setattr(_mod, f"{_l}_{_b}_{_r2}", _make_gsddmm(_l, _b, _r2))
            __all__.append(f"{_l}_{_b}_{_r2}")

del _mod, _make_gspmm, _make_gsddmm, _r, _b, _c, _l, _r2


def reshape_lhs_rhs(lhs_data, rhs_data):
    """Pad the lower-rank operand's feature shape with leading 1s so both
    broadcast cleanly (reference ``ops/spmm.py:13`` /
    ``ops/sddmm.py:14``)."""
    from .gspmm import align_feat_ranks
    return align_feat_ranks(lhs_data, rhs_data)
