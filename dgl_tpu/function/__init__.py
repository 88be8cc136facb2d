"""Builtin message and reduce functions (reference ``python/dgl/function/``).

``fn.copy_u('h', 'm')``, ``fn.u_mul_e('h', 'w', 'm')``, ``fn.sum('m', 'h')``
etc.  These are lightweight descriptors consumed by the fuse-or-fallback
dispatcher in ``dgl_tpu.core`` (reference ``python/dgl/core.py:391-398``).

Generated surface mirrors the reference exactly: ``copy_u``/``copy_e``
(``function/message.py:63,87``), all ordered pairs
``lhs != rhs in {u, v, e}^2 x {add, sub, mul, div, dot}``
(``function/message.py:179-186``), reducers ``sum/max/min/mean``
(``function/reducer.py:71-82``).
"""
from __future__ import annotations

import sys
from typing import NamedTuple


class BuiltinMessage(NamedTuple):
    """Descriptor of a builtin message function."""
    name: str          # e.g. 'u_mul_e'
    binary_op: str     # add/sub/mul/div/dot/copy_lhs/copy_rhs
    lhs: str           # 'u' | 'v' | 'e'
    rhs: str           # 'u' | 'v' | 'e' | None
    lhs_field: str
    rhs_field: str     # '' when unary
    out_field: str


class BuiltinReduce(NamedTuple):
    """Descriptor of a builtin reduce function."""
    name: str          # sum/max/min/mean
    msg_field: str
    out_field: str


_mod = sys.modules[__name__]


def copy_u(u, out):
    """Message = source node feature (reference ``fn.copy_u``)."""
    return BuiltinMessage("copy_u", "copy_lhs", "u", None, u, "", out)


def copy_e(e, out):
    """Message = edge feature (reference ``fn.copy_e``)."""
    return BuiltinMessage("copy_e", "copy_rhs", "e", None, e, "", out)


# deprecated aliases kept by the reference
def copy_src(src, out):
    return copy_u(src, out)


def copy_edge(edge, out):
    return copy_e(edge, out)


def _gen_binary(lhs, op, rhs):
    name = f"{lhs}_{op}_{rhs}"

    def func(lhs_field, rhs_field, out):
        return BuiltinMessage(name, op, lhs, rhs, lhs_field, rhs_field, out)
    func.__name__ = name
    func.__doc__ = (f"Builtin message: out = {lhs}[{'{'}lhs_field{'}'}] {op} "
                    f"{rhs}[{'{'}rhs_field{'}'}] per edge.")
    return func


for _op in ("add", "sub", "mul", "div", "dot"):
    for _l in ("u", "v", "e"):
        for _r in ("u", "v", "e"):
            if _l == _r:
                continue
            setattr(_mod, f"{_l}_{_op}_{_r}", _gen_binary(_l, _op, _r))


def sum(msg, out):  # noqa: A001 - mirrors reference name
    """Reduce by sum (reference ``fn.sum``)."""
    return BuiltinReduce("sum", msg, out)


def max(msg, out):  # noqa: A001
    return BuiltinReduce("max", msg, out)


def min(msg, out):  # noqa: A001
    return BuiltinReduce("min", msg, out)


def mean(msg, out):
    return BuiltinReduce("mean", msg, out)


del _mod, _gen_binary, _op, _l, _r


# Reference base-class names (``function/base.py``, ``message.py``,
# ``reducer.py``): our descriptors are NamedTuples; these aliases keep
# isinstance-style imports working.
BuiltinFunction = (BuiltinMessage, BuiltinReduce)
MessageFunction = BuiltinMessage
BinaryMessageFunction = BuiltinMessage
CopyMessageFunction = BuiltinMessage
ReduceFunction = BuiltinReduce
SimpleReduceFunction = BuiltinReduce


class TargetCode:
    """Operand target codes (reference ``function/base.py TargetCode``)."""
    SRC = 0
    DST = 1
    EDGE = 2
    CODE2STR = {0: "u", 1: "v", 2: "e"}
