"""Alternative functional message-passing API (reference
``python/dgl/mpops/__init__.py``: edgewise/nodewise/fused wrappers like
``copy_u_sum``).  Thin aliases over ``dgl_tpu.ops``."""
from ..ops import *  # noqa: F401,F403
from ..ops import gspmm, gsddmm


def copy_u(g, x):
    return gsddmm(g, "copy_lhs", x, None, "u", "v")


def copy_e(g, x):
    return gsddmm(g, "copy_rhs", None, x, "u", "e")


def copy_v(g, x):
    """Per-edge copy of destination data (reference ``mpops`` alias)."""
    from ..ops import copy_v as _copy_v
    return _copy_v(g, x)
