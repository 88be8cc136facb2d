"""int32 capacity-boundary guards (VERDICT r4 #6; docs/capacity.md).

The reference defaults to int64 ids (``python/dgl/convert.py:94-98``);
dgl_tpu is int32-by-design, so every boundary must raise a clear error
instead of silently wrapping.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu.graph.unitgraph import (UnitGraph, check_id_capacity,
                                     INT32_MAX)

BIG = INT32_MAX + 1


def test_check_id_capacity_messages():
    check_id_capacity(INT32_MAX, INT32_MAX, INT32_MAX)   # at the line: ok
    with pytest.raises(ValueError, match="num_src.*int32"):
        check_id_capacity(BIG, 1, 1)
    with pytest.raises(ValueError, match="num_edges.*int32"):
        check_id_capacity(1, 1, BIG)
    with pytest.raises(ValueError, match="shard the graph"):
        check_id_capacity(1, BIG, 1)


def test_graph_factory_guards_num_nodes():
    with pytest.raises(ValueError, match="int32"):
        dgl.graph((np.array([0]), np.array([0])), num_nodes=BIG)


def test_unitgraph_ctor_guards():
    with pytest.raises(ValueError, match="int32"):
        UnitGraph(BIG, 4, 2)
    with pytest.raises(ValueError, match="int32"):
        UnitGraph(4, 4, BIG)


def test_mesh_csc_guards_global_node_ids():
    from dgl_tpu.parallel.mesh_minibatch import _pack_mesh_csc
    with pytest.raises(ValueError, match="int32 global node ids"):
        _pack_mesh_csc(np.array([0]), np.array([0]), BIG,
                       BIG // 8 + 1, 8)


def test_mesh_csc_per_shard_edge_guard(monkeypatch):
    """Per-shard overflow raises with the 'increase num_parts' hint —
    exercised by faking the bincount (2^31 real edges won't allocate)."""
    from dgl_tpu.parallel import mesh_minibatch as mm
    real_bincount = np.bincount

    def fake_bincount(x, minlength=0):
        out = real_bincount(x, minlength=minlength).astype(np.int64)
        out[0] = INT32_MAX + 7
        return out

    monkeypatch.setattr(mm.np, "bincount", fake_bincount)
    with pytest.raises(ValueError, match="increase num_parts"):
        mm._pack_mesh_csc(np.array([1, 2]), np.array([0, 1]), 16, 2, 8)


def test_device_bitmask_2d_scatter_no_flat_overflow():
    """The device packer's scatter must be 2-D indexed: parity with the
    host packer on a graph where flat int32 products would be fine, and
    the index math never materializes row*n32 + word (structural check:
    build at a size whose flat index space exceeds int32 is not
    allocatable in CI, so verify parity + the 2-D code path)."""
    from dgl_tpu.ops.pallas.bitmm import (build_bit_format,
                                          build_bit_format_device)
    rng = np.random.default_rng(0)
    n, e = 700, 4000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    h = build_bit_format(row, col, n, n)
    d = build_bit_format_device(row, col, n, n)
    np.testing.assert_array_equal(np.asarray(h.packed),
                                  np.asarray(d.packed))
    np.testing.assert_array_equal(np.asarray(h.packed_rev),
                                  np.asarray(d.packed_rev))
