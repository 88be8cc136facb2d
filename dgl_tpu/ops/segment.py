"""Segment ops: segment_reduce / scatter_add / segment_softmax / segment_mm.

Reference: ``src/array/cpu/segment_reduce.h:89,172``,
``src/array/cuda/segment_reduce.cuh:30-254``, Python wrappers
``python/dgl/ops/segment.py:9,62,106``.

``seglen``-based API (lengths per segment, concatenated values) mirrors the
reference; TPU-side everything is jnp segment ops over an id-per-row vector
derived from the lengths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _ids_from_seglen(seglen: jnp.ndarray, total: int) -> jnp.ndarray:
    """Row -> segment id from per-segment lengths.  ``total`` static."""
    offsets = jnp.cumsum(seglen)
    return jnp.searchsorted(
        offsets, jnp.arange(total, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)


def segment_reduce(seglen, value, reducer: str = "sum"):
    """Reduce consecutive row segments (reference ``dgl.ops.segment_reduce``,
    ``python/dgl/ops/segment.py:9``)."""
    n = value.shape[0]
    num_segments = seglen.shape[0]
    ids = _ids_from_seglen(seglen, n)
    if reducer in ("sum", "mean"):
        out = jax.ops.segment_sum(value, ids, num_segments=num_segments,
                                  indices_are_sorted=True)
        if reducer == "mean":
            denom = jnp.maximum(seglen, 1).astype(out.dtype)
            out = out / denom.reshape((-1,) + (1,) * (out.ndim - 1))
        return out
    if reducer in ("max", "min"):
        seg = jax.ops.segment_max if reducer == "max" else jax.ops.segment_min
        out = seg(value, ids, num_segments=num_segments,
                  indices_are_sorted=True)
        empty = (seglen == 0).reshape((-1,) + (1,) * (out.ndim - 1))
        return jnp.where(empty, jnp.zeros_like(out), out)
    raise ValueError(f"invalid reducer {reducer!r}")


def scatter_add(x, idx, m: int):
    """Scatter-add rows of ``x`` into ``m`` rows by index (reference
    ``ScatterAdd``)."""
    return jax.ops.segment_sum(x, idx.astype(jnp.int32), num_segments=m)


def segment_softmax(seglen, value):
    """Softmax within each consecutive segment (reference
    ``dgl.ops.segment_softmax``)."""
    n = value.shape[0]
    ids = _ids_from_seglen(seglen, n)
    smax = jax.ops.segment_max(value, ids, num_segments=seglen.shape[0],
                               indices_are_sorted=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    value = jnp.exp(value - jnp.take(smax, ids, axis=0))
    ssum = jax.ops.segment_sum(value, ids, num_segments=seglen.shape[0],
                               indices_are_sorted=True)
    return value / jnp.take(jnp.maximum(ssum, 1e-20), ids, axis=0)


def segment_mm(a, b, seglen_a):
    """Per-segment dense GEMM (reference ``SegmentMM``,
    ``src/array/kernel.cc:47``): rows of ``a`` are grouped by consecutive
    segments; segment ``i`` is multiplied with ``b[i]``.

    a: (N, D1), b: (R, D1, D2), seglen_a: (R,) with sum == N.

    TPU mapping: ``jax.lax.ragged_dot`` — XLA's grouped GEMM primitive (the
    same op that drives MoE expert layers), which tiles each segment onto the
    MXU without materializing per-row weights.
    """
    return jax.lax.ragged_dot(a, b, seglen_a.astype(jnp.int32))


def gather_mm(a, b, idx_a=None, idx_b=None):
    """Gather-matmul (reference ``GatherMM``, ``src/array/cuda/gather_mm.cu``):
    ``out[i] = a[idx_a[i]] @ b[idx_b[i]]``.

    Unsorted rows are sorted by weight index, run through the grouped-GEMM
    ``ragged_dot`` fast path, and scattered back — the TPU analogue of the
    reference's recommendation to type-sort edges for ``segment_mm``
    (``python/dgl/nn/pytorch/linear.py TypedLinear``).
    """
    if idx_a is not None:
        a = jnp.take(a, idx_a.astype(jnp.int32), axis=0)
    if idx_b is None:
        raise ValueError("gather_mm requires idx_b (per-row weight index)")
    idx_b = idx_b.astype(jnp.int32)
    num_rel = b.shape[0]
    order = jnp.argsort(idx_b, stable=True)
    a_sorted = jnp.take(a, order, axis=0)
    seglen = jnp.zeros((num_rel,), jnp.int32).at[idx_b].add(1)
    out_sorted = jax.lax.ragged_dot(a_sorted, b, seglen)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))
    return jnp.take(out_sorted, inv, axis=0)
