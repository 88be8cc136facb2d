"""Streaming int8 x bf16 dense matmul for hub-adjacency blocks.

The hybrid SpMM's dense block ``A (K, N)`` holds edge multiplicities —
small non-negative ints that are exact in int8.  Storing the block bf16
costs 2 bytes/element of HBM *and* 2 bytes/element of stream bandwidth;
at the bench's narrow feature widths (F=16) the dense matmul is purely
HBM-stream-bound, so int8 halves both the capacity limit on K and the
stream time.  XLA cannot keep the operand int8 (``dot_general`` on
int8 x bf16 materializes a bf16 upcast copy in HBM), so this kernel
converts int8 -> bf16 **in VMEM**, tile by tile, and feeds the MXU:

    out[k, f] = sum_n  bf16(A[k, n]) * x[n, f]        (contract_rows=False)
    out[n, f] = sum_k  bf16(A[k, n]) * z[k, f]        (contract_rows=True)

Both orientations stream A exactly once (K*N bytes); the small operand
(x or z) is re-read once per outer block row, and the output block lives
in VMEM across the inner accumulation dim.

Reference semantics replaced: the dense half of cuSPARSE SpMM
(``src/array/cuda/spmm.cu:23-55``) — the int8 stream has no reference
counterpart (GPUs gather; TPUs stream).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 1024      # rows of A per block (outer grid dim in fwd)
BN = 2048      # cols of A per block (inner, accumulated, in fwd)


def _mm_kernel(a_ref, x_ref, o_ref):
    """o[k-block] += bf16(a[k-block, n-block]) @ x[n-block]."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm_t_kernel(a_ref, z_ref, o_ref):
    """o[n-block] += bf16(a[k-block, n-block])^T @ z[k-block]."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), z_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def pad_int8_block(a, bk: int = BK, bn: int = BN):
    """Host-side: zero-pad an int8 (K, N) block to (bk, bn) multiples.
    Do this ONCE at format build — padding on device copies the whole
    multi-GB block."""
    import numpy as np
    k, n = a.shape
    kp, np_ = -(-k // bk) * bk, -(-n // bn) * bn
    if (kp, np_) == (k, n):
        return a
    out = np.zeros((kp, np_), np.int8)
    out[:k, :n] = a
    return out


@partial(jax.jit, static_argnames=("contract_rows",))
def int8_matmul(a, x, contract_rows: bool = False):
    """a: (K_pad, N_pad) int8, block-padded (see :func:`pad_int8_block`).

    contract_rows=False: x (N, F) -> out (K_pad, F) f32.
    contract_rows=True:  x (K, F) -> out (N_pad, F) f32.
    x rows beyond the operand's contraction extent are zero-padded here
    (cheap: x is the small operand)."""
    kp, np_ = a.shape
    f = x.shape[1]
    f_pad = max(128, -(-f // 128) * 128)
    rows = np_ if not contract_rows else kp
    xp = jnp.zeros((rows, f_pad), jnp.bfloat16)
    xp = xp.at[: x.shape[0], :f].set(x.astype(jnp.bfloat16))

    if not contract_rows:
        grid = (kp // BK, np_ // BN)
        out = pl.pallas_call(
            _mm_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((BK, BN), lambda k, n: (k, n)),
                      pl.BlockSpec((BN, f_pad), lambda k, n: (n, 0))],
            out_specs=pl.BlockSpec((BK, f_pad), lambda k, n: (k, 0)),
            out_shape=jax.ShapeDtypeStruct((kp, f_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * kp * np_ * f_pad,
                bytes_accessed=kp * np_ + np_ * f_pad * 2 + kp * f_pad * 4,
                transcendentals=0),
        )(a, xp)
    else:
        grid = (np_ // BN, kp // BK)
        out = pl.pallas_call(
            _mm_t_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((BK, BN), lambda n, k: (k, n)),
                      pl.BlockSpec((BK, f_pad), lambda n, k: (k, 0))],
            out_specs=pl.BlockSpec((BN, f_pad), lambda n, k: (n, 0)),
            out_shape=jax.ShapeDtypeStruct((np_, f_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * kp * np_ * f_pad,
                bytes_accessed=kp * np_ + kp * f_pad * 2 + np_ * f_pad * 4,
                transcendentals=0),
        )(a, xp)
    return out[:, :f]
