"""Sweep transposed-bitmask-kernel variants on chip (synthetic bits).

The transposed kernel is VPU-unpack-bound (~3 ops/entry: shift, and,
int->bf16 convert); variants below attack the per-entry op count and the
dot granularity.  Bits are generated ON DEVICE (no 6.5 GB upload), at
N=K=110592 (~22% of Reddit-scale area) — VPU cost scales with area.

Usage: PYTHONPATH=/root/repo python tools/perf_bitmm_variants.py
"""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KP = 110_592           # 216 * 512
NP_ = 110_592          # -> n32 = 3456 = 13.5 * 256
N32 = NP_ // 32
F_PAD = 16
AREA = KP * NP_


def timed(fn, args_list, sync, reps=5):
    out = fn(*args_list[0])
    _ = sync(out)
    t0 = time.perf_counter()
    for a in args_list[1:reps + 1]:
        out = fn(*a)
    _ = sync(out)
    return (time.perf_counter() - t0) / reps


# ---- V0: current kernel (shift+and+convert, 32 dots) -----------------
def _k_v0(x_ref, p_ref, o_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]
    xt = x_ref[:]
    for b in range(32):
        a_b = ((p >> b) & 1).astype(jnp.bfloat16)
        o_ref[b, :, :] += jax.lax.dot_general(
            xt, a_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ---- V3: mask-only unpack (and+convert); 2^b scale folded outside ----
def _k_v3(x_ref, p_ref, o_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]
    xt = x_ref[:]
    for b in range(32):
        a_b = (p & np.int32(np.uint32(1) << b)).astype(jnp.bfloat16)
        o_ref[b, :, :] += jax.lax.dot_general(
            xt, a_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ---- V1: single fused dot per grid step ------------------------------
def _k_v1(x_ref, p_ref, o_ref, *, bw32):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]                                    # (BR, BW32)
    planes = [((p >> b) & 1).astype(jnp.bfloat16) for b in range(32)]
    a_all = jnp.concatenate(planes, axis=1)         # (BR, 32*BW32)
    o_ref[:] += jax.lax.dot_general(
        x_ref[:], a_all, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---- V4: V3 mask-unpack + single fused dot ---------------------------
def _k_v4(x_ref, p_ref, o_ref, *, bw32):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]
    planes = [(p & np.int32(np.uint32(1) << b)).astype(jnp.bfloat16)
              for b in range(32)]
    a_all = jnp.concatenate(planes, axis=1)
    o_ref[:] += jax.lax.dot_general(
        x_ref[:], a_all, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---- V5: swapped operand order — a_b streams as the M side, xt is the
# (K=br, N=F_PAD) stationary operand shared by all 32 plane dots.  The
# current orientation reloads MXU weight tiles every M=16 rows (12.5%
# sublane use); here M=bw32 amortizes the weight loads 16x, at the cost
# of N=F_PAD=16 lane padding.  Empirical question: which padding is
# cheaper on v5e.  Output layout (32, bw32, F_PAD) plane-major by word.
def _k_v5(x_ref, p_ref, o_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]                 # (br, bw32)
    xt = x_ref[:]                # (F_PAD, br)
    for b in range(32):
        a_b = (p & np.int32(np.uint32(1) << b)).astype(xt.dtype)
        o_ref[b, :, :] += jax.lax.dot_general(
            a_b, xt, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (bw32, F_PAD)


# ---- V7: single wide dot in the swapped orientation — all 32 planes
# concatenated on the M side (one (br, 32*bw32) x (br, F_PAD) dot).
def _k_v7(x_ref, p_ref, o_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]
    xt = x_ref[:]
    a_cat = jnp.concatenate(
        [(p & np.int32(np.uint32(1) << b)).astype(xt.dtype)
         for b in range(32)], axis=1)               # (br, 32*bw32)
    o_ref[:] += jax.lax.dot_general(
        a_cat, xt, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(o_ref.shape)


def make_swapped(kernel, br, bw32, single=False, interpret=False):
    grid = (N32 // bw32, KP // br)
    if single:
        out_spec = pl.BlockSpec((32 * bw32, F_PAD), lambda d, n: (d, 0))
        out_shape = jax.ShapeDtypeStruct((32 * N32, F_PAD), jnp.float32)
    else:
        out_spec = pl.BlockSpec((32, bw32, F_PAD), lambda d, n: (0, d, 0))
        out_shape = jax.ShapeDtypeStruct((32, N32, F_PAD), jnp.float32)

    @jax.jit
    def run(packed, xt):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((F_PAD, br), lambda d, n: (0, n)),
                      pl.BlockSpec((br, bw32), lambda d, n: (n, d))],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * AREA * F_PAD,
                bytes_accessed=AREA // 8 + KP * F_PAD * 2,
                transcendentals=0),
            interpret=interpret,
        )(xt, packed)
    return run


def make(kernel, br, bw32, out_planes=True, interpret=False):
    grid = (N32 // bw32, KP // br)
    if out_planes:
        out_spec = pl.BlockSpec((32, F_PAD, bw32), lambda d, n: (0, 0, d))
        out_shape = jax.ShapeDtypeStruct((32, F_PAD, N32), jnp.float32)
    else:
        out_spec = pl.BlockSpec((F_PAD, 32 * bw32), lambda d, n: (0, d))
        out_shape = jax.ShapeDtypeStruct((F_PAD, 32 * N32), jnp.float32)

    @jax.jit
    def run(packed, xt):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((F_PAD, br), lambda d, n: (0, n)),
                      pl.BlockSpec((br, bw32), lambda d, n: (n, d))],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * AREA * F_PAD,
                bytes_accessed=AREA // 8 + KP * F_PAD * 2,
                transcendentals=0),
            interpret=interpret,
        )(xt, packed)
    return run


def main():
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    packed = jax.random.randint(k1, (KP, N32), -2**31, 2**31 - 1,
                                dtype=jnp.int32)
    packed.block_until_ready()
    xts = [jax.random.normal(jax.random.PRNGKey(i + 7), (F_PAD, KP),
                             dtype=jnp.bfloat16) for i in range(7)]
    for x in xts:
        x.block_until_ready()
    sync = lambda o: float(o.ravel()[0])

    full_scale = 233472 * 237568 / AREA

    configs = [
        ("V3 mask  br1024 bw256", make(_k_v3, 1024, 256)),
        ("V5 swap  br1024 bw256", make_swapped(_k_v5, 1024, 256)),
        ("V5 swap  br1024 bw128", make_swapped(_k_v5, 1024, 128)),
        ("V5 swap  br2048 bw256", make_swapped(_k_v5, 2048, 256)),
        ("V5 swap  br512  bw256", make_swapped(_k_v5, 512, 256)),
        ("V7 swap1 br1024 bw128", make_swapped(_k_v7, 1024, 128,
                                               single=True)),
        ("V7 swap1 br1024 bw256", make_swapped(_k_v7, 1024, 256,
                                               single=True)),
    ]
    for name, fn in configs:
        try:
            dt = timed(fn, [(packed, x) for x in xts], sync)
            print(f"{name}: {dt*1e3:7.2f} ms  (full-scale ~"
                  f"{dt*full_scale*1e3:5.1f} ms)", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
