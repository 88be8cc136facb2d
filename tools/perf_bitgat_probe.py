"""Probe: dense bit-masked flash-attention forward for GAT.

Question: can the bitmask formulation (the SpMM headline winner) carry
the GAT attention chain too?  Scores e_ij = lrelu(el_i + er_j) are
computed DENSELY per (src-block, dst-plane) tile, masked by the packed
adjacency bits, exponentiated (the fused-GAT ±40-clip contract — no
per-dst max pass), and consumed immediately: the numerator accumulates
via an MXU dot (z^T @ P) and the denominator via a row-sum — nothing
edge-shaped ever exists in HBM (flash-attention structure, softmax
normalization folded into one divide at the last contraction step).

Cost model (full Reddit scale, N^2 = 5.5e10 entries, H=4, D=32):
  VPU ~9 ops/entry/head + 2 shared   -> 0.3-1.2 s  (the uncertainty)
  MXU numerator: N^2*D*H MACs at M=32 sublane occupancy -> ~145 ms
  HBM bit stream 6.9 GB               -> ~8 ms
vs the fused slot-space GAT fwd = 1059 ms at 114.6M edges.  This probe
measures the 22%-area version (same as perf_bitmm_variants.py) and
extrapolates; adopt only if the full-scale projection clearly beats the
slot path.

Usage: PYTHONPATH=/root/repo python tools/perf_bitgat_probe.py [tiny]
  tiny — run the small interpret-mode parity check only (any backend).
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

H, D = 4, 32
SLOPE = 0.2


def _fwd_kernel(pt_ref, elc_ref, erp_ref, zt_ref, out_ref, l_ref,
                acc_ref, lacc_ref, *, ns):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lacc_ref[...] = jnp.zeros_like(lacc_ref)

    p = pt_ref[...]                              # (BS, bwd) int32
    # hoist the el lane-slice + sublane-broadcast out of the plane loop:
    # the (BS,1)->(BS,bwd) relayout repeated 32x per head breaks
    # tpu_compile_helper (HTTP 500); materialized once per head it
    # compiles fine (measured 2026-08-20)
    bwd = p.shape[1]
    elb = [elc_ref[:, h:h + 1] + jnp.zeros((p.shape[0], bwd), jnp.float32)
           for h in range(H)]
    for b in range(32):
        mask = (p & np.int32(np.uint32(1) << b)) != 0
        for h in range(H):
            er_hb = erp_ref[h, b:b + 1, :]       # (1, bwd)
            raw = elb[h] + er_hb
            sc = jnp.maximum(raw, SLOPE * raw)   # lrelu, slope in [0,1]
            pm = jnp.where(mask, jnp.exp(sc), 0.0)
            lacc_ref[h, b, :] += jnp.sum(pm, axis=0)
            acc_ref[h, b] += jax.lax.dot_general(
                zt_ref[h], pm.astype(zt_ref.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(s == ns - 1)
    def _():
        den = jnp.maximum(lacc_ref[...], 1e-20)
        out_ref[...] = acc_ref[...] / den[:, :, None, :]
        l_ref[...] = lacc_ref[...]


def make_fwd(s_pad, k32, bs, bwd, interpret=False):
    ns = s_pad // bs
    grid = (k32 // bwd, ns)

    @jax.jit
    def run(pt, elc, erp, zt):
        return pl.pallas_call(
            partial(_fwd_kernel, ns=ns),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bs, bwd), lambda d, s: (s, d)),
                pl.BlockSpec((bs, H), lambda d, s: (s, 0)),
                pl.BlockSpec((H, 32, bwd), lambda d, s: (0, 0, d)),
                pl.BlockSpec((H, D, bs), lambda d, s: (0, 0, s)),
            ],
            out_specs=[
                pl.BlockSpec((H, 32, D, bwd), lambda d, s: (0, 0, 0, d)),
                pl.BlockSpec((H, 32, bwd), lambda d, s: (0, 0, d)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, 32, D, k32), jnp.float32),
                jax.ShapeDtypeStruct((H, 32, k32), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, 32, D, bwd), jnp.float32),
                pltpu.VMEM((H, 32, bwd), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * s_pad * k32 * 32 * D * H,
                bytes_accessed=s_pad * k32 * 4 + s_pad * H * D * 2
                + 32 * k32 * D * H * 4,
                transcendentals=s_pad * k32 * 32 * H),
            interpret=interpret,
        )(pt, elc, erp, zt)

    return run


def _arrange(el, er, z, s_pad, k_pad, dtype):
    """Natural (N,H)/(N,H,D) -> kernel layouts."""
    n_src, n_dst = el.shape[0], er.shape[0]
    k32 = k_pad // 32
    elc = jnp.zeros((s_pad, H), jnp.float32).at[:n_src].set(el)
    erp = jnp.zeros((k_pad, H), jnp.float32).at[:n_dst].set(er)
    erp = erp.reshape(32, k32, H).transpose(2, 0, 1)       # (H, 32, k32)
    zt = jnp.zeros((s_pad, H, D), dtype).at[:n_src].set(z.astype(dtype))
    zt = zt.transpose(1, 2, 0)                             # (H, D, s_pad)
    return elc, erp, zt


def _unarrange(out_t, n_dst):
    """(H, 32, D, k32) -> (n_dst, H, D): dst d = b * k32 + j."""
    h, _, d_, k32 = out_t.shape
    out = out_t.transpose(1, 3, 0, 2).reshape(32 * k32, h, d_)
    return out[:n_dst]


def tiny_check():
    """Interpret-mode parity vs a dense XLA oracle (any backend)."""
    rng = np.random.default_rng(0)
    n = 300
    s_pad, k_pad = 512, 8192        # one block each
    a = (rng.random((n, n)) < 0.05)
    el = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(n, H, D)), jnp.float32)
    # pack bits: pt[s, j'] bit b <-> dst = b*k32 + j'
    k32 = k_pad // 32
    pt = np.zeros((s_pad, k32), np.uint32)
    srcs, dsts = np.nonzero(a)      # a[s, d]
    np.bitwise_or.at(pt, (srcs, dsts % k32),
                     np.uint32(1) << (dsts // k32).astype(np.uint32))
    # oracle: per dst, softmax over in-edges of lrelu(el_src + er_dst)
    raw = el[:, None, :] + er[None, :, :]                  # (s, d, H)
    sc = jnp.maximum(raw, SLOPE * raw)
    p = jnp.where(jnp.asarray(a)[:, :, None], jnp.exp(sc), 0.0)
    den = jnp.maximum(p.sum(0), 1e-20)                     # (d, H)
    ref = jnp.einsum("sdh,shf->dhf", p, z) / den[:, :, None]
    fn = make_fwd(s_pad, k32, 512, 128, interpret=True)
    elc, erp, zt = _arrange(el, er, z, s_pad, k_pad, jnp.float32)
    out_t, _ = fn(jnp.asarray(pt.view(np.int32)), elc, erp, zt)
    got = _unarrange(out_t, n)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"tiny parity: max abs err = {err:.2e}")
    assert err < 1e-4, "parity FAILED"


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "tiny":
        tiny_check()
        return
    # (tiny_check is CPU-only: interpret mode through the axon tunnel
    # round-trips per op and effectively hangs)
    s_pad = 110_592      # 216 * 512 (22% of Reddit area)
    k_pad = 110_592
    k32 = k_pad // 32    # 3456 = 27 * 128
    area = s_pad * k_pad
    full = 233_472 * 237_568 / area
    pt = jax.random.randint(jax.random.PRNGKey(1), (s_pad, k32),
                            -2**31, 2**31 - 1, dtype=jnp.int32)
    args = []
    for i in range(4):
        k = jax.random.PRNGKey(10 + i)
        ka, kb, kc = jax.random.split(k, 3)
        el = jax.random.normal(ka, (s_pad, H), jnp.float32)
        er = jax.random.normal(kb, (k_pad, H), jnp.float32)
        z = jax.random.normal(kc, (s_pad, H, D), jnp.float32)
        args.append(_arrange(el, er, z, s_pad, k_pad, jnp.bfloat16))
    for a in args:
        jax.block_until_ready(a)
    for bs, bwd in [(512, 128), (1024, 128), (512, 256)]:
        if k32 % bwd or s_pad % bs:
            continue
        try:
            fn = make_fwd(s_pad, k32, bs, bwd)
            out = fn(pt, *args[0])
            _ = float(out[0][0, 0, 0, 0])   # value fetch closes the region
            t0 = time.perf_counter()
            reps = 3
            for i in range(reps):
                out = fn(pt, *args[1 + (i % 3)])
            _ = float(out[0][0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            print(f"bitgat fwd bs={bs} bwd={bwd}: {dt*1e3:8.2f} ms "
                  f"(full-scale ~{dt*full*1e3:7.1f} ms)", flush=True)
        except Exception as e:
            print(f"bs={bs} bwd={bwd}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
