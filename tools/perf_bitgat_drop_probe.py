"""Bisect the in-kernel dropout cost: fwd-only and fwd+bwd deltas at
~22% of Reddit area (105k nodes), H=4 D=32 — interleaved reps.

Usage: PYTHONPATH=/root/repo python tools/perf_bitgat_drop_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dgl_tpu.ops.pallas.bitmm import build_bit_format
from dgl_tpu.ops.pallas.bitgat import bitgat_attention_aggregate

N, E, H, D = 110_000, 25_000_000, 4, 32


def main():
    rng = np.random.default_rng(0)
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    key = np.unique(col.astype(np.int64) * N + row)
    row, col = key % N, key // N
    print(f"# {N} nodes, {len(row)} edges (deduped)", flush=True)
    bf = build_bit_format(row, col, N, N)
    el = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    jax.block_until_ready((bf.packed, el, z))

    # bf rides as a jit ARGUMENT: closing over it ships GBs of HLO
    # constants through the remote-compile tunnel (HTTP 413)
    @jax.jit
    def fwd0(bf, el, er, z):
        return bitgat_attention_aggregate(bf, el, er, z).sum()

    @jax.jit
    def fwd1(bf, el, er, z, s):
        return bitgat_attention_aggregate(
            bf, el, er, z, attn_drop=0.6, dropout_seed=s).sum()

    @jax.jit
    def tr0(bf, el, er, z):
        return jax.grad(lambda z: bitgat_attention_aggregate(
            bf, el, er, z).sum())(z)[0, 0, 0]

    @jax.jit
    def tr1(bf, el, er, z, s):
        return jax.grad(lambda z: bitgat_attention_aggregate(
            bf, el, er, z, attn_drop=0.6,
            dropout_seed=s).sum())(z)[0, 0, 0]

    fns = {
        "fwd_nodrop": lambda i: fwd0(bf, el * (1 + 1e-4 * i), er, z),
        "fwd_drop": lambda i: fwd1(bf, el * (1 + 1e-4 * i), er, z, i),
        "train_nodrop": lambda i: tr0(bf, el * (1 + 1e-4 * i), er, z),
        "train_drop": lambda i: tr1(bf, el * (1 + 1e-4 * i), er, z, i),
    }
    for name, f in fns.items():
        _ = float(f(0))
    res = {k: [] for k in fns}
    for rep in range(1, 4):
        for name, f in fns.items():
            t0 = time.perf_counter()
            _ = float(f(rep))
            res[name].append(time.perf_counter() - t0)
    for name, v in res.items():
        print(f"{name:14s}: {[f'{t*1e3:.0f}' for t in v]} ms "
              f"(min {min(v)*1e3:.0f})", flush=True)
    fd = min(res["fwd_drop"]) / min(res["fwd_nodrop"])
    td = min(res["train_drop"]) / min(res["train_nodrop"])
    print(f"fwd ratio {fd:.2f}x, train ratio {td:.2f}x", flush=True)


if __name__ == "__main__":
    main()
