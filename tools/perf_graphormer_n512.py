"""Graphormer at large N: B=32 x N=512 — the regime where the
(B, H, N, N) score tensors (268 MB each in f32) dominate HBM traffic.
bf16 measured NEUTRAL at N=128 (perf_gt_bisect2); at N=512 the N^2
terms are 4x heavier per FLOP, so the bf16 question reopens.

Variants (full train step, 6 x D=256 layers, one-hot spatial bias,
scanned x10):
  f32    — shipped modules (14.0-ms-headline config at this shape)
  bf16   — QKV/FFN GEMMs + score tensors in bf16, softmax + layernorm
           + params in f32 (the standard mixed recipe)

Usage: PYTHONPATH=/root/repo python tools/perf_graphormer_n512.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from dgl_tpu import nn as dglnn

STEPS = 10
B, N, D, HID, H, L = 32, 512, 256, 512, 8, 6


class LayerBF16(nn.Module):
    @nn.compact
    def __call__(self, x, bias_hnn):
        b, n, d = x.shape
        dh = D // H
        dt = jnp.bfloat16
        xc = x.astype(dt)
        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(xc)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b, n, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, H, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(dh)
        s = s + bias_hnn.astype(dt)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(dt)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        h = nn.LayerNorm(name="ln1")(
            x + nn.Dense(D, dtype=dt, name="out")(o))
        f = nn.Dense(D, dtype=dt, name="ffn2")(jax.nn.gelu(
            nn.Dense(HID, dtype=dt, name="ffn1")(h.astype(dt))))
        return nn.LayerNorm(name="ln2")(h + f)


class Model(nn.Module):
    mode: str   # f32 | bf16

    @nn.compact
    def __call__(self, deg, spd):
        h = nn.Embed(64, D, name="deg_emb")(jnp.minimum(deg, 63))
        bias = dglnn.SpatialEncoder(max_dist=8, num_heads=H)(spd)
        if self.mode in ("f32", "bf16_mod", "bf16_hnn"):
            dt = jnp.bfloat16 if self.mode != "f32" else None
            lay = "hnn" if self.mode == "bf16_hnn" else "nnh"
            if lay == "hnn":
                # re-emit the bias pre-transposed: (B,H,N,N), trailing
                # (N,N) tiles unpadded (the 16x trailing-H tax at N=512)
                bias = dglnn.SpatialEncoder(
                    max_dist=8, num_heads=H, layout="hnn",
                    name="SpatialEncoder_hnn")(spd)
            for i in range(L):
                h = dglnn.GraphormerLayer(
                    D, HID, H, attn_dropout=0.0, dropout=0.0, dtype=dt,
                    bias_layout=lay, name=f"layer{i}")(h, attn_bias=bias)
        else:
            bias_hnn = bias.transpose(0, 3, 1, 2)
            for i in range(L):
                h = LayerBF16(name=f"layer{i}")(h, bias_hnn)
        return nn.Dense(2)(h.mean(1))


def build(mode):
    rng = np.random.default_rng(0)
    deg = jnp.asarray(rng.integers(0, 32, (B, N)).astype(np.int32))
    spd = jnp.asarray(rng.integers(1, 8, (B, N, N)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
    model = Model(mode=mode)
    params = model.init(jax.random.PRNGKey(0), deg, spd)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def run(params, opt):
        def body(carry, _):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, deg, spd)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o)
            return (optax.apply_updates(p, up), o), l
        _, ls = jax.lax.scan(body, (params, opt), None, length=STEPS)
        return ls
    return run, (params, opt)


def main():
    variants = [(m, *build(m))
                for m in ("f32", "bf16", "bf16_mod", "bf16_hnn")]
    for label, fn, args in variants:
        t0 = time.perf_counter()
        _ = float(fn(*args)[-1])
        print(f"# {label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
    reps = {label: [] for label, _, _ in variants}
    for rep in range(4):
        for label, fn, args in variants:
            t0 = time.perf_counter()
            ls = fn(*args)
            _ = float(ls[-1])
            reps[label].append((time.perf_counter() - t0) / STEPS)
    fl = 3 * L * (4 * B * N * D * D * 2 + 2 * B * H * N * N *
                  (D // H) * 2 + 2 * B * N * D * HID * 2)
    for label, _, _ in variants:
        r = reps[label]
        dt = min(r)
        print(f"{label:6s} min {dt*1e3:8.2f} ms/step   "
              f"med {sorted(r)[len(r)//2]*1e3:8.2f}   "
              f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
