"""Bisect the graph-transformer hot spots found by perf_graphormer.py
(EGT layer at 2135 ms/step fwd+bwd; Graphormer at 5% of bf16 peak).

Suspected pathology (round-4 lesson, CLAUDE.md): tensors with trailing
H=8 / De=32 dims pay up to 16x HBM tile padding — the public
reference-compatible layouts are (B, N, N, H) for attention bias and
(B, N, N, De) for the EGT edge channel.

Interleaved discipline: every variant compiled once, reps interleaved,
scalar-fetch closes each timed region.

Variants (all B=128, N=128, D=256, H=8, De=32, fwd+bwd):
  EGT/full      — EGTLayer exactly as shipped
  EGT/node      — node channel only (edge ffn + e_out skipped)
  EGT/edge      — edge channel only (attention skipped)
  EGT/cfirst    — channels-first rewrite: every head/De-indexed tensor
                  carried as (B, C, N, N) so trailing dims stay (N, N)
  GR/f32        — one GraphormerLayer, bias (B,N,N,H), f32 (as shipped)
  GR/hnn        — bias pre-transposed to (B,H,N,N), f32
  GR/bf16       — bias (B,H,N,N) + bf16 compute

Usage: PYTHONPATH=/root/repo python tools/perf_gt_bisect.py
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

from dgl_tpu import nn as dglnn

B, N, D, H, De, HID = 128, 128, 256, 8, 32, 512


class EGTCFirst(nn.Module):
    """Channels-first EGT rewrite for the probe: efeat carried as
    (B, De, N, N); all head-indexed intermediates as (B, H, N, N)."""
    feat_size: int
    edge_feat_size: int
    num_heads: int

    @nn.compact
    def __call__(self, nfeat, efeat_cf):
        b, n, d = nfeat.shape
        h, de = self.num_heads, self.edge_feat_size
        dh = d // h
        h_ln = nn.LayerNorm(name="ln_h")(nfeat)
        # LayerNorm over the channel axis (axis 1) of (B, De, N, N)
        e_ln = nn.LayerNorm(reduction_axes=1, feature_axes=1,
                            name="ln_e")(efeat_cf)
        qkv = nn.Dense(d * 3, name="qkv")(h_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, nfeat.dtype))
        wb = self.param("e_bias_w", nn.initializers.lecun_normal(),
                        (de, h), nfeat.dtype)
        wg = self.param("e_gate_w", nn.initializers.lecun_normal(),
                        (de, h), nfeat.dtype)
        scores = scores + jnp.einsum("bdnm,dh->bhnm", e_ln, wb)
        gates = jax.nn.sigmoid(jnp.einsum("bdnm,dh->bhnm", e_ln, wg))
        attn = jax.nn.softmax(scores, -1) * gates
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        nfeat = nfeat + nn.Dense(d, name="h_out")(out)
        nfeat = nfeat + nn.Dense(d, name="h_ffn2")(
            jax.nn.gelu(nn.Dense(d * 2, name="h_ffn1")(
                nn.LayerNorm(name="ln_h2")(nfeat))))
        wo = self.param("e_out_w", nn.initializers.lecun_normal(),
                        (h, de), nfeat.dtype)
        efeat_cf = efeat_cf + jnp.einsum("bhnm,hd->bdnm", scores, wo)
        e2 = nn.LayerNorm(reduction_axes=1, feature_axes=1,
                          name="ln_e2")(efeat_cf)
        w1 = self.param("e_ffn1_w", nn.initializers.lecun_normal(),
                        (de, de * 2), nfeat.dtype)
        w2 = self.param("e_ffn2_w", nn.initializers.lecun_normal(),
                        (de * 2, de), nfeat.dtype)
        mid = jax.nn.gelu(jnp.einsum("bdnm,df->bfnm", e2, w1))
        efeat_cf = efeat_cf + jnp.einsum("bfnm,fd->bdnm", mid, w2)
        return nfeat, efeat_cf


class EGTPartial(nn.Module):
    """Shipped EGTLayer with one channel's update optionally skipped."""
    mode: str  # "node" | "edge"

    @nn.compact
    def __call__(self, nfeat, efeat):
        b, n, d = nfeat.shape
        h, de = H, De
        dh = d // h
        h_ln = nn.LayerNorm(name="ln_h")(nfeat)
        e_ln = nn.LayerNorm(name="ln_e")(efeat)
        qkv = nn.Dense(d * 3, name="qkv")(h_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, nfeat.dtype))
        E_bias = nn.Dense(h, name="e_bias")(e_ln)
        G = nn.Dense(h, name="e_gate")(e_ln)
        scores = scores + E_bias.transpose(0, 3, 1, 2)
        if self.mode == "node":
            gates = jax.nn.sigmoid(G.transpose(0, 3, 1, 2))
            attn = jax.nn.softmax(scores, -1) * gates
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
            nfeat = nfeat + nn.Dense(d, name="h_out")(out)
            nfeat = nfeat + nn.Dense(d, name="h_ffn2")(
                jax.nn.gelu(nn.Dense(d * 2, name="h_ffn1")(
                    nn.LayerNorm(name="ln_h2")(nfeat))))
            return nfeat, efeat
        e_new = scores.transpose(0, 2, 3, 1)
        efeat = efeat + nn.Dense(de, name="e_out")(e_new)
        efeat = efeat + nn.Dense(de, name="e_ffn2")(
            jax.nn.gelu(nn.Dense(de * 2, name="e_ffn1")(
                nn.LayerNorm(name="ln_e2")(efeat))))
        return nfeat, efeat


def timed(fn, args, label, reps, sched):
    """Register a variant with the interleave scheduler."""
    sched.append((label, fn, args, []))


def main():
    rng = np.random.default_rng(0)
    nf = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(B, N, N, De)).astype(np.float32))
    ef_cf = jnp.transpose(ef, (0, 3, 1, 2))
    bias = jnp.asarray(rng.normal(size=(B, N, N, H)).astype(np.float32))
    bias_hnn = jnp.transpose(bias, (0, 3, 1, 2))

    variants = []

    egt = dglnn.EGTLayer(feat_size=D, edge_feat_size=De, num_heads=H)
    p_full = egt.init(jax.random.PRNGKey(0), nf, ef)

    @jax.jit
    def v_full(p, nf, ef):
        def loss(p):
            h, e = egt.apply(p, nf, ef)
            return (h ** 2).mean() + (e ** 2).mean()
        return jax.value_and_grad(loss)(p)
    variants.append(("EGT/full", v_full, (p_full, nf, ef)))

    for mode in ("node", "edge"):
        m = EGTPartial(mode=mode)
        p = m.init(jax.random.PRNGKey(0), nf, ef)

        def make(m=m):
            @jax.jit
            def f(p, nf, ef):
                def loss(p):
                    h, e = m.apply(p, nf, ef)
                    return (h ** 2).mean() + (e ** 2).mean()
                return jax.value_and_grad(loss)(p)
            return f
        variants.append((f"EGT/{mode}", make(), (p, nf, ef)))

    cf = EGTCFirst(feat_size=D, edge_feat_size=De, num_heads=H)
    p_cf = cf.init(jax.random.PRNGKey(0), nf, ef_cf)

    @jax.jit
    def v_cf(p, nf, ef):
        def loss(p):
            h, e = cf.apply(p, nf, ef)
            return (h ** 2).mean() + (e ** 2).mean()
        return jax.value_and_grad(loss)(p)
    variants.append(("EGT/cfirst", v_cf, (p_cf, nf, ef_cf)))

    gl = dglnn.GraphormerLayer(D, HID, H, dropout=0.0, attn_dropout=0.0)
    p_gl = gl.init(jax.random.PRNGKey(0), nf, attn_bias=bias)

    @jax.jit
    def v_gr32(p, nf, bias):
        def loss(p):
            return (gl.apply(p, nf, attn_bias=bias) ** 2).mean()
        return jax.value_and_grad(loss)(p)
    variants.append(("GR/f32", v_gr32, (p_gl, nf, bias)))

    # hnn + bf16 variants use an inline BiasedMHA with pre-(B,H,N,N) bias
    class GLFast(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x, bias_hnn):
            b, n, d = x.shape
            dh = D // H
            dt = self.dtype
            xc = x.astype(dt)
            q = nn.Dense(D, dtype=dt, name="q")(xc)
            k = nn.Dense(D, dtype=dt, name="k")(xc)
            v = nn.Dense(D, dtype=dt, name="v")(xc)
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

    for label, dt in (("GR/hnn", jnp.float32), ("GR/bf16", jnp.bfloat16)):
        m = GLFast(dtype=dt)
        p = m.init(jax.random.PRNGKey(0), nf, bias_hnn)

        def make(m=m):
            @jax.jit
            def f(p, nf, bias):
                def loss(p):
                    return (m.apply(p, nf, bias).astype(jnp.float32)
                            ** 2).mean()
                return jax.value_and_grad(loss)(p)
            return f
        variants.append((label, make(), (p, nf, bias_hnn)))

    # compile + first-exec (recorded separately)
    for label, fn, args in variants:
        t0 = time.perf_counter()
        l, gr = fn(*args)
        _ = float(l)
        print(f"# {label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)

    reps = {label: [] for label, _, _ in variants}
    for rep in range(6):
        for label, fn, args in variants:
            t0 = time.perf_counter()
            l, gr = fn(*args)
            _ = float(l)
            reps[label].append(time.perf_counter() - t0)
    for label, _, _ in variants:
        r = reps[label]
        print(f"{label:12s} min {min(r)*1e3:8.1f} ms   "
              f"med {sorted(r)[len(r)//2]*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
