"""Scanned (dispatch-free) graph-transformer layer probe.

perf_gt_bisect.py round 1 found every single-call variant reads
25-45 ms — per-call dispatch/fetch through the axon tunnel (~20+ ms)
swamps the compute, and the 2135 ms EGT reading in perf_graphormer.py
was new-device-array transfers inside the timed loop (each host->device
transfer through the tunnel costs seconds — same family as the
first-execution artifact in PERF_NOTES).

This probe wraps each variant's fwd+bwd in a 10-step lax.scan inside
ONE jit (the carry perturbs the input by the loss so XLA cannot hoist
the body), so ms/step is pure compute.

Usage: PYTHONPATH=/root/repo python tools/perf_gt_bisect2.py
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
from perf_gt_bisect import EGTCFirst, B, N, D, H, De, HID

STEPS = 10


def scanned(apply_loss, p, xs):
    """jit(scan x STEPS) of value_and_grad(apply_loss); carry perturbs
    the first x by the loss to defeat loop hoisting."""
    @jax.jit
    def run(p, xs):
        def body(carry, _):
            x0 = carry
            l, gr = jax.value_and_grad(
                lambda p: apply_loss(p, x0, *xs[1:]))(p)
            return x0 * (1 + 1e-9 * l.astype(x0.dtype)), l
        x_fin, ls = jax.lax.scan(body, xs[0], None, length=STEPS)
        return ls
    return run


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

    def egt_loss(p, nf, ef):
        h, e = egt.apply(p, nf, ef)
        return (h ** 2).mean() + (e ** 2).mean()
    variants.append(("EGT/full", scanned(egt_loss, p_full, (nf, ef)),
                     (p_full, (nf, ef))))

    cf = EGTCFirst(feat_size=D, edge_feat_size=De, num_heads=H)
    p_cf = cf.init(jax.random.PRNGKey(0), nf, ef_cf)

    def cf_loss(p, nf, ef):
        h, e = cf.apply(p, nf, ef)
        return (h ** 2).mean() + (e ** 2).mean()
    variants.append(("EGT/cfirst", scanned(cf_loss, p_cf, (nf, ef_cf)),
                     (p_cf, (nf, ef_cf))))

    gl = dglnn.GraphormerLayer(D, HID, H, dropout=0.0, attn_dropout=0.0)
    p_gl = gl.init(jax.random.PRNGKey(0), nf, attn_bias=bias)

    def gl_loss(p, nf, bias):
        return (gl.apply(p, nf, attn_bias=bias) ** 2).mean()
    variants.append(("GR/f32", scanned(gl_loss, p_gl, (nf, bias)),
                     (p_gl, (nf, bias))))

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

    for label, dt in (("GR/hnn32", jnp.float32),
                      ("GR/bf16", jnp.bfloat16)):
        m = GLFast(dtype=dt)
        p = m.init(jax.random.PRNGKey(0), nf, bias_hnn)

        def loss(p, nf, bias, m=m):
            return (m.apply(p, nf, bias).astype(jnp.float32) ** 2).mean()
        variants.append((label, scanned(loss, p, (nf, bias_hnn)),
                         (p, (nf, bias_hnn))))

    for label, fn, (p, xs) in variants:
        t0 = time.perf_counter()
        ls = fn(p, xs)
        _ = float(ls[-1])
        print(f"# {label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)

    reps = {label: [] for label, _, _ in variants}
    for rep in range(4):
        for label, fn, (p, xs) in variants:
            t0 = time.perf_counter()
            ls = fn(p, xs)
            _ = float(ls[-1])
            reps[label].append((time.perf_counter() - t0) / STEPS)
    for label, _, _ in variants:
        r = reps[label]
        print(f"{label:12s} min {min(r)*1e3:8.2f} ms/step   "
              f"med {sorted(r)[len(r)//2]*1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
