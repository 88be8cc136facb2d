"""Graphormer at the reference operating point: dropout=0.1,
attn_dropout=0.1 (the GraphormerLayer defaults in both frameworks —
reference ``python/dgl/nn/pytorch/gt/graphormer.py:14``).  The GAT
story (PERF_NOTES round 5) showed dropout can knock a fast path off a
cliff; this probe checks the dense-batched family.

Variants (full train step, B=128 x N=128, 6 x D=256, scanned x10):
  nodrop   — dropout=0, attn_dropout=0 (the 14.0 ms headline config)
  drop     — dropout=0.1, attn_dropout=0.1 via nn.Dropout (threefry
             bits for (B,H,N,N) attention tensors per layer)

Usage: PYTHONPATH=/root/repo python tools/perf_graphormer_dropout.py
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
B, N, D, HID, H, L = 128, 128, 256, 512, 8, 6


class Model(nn.Module):
    drop: float

    @nn.compact
    def __call__(self, deg, spd, mask, *, deterministic=True):
        h = nn.Embed(64, D, name="deg_emb")(jnp.minimum(deg, 63))
        bias = dglnn.SpatialEncoder(max_dist=8, num_heads=H)(spd)
        attn_mask = mask[:, None, :] & mask[:, :, None]
        for i in range(L):
            h = dglnn.GraphormerLayer(
                D, HID, H, attn_dropout=self.drop, dropout=self.drop,
                name=f"layer{i}")(h, attn_bias=bias, attn_mask=attn_mask,
                                  deterministic=deterministic)
        pooled = (h * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
        return nn.Dense(2)(pooled)


def build(drop):
    rng = np.random.default_rng(0)
    deg = jnp.asarray(rng.integers(0, 32, (B, N)).astype(np.int32))
    spd = jnp.asarray(rng.integers(1, 8, (B, N, N)).astype(np.int32))
    mask = jnp.ones((B, N), bool)
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
    model = Model(drop=drop)
    params = model.init(jax.random.PRNGKey(0), deg, spd, mask)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def run(params, opt, key):
        def body(carry, k):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, deg, spd, mask,
                                     deterministic=drop == 0.0,
                                     rngs={"dropout": k})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o)
            return (optax.apply_updates(p, up), o), l
        _, ls = jax.lax.scan(body, (params, opt),
                             jax.random.split(key, STEPS))
        return ls
    return run, (params, opt, jax.random.PRNGKey(1))


def main():
    variants = [("nodrop", *build(0.0)), ("drop", *build(0.1))]
    # rbg: same model, but the dropout key uses the RBG PRNG — TPU
    # hardware RNG instructions instead of threefry ALU rounds; flax
    # threads the key impl through make_rng transparently
    fn, (p, o, _) = build(0.1)
    variants.append(("drop_rbg", fn,
                     (p, o, jax.random.key(1, impl="rbg"))))
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
    for label, _, _ in variants:
        r = reps[label]
        print(f"{label:8s} min {min(r)*1e3:8.2f} ms/step   "
              f"med {sorted(r)[len(r)//2]*1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
