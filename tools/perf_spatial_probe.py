"""Bisect the Graphormer full-step gap: 35.5 ms/step vs 6 x 2.71 ms of
layer compute — is the remainder the SpatialEncoder's embed lookup
(fwd gather over B*N*N positions + bwd scatter-add into a tiny table)?

Variant ONEHOT replaces the embed with a one-hot matmul
(one_hot(spd, buckets) @ table): both passes become MXU GEMMs with a
(B*N*N, buckets) operand — the classic TPU answer to small-table
embeddings with huge index sets.  Variant NOBIAS drops the spatial
bias entirely (lower bound for everything bias-related).

All variants: full train step (6 layers + degree embed + CE + adam),
10-step scan, interleaved reps.

Usage: PYTHONPATH=/root/repo python tools/perf_spatial_probe.py
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


class Model(nn.Module):
    feat: int = 256
    hidden: int = 512
    heads: int = 8
    layers: int = 6
    bias_mode: str = "embed"      # embed | onehot | none

    @nn.compact
    def __call__(self, deg, spd, mask):
        h = nn.Embed(64, self.feat, name="deg_emb")(jnp.minimum(deg, 63))
        if self.bias_mode == "embed":
            bias = dglnn.SpatialEncoder(max_dist=8,
                                        num_heads=self.heads)(spd)
        elif self.bias_mode == "onehot":
            buckets = 10    # max_dist + 2
            table = self.param("spatial_tbl",
                               nn.initializers.normal(0.02),
                               (buckets, self.heads), jnp.float32)
            clipped = jnp.clip(spd, -1, 8) + 1
            bias = jax.nn.one_hot(clipped, buckets,
                                  dtype=jnp.float32) @ table
        else:
            bias = None
        attn_mask = mask[:, None, :] & mask[:, :, None]
        for i in range(self.layers):
            h = dglnn.GraphormerLayer(
                self.feat, self.hidden, self.heads, attn_dropout=0.0,
                dropout=0.0, name=f"layer{i}")(
                    h, attn_bias=bias, attn_mask=attn_mask)
        pooled = (h * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
        return nn.Dense(2)(pooled)


def build(bias_mode, B, N, D=256, HID=512, H=8, L=6):
    rng = np.random.default_rng(0)
    deg = jnp.asarray(rng.integers(0, 32, (B, N)).astype(np.int32))
    spd = jnp.asarray(rng.integers(1, 8, (B, N, N)).astype(np.int32))
    mask = jnp.ones((B, N), bool)
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
    model = Model(feat=D, hidden=HID, heads=H, layers=L,
                  bias_mode=bias_mode)
    params = model.init(jax.random.PRNGKey(0), deg, spd, mask)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def run(params, opt):
        def body(carry, _):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, deg, spd, mask)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o)
            return (optax.apply_updates(p, up), o), l
        _, ls = jax.lax.scan(body, (params, opt), None, length=STEPS)
        return ls
    return run, (params, opt)


def main():
    variants = []
    for mode in ("embed", "onehot", "none"):
        variants.append((f"B128N128/{mode}", *build(mode, 128, 128)))
    # scale point: larger graphs, MXU-heavier attention
    variants.append(("B32N512/embed", *build("embed", 32, 512)))
    variants.append(("B32N512/onehot", *build("onehot", 32, 512)))

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
        print(f"{label:16s} min {min(r)*1e3:8.2f} ms/step   "
              f"med {sorted(r)[len(r)//2]*1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
