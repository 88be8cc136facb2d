"""Measured graph-transformer training story (VERDICT r4 #5).

Graphormer on a dense-batched graph-classification workload — the
workload class TPUs should win outright: biased MHA over (B, N, N)
score tiles is pure MXU batched-GEMM, no sparse scatter anywhere
(reference ``python/dgl/nn/pytorch/gt/graphormer.py``, ``biased_mha.py``;
training recipe ``examples/core/Graphormer``).

Two measurements:
  perf  — B=128 graphs x N=128 nodes, D=256, H=8, 6 GraphormerLayers
          (+ degree encoder + spatial bias), full train step (CE+adam)
          under a 10-step scan; reports ms/step, achieved TFLOP/s and
          % of v5e bf16 peak (197 TF).
  acc   — same batched pipeline at B=128 x N=64, 2-class planted
          topology (Erdos vs hub-preferential), train to >= 0.95.

Also runs one EGTLayer step at the same shape for the edge-channel
variant (``gt/egt.py``).

Usage: PYTHONPATH=/root/repo python tools/perf_graphormer.py
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

V5E_BF16_PEAK = 197e12


def make_batch(rng, b, n, p_edge=0.06, hub_frac=0.5):
    """Two topology classes: G(n, p) vs hub-preferential; returns
    (deg (B,N), spd-proxy adjacency hops (B,N,N), mask, labels)."""
    deg = np.zeros((b, n), np.int32)
    spd = np.zeros((b, n, n), np.int32)
    labels = (rng.uniform(size=b) < hub_frac).astype(np.int32)
    for i in range(b):
        if labels[i]:
            # preferential: node j attaches to ~zipf targets
            tgt = (n * rng.uniform(size=3 * n) ** 2.5).astype(np.int64)
            src = rng.integers(0, n, 3 * n)
        else:
            m = int(p_edge * n * n / 2)
            src = rng.integers(0, n, m)
            tgt = rng.integers(0, n, m)
        a = np.zeros((n, n), bool)
        a[src, tgt] = True
        a |= a.T
        deg[i] = a.sum(1)
        # 2-hop proxy for shortest-path bias (exact BFS is host-bound
        # at this batch size; 1/2/far buckets carry the same signal)
        a2 = (a @ a) > 0
        spd[i] = np.where(a, 1, np.where(a2, 2, 8))
    mask = np.ones((b, n), bool)
    return (jnp.asarray(deg), jnp.asarray(spd), jnp.asarray(mask),
            jnp.asarray(labels))


class Graphormer(nn.Module):
    feat: int = 256
    hidden: int = 512
    heads: int = 8
    layers: int = 6
    classes: int = 2

    @nn.compact
    def __call__(self, deg, spd, mask):
        h = nn.Embed(64, self.feat, name="deg_emb")(jnp.minimum(deg, 63))
        bias = dglnn.SpatialEncoder(max_dist=8, num_heads=self.heads)(spd)
        attn_mask = mask[:, None, :] & mask[:, :, None]
        for i in range(self.layers):
            h = dglnn.GraphormerLayer(
                self.feat, self.hidden, self.heads, attn_dropout=0.0,
                dropout=0.0, name=f"layer{i}")(
                    h, attn_bias=bias, attn_mask=attn_mask)
        pooled = (h * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
        return nn.Dense(self.classes)(pooled)


def step_flops(b, n, d, hidden, heads, layers):
    """MXU FLOPs per fwd pass (x3 for fwd+bwd)."""
    per_layer = (4 * b * n * d * d * 2          # qkv + out proj
                 + 2 * b * heads * n * n * (d // heads) * 2  # QK^T + AV
                 + 2 * b * n * d * hidden * 2)  # ffn
    return layers * per_layer


def main():
    rng = np.random.default_rng(0)
    B, N, D, HID, H, L = 128, 128, 256, 512, 8, 6
    print(f"# perf workload: B={B} N={N} D={D} H={H} layers={L}",
          flush=True)
    deg, spd, mask, labels = make_batch(rng, B, N)
    model = Graphormer(feat=D, hidden=HID, heads=H, layers=L)
    params = model.init(jax.random.PRNGKey(0), deg, spd, mask)
    nparams = sum(v.size for v in jax.tree_util.tree_leaves(params))
    print(f"# params: {nparams/1e6:.1f}M", flush=True)
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    steps = 10

    @jax.jit
    def train(params, opt, deg, spd, mask, labels):
        def one(carry, _):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, deg, spd, mask)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o)
            return (optax.apply_updates(p, up), o), l
        (params, opt), ls = jax.lax.scan(one, (params, opt), None,
                                         length=steps)
        return params, opt, ls

    t0 = time.time()
    params, opt, ls = train(params, opt, deg, spd, mask, labels)
    _ = float(ls[-1])
    print(f"# compile+first10 {time.time()-t0:.0f}s", flush=True)
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        params, opt, ls = train(params, opt, deg, spd, mask,
                                labels)
        _ = float(ls[-1])
        times.append((time.perf_counter() - t0) / steps)
    dt = min(times)
    fl = 3 * step_flops(B, N, D, HID, H, L)
    print(f"GRAPHORMER TRAIN STEP (B={B}, N={N}, {L}x{D}): "
          f"{dt*1e3:.1f} ms/step = {B/dt:.0f} graphs/s, "
          f"{fl/dt/1e12:.1f} TFLOP/s = "
          f"{100*fl/dt/V5E_BF16_PEAK:.0f}% of v5e bf16 peak "
          f"({100*fl/dt/(V5E_BF16_PEAK/4):.0f}% of f32 peak; compute is "
          f"f32 — bf16 measured neutral at this shape, perf_gt_bisect2)",
          flush=True)

    # EGT layer at the same shape (edge channel: (B, N, N, De)).
    # Timed under a 10-step scan inside ONE jit: an earlier version
    # created new device arrays (nf * scalar) inside the timed loop and
    # read 2135 ms/step — each eager host->device transfer through the
    # axon tunnel costs seconds (tools/perf_gt_bisect.py bisected it;
    # the scanned truth is ~5 ms/step).
    De = 32
    egt = dglnn.EGTLayer(feat_size=D, edge_feat_size=De, num_heads=H)
    ef = jnp.asarray(rng.normal(size=(B, N, N, De)).astype(np.float32))
    nf = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    ep = egt.init(jax.random.PRNGKey(1), nf, ef)

    @jax.jit
    def egt_scan(p, nf, ef):
        def body(carry, _):
            nf0 = carry
            def loss_fn(p):
                h, e = egt.apply(p, nf0, ef)
                return (h ** 2).mean() + (e ** 2).mean()
            l, gr = jax.value_and_grad(loss_fn)(p)
            return nf0 * (1 + 1e-9 * l), l
        _, ls = jax.lax.scan(body, nf, None, length=10)
        return ls
    _ = float(egt_scan(ep, nf, ef)[-1])
    egt_times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        ls = egt_scan(ep, nf, ef)
        _ = float(ls[-1])
        egt_times.append((time.perf_counter() - t0) / 10)
    print(f"EGT layer fwd+bwd (B={B}, N={N}, D={D}, De={De}): "
          f"{min(egt_times)*1e3:.1f} ms/step (10-step scan)", flush=True)

    # accuracy smoke: planted topology classes at batch scale
    print("# accuracy smoke: B=128 x N=64, 2 classes", flush=True)
    degA, spdA, maskA, yA = make_batch(rng, 128, 64)
    degT, spdT, maskT, yT = make_batch(np.random.default_rng(9), 128, 64)
    amodel = Graphormer(feat=64, hidden=128, heads=4, layers=2)
    ap = amodel.init(jax.random.PRNGKey(2), degA, spdA, maskA)
    atx = optax.adam(1e-3)
    ao = atx.init(ap)

    @jax.jit
    def astep(p, o):
        def loss_fn(p):
            logits = amodel.apply(p, degA, spdA, maskA)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yA).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = atx.update(gr, o)
        return optax.apply_updates(p, up), o, l

    for ep_i in range(60):
        ap, ao, l = astep(ap, ao)
    test_logits = amodel.apply(ap, degT, spdT, maskT)
    acc = float((jnp.argmax(test_logits, -1) == yT).mean())
    print(f"GRAPHORMER ACC SMOKE: train loss {float(l):.4f}, "
          f"held-out acc {acc:.3f}  [bar: >= 0.95]", flush=True)
    assert acc >= 0.95


if __name__ == "__main__":
    main()
