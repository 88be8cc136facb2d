"""Bisect the mesh-minibatch step (VERDICT r4 #1a) with the interleaved
discipline of perf_halo_bisect.py.

Same workload for every variant: 1M nodes / 20M uniform edges, F=128,
batch 1024, fanout [10, 10], 10-step lax.scan, mesh = the one real chip
(collectives degenerate, so the bisect isolates the owner-routing
sampler/gather/compute costs rather than ICI).

Variants (each compiled once, then interleaved A,B,C,D x reps):
  DEV  — single-device device_loader pipeline (unique-compacted blocks)
         with the same (dst + mean) @ w model: the 47 ms/step-class
         baseline the VERDICT target (<= 2x) is measured against.
  MS   — mesh plane, sampling only (sample_frontier, ids+mask sum).
  MSG  — mesh plane, sampling + feature gather (no train).
  MF   — mesh plane, full train step (sample + gather + fwd/bwd + adam).
  MG   — MF with a block_gat attention inner layer (H=4 D=32) — the
         sampled-GAT cost at scale (round 5).

Usage: PYTHONPATH=/root/repo python tools/perf_mesh_minibatch_bisect.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dgl_tpu as dgl
from dgl_tpu.parallel import shard_graph
from dgl_tpu.parallel.mesh_minibatch import (
    build_mesh_csc, sample_frontier, gather_frontier, frontier_sizes,
    block_mean)
from dgl_tpu.dataloading import (sample_block_device,
                                 gather_block_features, mean_aggregate,
                                 seed_features)

N, E, FEAT, CLASSES = 1_000_000, 20_000_000, 128, 41
S, FANOUTS = 1024, [10, 10]
SCAN = 10


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    rng = np.random.default_rng(0)
    print("# generating graph...", flush=True)
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    g = dgl.graph((src, dst), num_nodes=N)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    mg = shard_graph(g, mesh, partition=np.zeros(N, np.int32))
    mcsc = build_mesh_csc(g, mg, mesh)
    x = rng.normal(size=(N, FEAT)).astype(np.float32)
    y = rng.integers(0, CLASSES, N).astype(np.int32)
    xs = mg.shard_node_array(x)
    ys = mg.shard_node_array(y[:, None])[:, 0]
    indptr_d, indices_d, _ = g.unit().device_csc()
    jax.block_until_ready((mcsc.indptr, xs, indptr_d))
    sizes = frontier_sizes(S, FANOUTS)
    params = {
        "w1": jnp.asarray(rng.normal(size=(FEAT, 16), scale=0.1),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(16, CLASSES), scale=0.1),
                          jnp.float32),
    }
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    # ---- DEV: single-device pipeline, same model ----
    cap2 = S * (FANOUTS[1] + 1)                   # 11264
    cap1 = cap2 * (FANOUTS[0] + 1)                # 123904

    def dev_one(carry, key, indptr, indices, x, y):
        p, o = carry
        k0, k1, k2 = jax.random.split(key, 3)
        seeds = jax.random.randint(k0, (S,), 0, N, dtype=jnp.int32)
        blk2 = sample_block_device(indptr, indices, seeds, FANOUTS[1],
                                   cap2, k1)
        inner = jnp.where(blk2.src_ids >= 0, blk2.src_ids, 0)
        blk1 = sample_block_device(indptr, indices, inner, FANOUTS[0],
                                   cap1, k2)

        def loss_fn(p):
            h0 = gather_block_features(blk1, x)
            h1 = jax.nn.relu(
                (seed_features(blk1, h0) + mean_aggregate(blk1, h0))
                @ p["w1"])
            h1 = jnp.where((blk2.src_ids >= 0)[:, None], h1, 0)
            h2 = (seed_features(blk2, h1) + mean_aggregate(blk2, h1)) \
                @ p["w2"]
            return optax.softmax_cross_entropy_with_integer_labels(
                h2, jnp.take(y, seeds)).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return (optax.apply_updates(p, up), o), l

    @jax.jit
    def dev_scan(p, o, indptr, indices, x, y, key):
        keys = jax.random.split(key, SCAN)
        (p, o), ls = jax.lax.scan(
            lambda c, k: dev_one(c, k, indptr, indices, x, y), (p, o),
            keys)
        return p, o, ls

    # ---- mesh variants ----
    def fwd(p, feats, masks):
        h = feats
        for li in reversed(range(len(FANOUTS))):
            dstv, mean = block_mean(h, masks[li], sizes[li], FANOUTS[li])
            w = p["w1"] if li == len(FANOUTS) - 1 else p["w2"]
            h = (dstv + mean) @ w
            if li == len(FANOUTS) - 1:
                h = jax.nn.relu(h)
        return h

    def mesh_sample(key, mcsc):
        seeds = jax.random.randint(key, (1, S), 0, N, jnp.int32)
        return sample_frontier(mcsc, seeds, FANOUTS, key, mesh)

    @jax.jit
    def ms_scan(mcsc, key):
        def body(c, k):
            ids, masks = mesh_sample(k, mcsc)
            return c, ids.sum() + sum(m.sum() for m in masks)
        _, vals = jax.lax.scan(body, 0, jax.random.split(key, SCAN))
        return vals

    @jax.jit
    def msg_scan(mcsc, xs, key):
        def body(c, k):
            ids, masks = mesh_sample(k, mcsc)
            feats = gather_frontier(xs, ids, mcsc, mesh)
            return c, feats.sum()
        _, vals = jax.lax.scan(body, 0, jax.random.split(key, SCAN))
        return vals

    def mf_one(carry, key, mcsc, xs, ys):
        p, o = carry
        ids, masks = mesh_sample(key, mcsc)
        feats = gather_frontier(xs, ids, mcsc, mesh)
        yb = gather_frontier(ys[:, None].astype(jnp.float32),
                             ids[:, :S], mcsc, mesh)[..., 0].astype(
                                 jnp.int32)

        def loss_fn(p):
            logits = fwd(p, feats, masks)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return (optax.apply_updates(p, up), o), l

    @jax.jit
    def mf_scan(p, o, mcsc, xs, ys, key):
        keys = jax.random.split(key, SCAN)
        (p, o), ls = jax.lax.scan(
            lambda c, k: mf_one(c, k, mcsc, xs, ys), (p, o), keys)
        return p, o, ls

    # ---- MG: full train step with a block_gat attention inner layer
    # (H=4 D=32; round-5 block_gat — dense softmax over the fanout axis)
    from dgl_tpu.parallel.mesh_minibatch import block_gat
    GH, GD = 4, 32
    gat_params = {
        "w1": jnp.asarray(rng.normal(size=(FEAT, GH * GD), scale=0.1),
                          jnp.float32),
        "al": jnp.asarray(rng.normal(size=(GH, GD), scale=0.1),
                          jnp.float32),
        "ar": jnp.asarray(rng.normal(size=(GH, GD), scale=0.1),
                          jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(GH * GD, CLASSES), scale=0.1),
                          jnp.float32),
    }
    gopt = tx.init(gat_params)

    def mg_one(carry, key, mcsc, xs, ys):
        p, o = carry
        ids, masks = mesh_sample(key, mcsc)
        feats = gather_frontier(xs, ids, mcsc, mesh)
        yb = gather_frontier(ys[:, None].astype(jnp.float32),
                             ids[:, :S], mcsc, mesh)[..., 0].astype(
                                 jnp.int32)

        def loss_fn(p):
            ft = (feats @ p["w1"]).reshape(
                feats.shape[0], sizes[-1], GH, GD)
            el = (ft * p["al"]).sum(-1)
            er = (ft * p["ar"]).sum(-1)
            h = block_gat(ft, el, er, masks[1], sizes[1], FANOUTS[1])
            h = jax.nn.relu(h.reshape(h.shape[0], sizes[1], GH * GD))
            dstv, mean = block_mean(h, masks[0], sizes[0], FANOUTS[0])
            logits = (dstv + mean) @ p["w2"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return (optax.apply_updates(p, up), o), l

    @jax.jit
    def mg_scan(p, o, mcsc, xs, ys, key):
        keys = jax.random.split(key, SCAN)
        (p, o), ls = jax.lax.scan(
            lambda c, k: mg_one(c, k, mcsc, xs, ys), (p, o), keys)
        return p, o, ls

    # compile all four once
    print("# compiling 4 variants...", flush=True)
    t0 = time.time()
    pd, od, ls = dev_scan(params, opt, indptr_d, indices_d,
                          jnp.asarray(x), jnp.asarray(y),
                          jax.random.PRNGKey(0))
    fetch(ls)
    print(f"#  DEV  compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    fetch(ms_scan(mcsc, jax.random.PRNGKey(1)))
    print(f"#  MS   compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    fetch(msg_scan(mcsc, xs, jax.random.PRNGKey(2)))
    print(f"#  MSG  compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    pm, om, ls = mf_scan(params, opt, mcsc, xs, ys, jax.random.PRNGKey(3))
    fetch(ls)
    print(f"#  MF   compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    pg, og, ls = mg_scan(gat_params, gopt, mcsc, xs, ys,
                         jax.random.PRNGKey(4))
    fetch(ls)
    print(f"#  MG   compile+run {time.time()-t0:.0f}s", flush=True)

    res = {k: [] for k in ("DEV", "MS", "MSG", "MF", "MG")}
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    for rep in range(4):
        k = jax.random.PRNGKey(100 + rep)
        t0 = time.perf_counter()
        pd, od, ls = dev_scan(pd, od, indptr_d, indices_d, xj, yj, k)
        fetch(ls)
        res["DEV"].append((time.perf_counter() - t0) / SCAN)
        t0 = time.perf_counter()
        fetch(ms_scan(mcsc, jax.random.fold_in(k, 1)))
        res["MS"].append((time.perf_counter() - t0) / SCAN)
        t0 = time.perf_counter()
        fetch(msg_scan(mcsc, xs, jax.random.fold_in(k, 2)))
        res["MSG"].append((time.perf_counter() - t0) / SCAN)
        t0 = time.perf_counter()
        pm, om, ls = mf_scan(pm, om, mcsc, xs, ys,
                             jax.random.fold_in(k, 3))
        fetch(ls)
        res["MF"].append((time.perf_counter() - t0) / SCAN)
        t0 = time.perf_counter()
        pg, og, ls = mg_scan(pg, og, mcsc, xs, ys,
                             jax.random.fold_in(k, 4))
        fetch(ls)
        res["MG"].append((time.perf_counter() - t0) / SCAN)
    for k, v in res.items():
        ms = [f"{t*1e3:.1f}" for t in v]
        print(f"{k:4s}: {ms} ms/step  (min {min(v)*1e3:.1f})", flush=True)
    print(f"ratio MF/DEV = {min(res['MF'])/min(res['DEV']):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
