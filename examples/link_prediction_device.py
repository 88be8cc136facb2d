"""Link prediction with the FULLY ON-DEVICE stack.

Everything per step runs inside one jit: positive edges sampled on
device from the CSC, exact-rejection negatives from the bit-packed
adjacency (``bit_has_edge`` answers existence in one gather), GraphSAGE
encoder over device-sampled blocks, dot scorer, BCE loss, adam.  The
host only feeds PRNG keys (the analog of the reference's UVA
link-prediction pipelines, ``examples/sampling/graphbolt/link_prediction.py``).

Run: python examples/link_prediction_device.py [--steps 120]
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.dataloading import (sample_blocks_device,
                                 gather_block_features, mean_aggregate,
                                 seed_features)
from dgl_tpu.sampling.device import (
    global_uniform_negative_sampling_device)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    # planted-community graph: intra-community links predictable
    rng = np.random.default_rng(0)
    n, c, f = 2000, 8, 32
    y = (np.arange(n) * c // n).astype(np.int32)
    e = 30_000
    u0 = rng.integers(0, n, e)
    intra = rng.uniform(size=e) < 0.9
    v0 = np.where(intra, (y[u0] * n // c
                          + rng.integers(0, n // c, e)),
                  rng.integers(0, n, e)).astype(np.int64)
    row = np.r_[u0, v0]
    col = np.r_[v0, u0]
    g = dgl.graph((row, col), num_nodes=n)
    g.unit().create_bitmask_format(symmetric=True)
    bf = g.unit()._bits
    indptr, indices, _ = g.unit().device_csc()
    x = jnp.asarray((rng.normal(size=(n, f))
                     + np.eye(c)[y] @ rng.normal(size=(c, f)) * 1.5
                     ).astype(np.float32))

    s = args.batch
    fanouts, caps = [8, 8], [1 << 14, 1 << 11]
    params = {
        "ws1": jnp.asarray(rng.normal(size=(f, 32), scale=0.2),
                           jnp.float32),
        "wn1": jnp.asarray(rng.normal(size=(f, 32), scale=0.2),
                           jnp.float32),
        "ws2": jnp.asarray(rng.normal(size=(32, 16), scale=0.2),
                           jnp.float32),
        "wn2": jnp.asarray(rng.normal(size=(32, 16), scale=0.2),
                           jnp.float32),
    }
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    def encode(p, seeds, key):
        blocks = sample_blocks_device(indptr, indices, seeds, fanouts,
                                      caps, key)
        blk1, blk2 = blocks
        h0 = gather_block_features(blk1, x)
        h1 = jax.nn.relu(seed_features(blk1, h0) @ p["ws1"]
                         + mean_aggregate(blk1, h0) @ p["wn1"])
        h1 = jnp.where((blk2.src_ids >= 0)[:, None], h1, 0)
        return (seed_features(blk2, h1) @ p["ws2"]
                + mean_aggregate(blk2, h1) @ p["wn2"])

    @jax.jit
    def step(p, o, bf, indptr, indices, x_unused, key):
        kp, kn, ke1, ke2 = jax.random.split(key, 4)
        # positive edges: sample a random dst + one of its in-edges
        dst = jax.random.randint(kp, (s,), 0, n, dtype=jnp.int32)
        st = jnp.take(indptr, dst)
        deg = jnp.take(indptr, dst + 1) - st
        off = jnp.floor(jax.random.uniform(kp, (s,))
                        * jnp.maximum(deg, 1)).astype(jnp.int32)
        src = jnp.take(indices, st + jnp.minimum(off, deg - 1))
        pos_ok = deg > 0
        # negatives: exact rejection against the bitmask
        nsrc, ndst, nmask = global_uniform_negative_sampling_device(
            bf, kn, s, n)

        def loss_fn(p):
            z_src = encode(p, src, ke1)
            z_dst = encode(p, dst, ke1)
            zn_src = encode(p, nsrc, ke2)
            zn_dst = encode(p, ndst, ke2)
            pos = (z_src * z_dst).sum(-1)
            neg = (zn_src * zn_dst).sum(-1)
            lp = optax.sigmoid_binary_cross_entropy(
                pos, jnp.ones_like(pos)) * pos_ok
            ln = optax.sigmoid_binary_cross_entropy(
                neg, jnp.zeros_like(neg)) * nmask
            return (lp.sum() + ln.sum()) / jnp.maximum(
                pos_ok.sum() + nmask.sum(), 1)

        l, gr = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(gr, o)
        return optax.apply_updates(p, up), o, l

    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, bf, indptr, indices, x,
                                 sub)
        if i == 0:
            first = float(loss)
        if i % 40 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    last = float(loss)
    print(f"loss {first:.4f} -> {last:.4f}")

    # AUC-style eval: held-out positive vs negative scores
    key, k1, k2, k3 = jax.random.split(key, 4)
    dst = jax.random.randint(k1, (512,), 0, n, dtype=jnp.int32)
    st = jnp.take(indptr, dst)
    deg = jnp.take(indptr, dst + 1) - st
    off = jnp.floor(jax.random.uniform(k1, (512,))
                    * jnp.maximum(deg, 1)).astype(jnp.int32)
    src = jnp.take(indices, st + jnp.minimum(off, deg - 1))
    nsrc, ndst, nmask = global_uniform_negative_sampling_device(
        bf, k2, 512, n)

    @jax.jit
    def score(p, a, b, key):
        return (encode(p, a, key) * encode(p, b, key)).sum(-1)

    sp = np.asarray(score(params, src, dst, k3))[np.asarray(deg) > 0]
    sn = np.asarray(score(params, nsrc, ndst, k3))[np.asarray(nmask)]
    auc = (sp[:, None] > sn[None, :]).mean()
    print(f"AUC {auc:.4f}")


if __name__ == "__main__":
    main()
