"""On-chip drive of the fully on-device minibatch pipeline
(dataloading/device_loader.py) at Reddit scale.

Two-layer GraphSAGE, batch 1024, fanout [10, 10]: sampling, block
compaction, feature gather, both layers, loss and adam all inside ONE
jitted step — the host only feeds seed ids.  Compare: the host-sampling
pipeline measured 8.8 steps/s at 1M nodes / 20M edges (PERF_NOTES).

Usage: PYTHONPATH=/root/repo python tools/perf_device_pipeline.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgl_tpu.dataloading import (sample_block_device,
                                 gather_block_features, mean_aggregate,
                                 seed_features)


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        "reddit_sym_v2_232965_114615892_s0.npz")
    n, feat, classes = 232_965, 602, 41
    print("# loading graph...", flush=True)
    import dgl_tpu as dgl
    z = np.load(cache)
    g = dgl.graph((z["row"], z["col"]), num_nodes=n)
    indptr, indices, _ = g.unit().device_csc()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, n).astype(np.int32))
    jax.block_until_ready((indptr, indices, x, y))
    print(f"# CSC on device: {indices.size * 4 / 2**20:.0f} MiB",
          flush=True)

    s, fanout = 1024, 10
    cap2 = 16384            # >= s * (fanout + 1)
    cap1 = 262144           # >= cap2 * (fanout + 1)
    params = {
        "w_self1": jnp.asarray(
            rng.normal(size=(feat, 16), scale=0.1), jnp.float32),
        "w_nbr1": jnp.asarray(
            rng.normal(size=(feat, 16), scale=0.1), jnp.float32),
        "w_self2": jnp.asarray(
            rng.normal(size=(16, classes), scale=0.1), jnp.float32),
        "w_nbr2": jnp.asarray(
            rng.normal(size=(16, classes), scale=0.1), jnp.float32),
    }
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    # graph/features enter as jit ARGS — closing over them ships ~1 GB
    # of HLO constants through the remote-compile tunnel (HTTP 413)
    @jax.jit
    def step(p, o, indptr, indices, x, y, seeds, key):
        k1, k2 = jax.random.split(key)
        blk2 = sample_block_device(indptr, indices, seeds, fanout, cap2,
                                   k1)
        inner = jnp.where(blk2.src_ids >= 0, blk2.src_ids, 0)
        blk1 = sample_block_device(indptr, indices, inner, fanout, cap1,
                                   k2)

        def loss_fn(p):
            h0 = gather_block_features(blk1, x)
            h1 = jax.nn.relu(seed_features(blk1, h0) @ p["w_self1"]
                             + mean_aggregate(blk1, h0) @ p["w_nbr1"])
            h1 = jnp.where((blk2.src_ids >= 0)[:, None], h1, 0)
            h2 = (seed_features(blk2, h1) @ p["w_self2"]
                  + mean_aggregate(blk2, h1) @ p["w_nbr2"])
            return optax.softmax_cross_entropy_with_integer_labels(
                h2, jnp.take(y, seeds)).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    key = jax.random.PRNGKey(0)
    key, k1, k2 = jax.random.split(key, 3)
    seeds = jax.random.randint(k1, (s,), 0, n, dtype=jnp.int32)
    t0 = time.time()
    params, opt, l = step(params, opt, indptr, indices, x, y, seeds, k2)
    print(f"# compile+first step {time.time()-t0:.0f}s, "
          f"loss {float(l):.4f}", flush=True)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        key, k1, k2 = jax.random.split(key, 3)
        seeds = jax.random.randint(k1, (s,), 0, n, dtype=jnp.int32)
        params, opt, l = step(params, opt, indptr, indices, x, y, seeds, k2)
    _ = float(l)
    dt = (time.perf_counter() - t0) / iters
    print(f"device pipeline: {dt*1e3:.0f} ms/step = {1/dt:.1f} steps/s "
          f"= {s/dt:.0f} seeds/s (batch {s}, fanout [{fanout},{fanout}])",
          flush=True)


if __name__ == "__main__":
    main()
