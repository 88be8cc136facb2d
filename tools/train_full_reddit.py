"""End-to-end acceptance: full-graph GCN TRAINING TO ACCURACY at
Reddit scale (232,965 nodes / 114.6M edges) on one chip.

Labels are the generator's planted 41 communities; features carry a
WEAK community signal (0.25 sigma) under unit noise, so the graph
aggregation (d=492 neighborhood averaging over 90%-intra edges) does
the heavy lifting — a featureless-graph sanity check that the whole
stack (bitmask SpMM fwd+bwd, adam, scan loop) trains, not just runs.

Usage: PYTHONPATH=/root/repo python tools/train_full_reddit.py
"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dgl_tpu as dgl
from dgl_tpu.ops import gspmm


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    n, feat, classes = 232_965, 602, 41
    z = np.load(os.path.join(cache, "reddit_sym_v2_232965_114615892_s0.npz"))
    g = dgl.graph((z["row"], z["col"]), num_nodes=n)
    g.unit().create_bitmask_format(
        symmetric=True,
        cache_path=os.path.join(cache,
                                "bits_sym_v2_232965_114615892_s0.npz"))
    unit = g.unit()
    deg = jnp.maximum(unit.in_degrees(), 1).astype(jnp.float32)[:, None]

    rng = np.random.default_rng(7)
    y_np = (np.arange(n) * classes // n).astype(np.int32)
    sig = rng.normal(size=(classes, feat)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, feat)).astype(np.float32)
                    + 0.25 * sig[y_np])
    y = jnp.asarray(y_np)
    # 10% train, 10% val-ish test (disjoint)
    perm = rng.permutation(n)
    train_mask = np.zeros(n, bool); train_mask[perm[: n // 10]] = True
    test_idx = perm[n // 10: n // 5]
    tmask = jnp.asarray(train_mask.astype(np.float32))

    params = {"w1": jnp.asarray(rng.normal(size=(feat, 16),
                                           scale=0.1).astype(np.float32)),
              "w2": jnp.asarray(rng.normal(size=(16, classes),
                                           scale=0.1).astype(np.float32))}
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    def model(p, unit, x):
        h = gspmm(unit, "copy_lhs", "sum", x @ p["w1"], None) / deg
        h = jax.nn.relu(h)
        return (gspmm(unit, "copy_lhs", "sum", h, None) / deg) @ p["w2"]

    @jax.jit
    def steps10(params, opt, unit, x, y):
        def body(carry, _):
            p, o = carry
            def loss_fn(p):
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    model(p, unit, x), y)
                return (ls * tmask).sum() / tmask.sum()
            l, gr = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(gr, o)
            return (optax.apply_updates(p, up), o), l
        (params, opt), ls = jax.lax.scan(body, (params, opt), None,
                                         length=10)
        return params, opt, ls[-1]

    @jax.jit
    def predict(p, unit, x):
        return model(p, unit, x).argmax(-1)

    t0 = time.time()
    for ep in range(8):                      # 80 steps
        params, opt, loss = steps10(params, opt, unit, x, y)
        print(f"steps {(ep+1)*10}: train loss {float(loss):.4f}",
              flush=True)
    dt = time.time() - t0
    pred = np.asarray(predict(params, unit, x))
    acc = (pred[test_idx] == y_np[test_idx]).mean()
    print(f"test acc {acc:.4f} on held-out nodes "
          f"({dt:.0f}s for 80 full-graph steps at 114.6M edges)",
          flush=True)


if __name__ == "__main__":
    main()
