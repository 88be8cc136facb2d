"""node2vec embeddings (reference examples/pytorch/node2vec/): biased
second-order random walks (return p, in-out q) + skip-gram with
negative sampling, evaluated by 1-NN label agreement on Karate.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.sampling import node2vec_random_walk


def main(iters=60, p=0.25, q=4.0):
    ds = dgl.data.KarateClubDataset()
    g = ds[0]
    n = g.num_nodes()
    # homophily-biased walks (q>1 keeps walks local = community-aware)
    walks = node2vec_random_walk(g, np.tile(np.arange(n), 8), p, q,
                                 walk_length=9)
    walks = jnp.asarray(np.asarray(walks))
    # same skip-gram objective as DeepWalk, over node2vec traces
    model = dglnn.DeepWalk(n, emb_dim=32, walk_length=10, window_size=3,
                           negative_size=3)
    params = model.init(jax.random.PRNGKey(0), walks, jax.random.PRNGKey(1))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(
            lambda pp: model.apply(pp, walks, key))(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(iters):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    emb = np.asarray(model.apply(params, method=model.embed))
    y = np.asarray(g.ndata["label"])
    sim = emb @ emb.T
    np.fill_diagonal(sim, -np.inf)
    acc = float((y[sim.argmax(1)] == y).mean())
    print("1-NN label agreement", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    a = ap.parse_args()
    main(a.iters)
