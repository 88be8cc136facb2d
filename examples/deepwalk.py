"""DeepWalk node embeddings (reference examples/pytorch/deepwalk /
nn network_emb.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.sampling import random_walk


def main(iters=50):
    ds = dgl.data.KarateClubDataset()
    g = ds[0]
    n = g.num_nodes()
    model = dglnn.DeepWalk(n, emb_dim=32, walk_length=10, window_size=3,
                           negative_size=3)
    walks, _ = random_walk(g, np.tile(np.arange(n), 6), length=9)
    walks = jnp.asarray(np.asarray(walks))
    params = model.init(jax.random.PRNGKey(0), walks, jax.random.PRNGKey(1))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, walks, key))(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(iters):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    emb = np.asarray(model.apply(params, method=model.embed))
    # evaluate: 1-NN label agreement on the two factions
    y = np.asarray(g.ndata["label"])
    sim = emb @ emb.T
    np.fill_diagonal(sim, -np.inf)
    acc = (y[sim.argmax(1)] == y).mean()
    print("1-NN label agreement", acc)


if __name__ == "__main__":
    main()
