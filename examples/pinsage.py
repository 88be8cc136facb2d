"""PinSAGE-style item-item recommendations (reference
examples/pytorch/pinsage + sampling/pinsage.py): random-walk-based
neighbor importance on a bipartite user-item graph.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.sampling import PinSAGESampler


def main(iters=60):
    ds = dgl.data.MovieLensDataset()
    hg = ds[0]
    nu, nm = hg.num_nodes("user"), hg.num_nodes("movie")
    # PinSAGE neighborhood: movie -> user -> movie random walks
    sampler = PinSAGESampler(hg, "movie", "user", num_traversals=2,
                             termination_prob=0.0, num_random_walks=10,
                             num_neighbors=3)
    seeds = np.arange(0, nm, 7)
    frontier = sampler(seeds)
    print("pinsage frontier:", frontier.num_edges(), "weighted edges")

    # train item embeddings so co-engaged movies score high
    um = hg.unit(("user", "user-movie", "movie"))
    u, m = (np.asarray(a) for a in um.coo())
    emb_model = dglnn.NodeEmbedding(nm, 32, name="movie_emb")
    # positive pairs: movies sharing a user (co-engagement)
    order = np.argsort(u)
    us, ms = u[order], m[order]
    starts = np.searchsorted(us, np.arange(nu))
    ends = np.searchsorted(us, np.arange(nu) + 1)
    pos_a, pos_b = [], []
    rng = np.random.default_rng(0)
    for s, e in zip(starts, ends):
        if e - s >= 2:
            pick = rng.choice(np.arange(s, e), size=(4, 2))
            pos_a.append(ms[pick[:, 0]])
            pos_b.append(ms[pick[:, 1]])
    pa = jnp.asarray(np.concatenate(pos_a))
    pb = jnp.asarray(np.concatenate(pos_b))
    params = {"emb": emb_model.weight}
    tx = optax.adam(5e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        nb = jax.random.randint(key, pa.shape, 0, nm)

        def loss_fn(p):
            E = p["emb"]
            pos = (E[pa] * E[pb]).sum(-1)
            neg = (E[pa] * E[nb]).sum(-1)
            return jnp.maximum(0.0, 1.0 - pos + neg).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(iters):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    print(f"final margin loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
