"""metapath2vec heterogeneous embedding (reference
examples/pytorch/metapath2vec): metapath-guided random walks + skip-gram
with negative sampling on a synthetic academic graph (author-paper-venue);
evaluation: venue-cluster agreement of author embeddings."""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.sampling import random_walk


def build_graph(rng, num_authors=60, num_papers=120, num_venues=3):
    # authors belong to a latent venue community; papers link both
    author_comm = rng.integers(0, num_venues, num_authors)
    paper_comm = rng.integers(0, num_venues, num_papers)
    ap_src, ap_dst = [], []
    for p in range(num_papers):
        authors = rng.choice(
            np.nonzero(author_comm == paper_comm[p])[0],
            size=min(3, (author_comm == paper_comm[p]).sum()),
            replace=False)
        for a in authors:
            ap_src.append(a)
            ap_dst.append(p)
    pv_src = np.arange(num_papers)
    pv_dst = paper_comm
    g = dgl.heterograph({
        ("author", "writes", "paper"): (np.array(ap_src), np.array(ap_dst)),
        ("paper", "written-by", "author"): (np.array(ap_dst),
                                            np.array(ap_src)),
        ("paper", "published-at", "venue"): (pv_src, pv_dst),
        ("venue", "publishes", "paper"): (pv_dst, pv_src),
    })
    return g, author_comm


def main(epochs=150):
    rng = np.random.default_rng(0)
    g, author_comm = build_graph(rng)
    NA, NP, NV = (g.num_nodes(t) for t in ("author", "paper", "venue"))
    # one id space over all typed nodes: author | paper | venue
    offs = {"author": 0, "paper": NA, "venue": NA + NP}
    metapath = ["writes", "published-at", "publishes", "written-by"] * 2
    model = dglnn.MetaPath2Vec(num_nodes_total=NA + NP + NV, emb_dim=32,
                               window_size=3, negative_size=4)

    def sample_walks():
        seeds = rng.integers(0, NA, 64)
        traces, types = random_walk(g, seeds, metapath=metapath)
        traces = np.asarray(traces)
        types = np.asarray(types)
        ntype_names = [g.ntypes[t] for t in types]
        glob = traces.copy()
        for j, nt in enumerate(ntype_names):
            glob[:, j] = np.where(traces[:, j] >= 0,
                                  traces[:, j] + offs[nt], -1)
        return jnp.asarray(glob)

    params = model.init(jax.random.PRNGKey(0), sample_walks(),
                        jax.random.PRNGKey(1))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, walks, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, walks, key))(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt, sample_walks(),
                                 jax.random.PRNGKey(i))

    emb = np.asarray(model.apply(
        params, jnp.arange(NA), method=lambda m, ids: m.embed(ids)))
    # 1-NN label agreement among author embeddings
    d = ((emb[:, None] - emb[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    agree = (author_comm[d.argmin(1)] == author_comm).mean()
    print("1-NN venue agreement", agree)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    main(ap.parse_args().epochs)
