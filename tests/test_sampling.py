"""Sampling + dataloading tests (mirror reference
``tests/python/common/sampling/``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.sampling import (
    sample_neighbors,
    random_walk,
    node2vec_random_walk,
    global_uniform_negative_sampling,
    sample_labors,
    select_topk,
)
from dgl_tpu.dataloading import (
    NeighborSampler,
    MultiLayerFullNeighborSampler,
    LaborSampler,
    DataLoader,
    GraphDataLoader,
    pad_block,
    PAD_MASK,
    as_edge_prediction_sampler,
    negative_sampler,
    ClusterGCNSampler,
    SAINTSampler,
    ShaDowKHopSampler,
)

rng = np.random.default_rng(3)


@pytest.fixture(scope="module")
def g():
    dgl.set_seed(0)
    row = rng.integers(0, 100, 1000).astype(np.int32)
    col = rng.integers(0, 100, 1000).astype(np.int32)
    gg = dgl.graph((row, col), num_nodes=100)
    gg.ndata["feat"] = jnp.asarray(
        rng.normal(size=(100, 4)).astype(np.float32))
    gg.edata["w"] = jnp.asarray(rng.random(1000).astype(np.float32))
    return gg


def test_sample_neighbors_basic(g):
    seeds = np.array([0, 5, 10])
    sub = sample_neighbors(g, seeds, 3)
    assert sub.num_nodes() == g.num_nodes()
    # every sampled edge's dst is a seed, <= 3 per seed
    row, col = (np.asarray(x) for x in sub.unit().coo())
    assert set(col.tolist()) <= set(seeds.tolist())
    for s in seeds:
        assert (col == s).sum() <= 3
    # EIDs map back to real edges
    eids = np.asarray(sub.edata[dgl.EID])
    grow, gcol = (np.asarray(x) for x in g.unit().coo())
    np.testing.assert_array_equal(grow[eids], row)
    np.testing.assert_array_equal(gcol[eids], col)


def test_sample_neighbors_full(g):
    seeds = np.array([7])
    sub = sample_neighbors(g, seeds, -1)
    deg = int(g.in_degrees(7))
    assert sub.num_edges() == deg


def test_sample_neighbors_replace(g):
    seeds = np.array([3])
    sub = sample_neighbors(g, seeds, 50, replace=True)
    if int(g.in_degrees(3)) > 0:
        assert sub.num_edges() == 50


def test_sample_neighbors_prob(g):
    # zero out all but a few edges; sampled edges must have nonzero prob
    w = np.zeros(1000, np.float32)
    allowed = rng.choice(1000, 100, replace=False)
    w[allowed] = 1.0
    g.edata["p0"] = jnp.asarray(w)
    sub = sample_neighbors(g, np.arange(100), 5, prob="p0")
    eids = np.asarray(sub.edata[dgl.EID])
    assert np.all(w[eids] > 0)


def test_sample_neighbors_exclude(g):
    excl = np.arange(500)
    sub = sample_neighbors(g, np.arange(100), -1, exclude_edges=excl)
    eids = np.asarray(sub.edata[dgl.EID])
    assert not np.isin(eids, excl).any()


def test_sample_neighbors_out_dir(g):
    seeds = np.array([0, 1])
    sub = sample_neighbors(g, seeds, 2, edge_dir="out")
    row, col = (np.asarray(x) for x in sub.unit().coo())
    assert set(row.tolist()) <= {0, 1}


def test_select_topk(g):
    sub = select_topk(g, 2, "w", np.arange(100))
    row, col = (np.asarray(x) for x in sub.unit().coo())
    w = np.asarray(g.edata["w"])
    eids = np.asarray(sub.edata[dgl.EID])
    gcol = np.asarray(g.unit().coo()[1])
    for s in range(100):
        mine = eids[col == s]
        if len(mine) == 0:
            continue
        all_edges = np.nonzero(gcol == s)[0]
        top = all_edges[np.argsort(-w[all_edges])[: 2]]
        assert set(mine.tolist()) == set(top.tolist())


def test_random_walk(g):
    traces, types = random_walk(g, [0, 1, 2, 3], length=5)
    assert traces.shape == (4, 6)
    tr = np.asarray(traces)
    # consecutive hops are actual edges
    grow, gcol = (np.asarray(x) for x in g.unit().coo())
    edge_set = set(zip(grow.tolist(), gcol.tolist()))
    for t in range(4):
        for i in range(5):
            a, b = tr[t, i], tr[t, i + 1]
            if a >= 0 and b >= 0:
                assert (a, b) in edge_set


def test_node2vec(g):
    tr = np.asarray(node2vec_random_walk(g, [0, 1], 1.0, 2.0, 4))
    assert tr.shape == (2, 5)


def test_negative_sampling(g):
    u, v = global_uniform_negative_sampling(g, 100)
    u, v = np.asarray(u), np.asarray(v)
    grow, gcol = (np.asarray(x) for x in g.unit().coo())
    edge_set = set(zip(grow.tolist(), gcol.tolist()))
    for a, b in zip(u.tolist(), v.tolist()):
        assert (a, b) not in edge_set
        assert a != b


def test_labor_sampling(g):
    seeds = np.arange(50)
    sub, weights = sample_labors(g, seeds, 4)
    row, col = (np.asarray(x) for x in sub.unit().coo())
    assert set(col.tolist()) <= set(seeds.tolist())
    assert np.all(np.asarray(weights[0]) >= 1.0)


def test_neighbor_sampler_blocks(g):
    sampler = NeighborSampler([3, 5])
    seeds = np.array([1, 2, 3, 4])
    input_nodes, output_nodes, blocks = sampler.sample(g, seeds)
    assert len(blocks) == 2
    assert blocks[-1].num_dst_nodes() == 4
    # chained: first block's dst = second block's src
    assert blocks[0].num_dst_nodes() == blocks[1].num_src_nodes()
    np.testing.assert_array_equal(np.asarray(blocks[1].dstdata[dgl.NID]),
                                  seeds)
    # seeds prefix invariant
    src0 = np.asarray(blocks[1].srcdata[dgl.NID])
    np.testing.assert_array_equal(src0[:4], seeds)


def test_full_neighbor_sampler(g):
    sampler = MultiLayerFullNeighborSampler(2)
    _, _, blocks = sampler.sample(g, np.array([0]))
    assert len(blocks) == 2


def test_labor_sampler_blocks(g):
    sampler = LaborSampler([3, 3])
    _, _, blocks = sampler.sample(g, np.array([1, 2]))
    assert len(blocks) == 2
    assert "edge_weights" in blocks[0].edata


def test_pad_block(g):
    sampler = NeighborSampler([3])
    _, _, blocks = sampler.sample(g, np.array([1, 2, 3]))
    b = blocks[0]
    pb = pad_block(b)
    assert pb.num_src_nodes() >= b.num_src_nodes() + 1
    assert (pb.num_src_nodes() & (pb.num_src_nodes() - 1)) == 0  # pow2
    mask = np.asarray(pb.srcdata[PAD_MASK])
    assert mask.sum() == b.num_src_nodes()
    # message passing on padded block matches unpadded for real dst nodes
    import dgl_tpu.function as fn
    feat = jnp.asarray(rng.normal(
        size=(b.num_src_nodes(), 4)).astype(np.float32))
    b.srcdata["h"] = feat
    b.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    padded_feat = jnp.concatenate([
        feat, jnp.zeros((pb.num_src_nodes() - feat.shape[0], 4))])
    pb.srcdata["h"] = padded_feat
    pb.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    np.testing.assert_allclose(
        np.asarray(pb.dstdata["o"])[: b.num_dst_nodes()],
        np.asarray(b.dstdata["o"]), rtol=1e-5)
    # mean must also match (degrees preserved)
    b.update_all(fn.copy_u("h", "m"), fn.mean("m", "om"))
    pb.update_all(fn.copy_u("h", "m"), fn.mean("m", "om"))
    np.testing.assert_allclose(
        np.asarray(pb.dstdata["om"])[: b.num_dst_nodes()],
        np.asarray(b.dstdata["om"]), rtol=1e-5)


def test_dataloader_shapes_stable(g):
    sampler = NeighborSampler([3, 3])
    dl = DataLoader(g, np.arange(64), sampler, batch_size=16, shuffle=True,
                    pad=True)
    shapes = set()
    count = 0
    for input_nodes, output_nodes, blocks in dl:
        shapes.add(tuple((b.num_src_nodes(), b.num_dst_nodes(),
                          b.num_edges()) for b in blocks))
        count += 1
    assert count == 4
    # padding should keep the number of distinct shape signatures tiny
    assert len(shapes) <= 2


def test_dataloader_no_prefetch(g):
    sampler = NeighborSampler([2])
    dl = DataLoader(g, np.arange(10), sampler, batch_size=4,
                    use_prefetch_thread=False)
    batches = list(dl)
    assert len(batches) == 3
    assert len(dl) == 3


def test_dataloader_minibatch_training(g):
    """GATE #2 shape: minibatch GraphSAGE training loop over padded blocks."""
    import optax
    import flax.linen as nn
    from dgl_tpu import nn as dglnn

    labels = jnp.asarray((np.asarray(g.ndata["feat"])[:, 0] > 0)
                         .astype(np.int32))
    g.ndata["label"] = labels

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = jax.nn.relu(dglnn.SAGEConv(4, 16, "mean")(blocks[0], x))
            return dglnn.SAGEConv(16, 2, "mean")(blocks[1], h)

    model = SAGE()
    sampler = NeighborSampler([4, 4])
    dl = DataLoader(g, np.arange(100), sampler, batch_size=32, shuffle=True)
    params = None
    tx = optax.adam(1e-2)

    @jax.jit
    def step(params, opt_state, blocks, x, y, mask):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * mask).sum() / mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    per_epoch = None
    for epoch in range(4):
        for input_nodes, output_nodes, blocks in dl:
            x = blocks[0].srcdata["feat"]
            y = blocks[-1].dstdata["label"]
            mask = blocks[-1].dstdata[PAD_MASK].astype(jnp.float32)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), blocks, x)
                opt_state = tx.init(params)
            params, opt_state, loss = step(params, opt_state, blocks, x, y,
                                           mask)
            losses.append(float(loss))
        per_epoch = per_epoch or len(losses)
    # epoch-mean comparison: single-batch endpoints flake under the
    # shuffled batch order (seen: 0.874 vs 0.844 on a passing model)
    assert np.mean(losses[-per_epoch:]) < np.mean(losses[:per_epoch])


def test_graph_dataloader():
    ds = dgl.data.TUDataset("SYNTH2")
    dl = GraphDataLoader(ds, batch_size=8, shuffle=True)
    bg, labels = next(iter(dl))
    assert bg.batch_size == 8
    assert labels.shape == (8,)


def test_cluster_gcn_sampler(g):
    sampler = ClusterGCNSampler(g, 4)
    sub = sampler.sample(g, np.array([0, 1]))
    assert sub.num_nodes() > 0
    assert dgl.NID in sub.ndata


def test_saint_sampler(g):
    for mode, budget in [("node", 30), ("edge", 50), ("walk", (10, 3))]:
        sampler = SAINTSampler(mode, budget)
        sub = sampler.sample(g, None)
        assert sub.num_nodes() > 0


def test_shadow_sampler(g):
    sampler = ShaDowKHopSampler([3, 3])
    seeds, sg, seed_pos = sampler.sample(g, np.array([5, 6]))
    nid = np.asarray(sg.ndata[dgl.NID])
    np.testing.assert_array_equal(nid[np.asarray(seed_pos)], [5, 6])


def test_edge_prediction_sampler(g):
    sampler = NeighborSampler([3])
    ep = as_edge_prediction_sampler(
        sampler, negative_sampler=negative_sampler.Uniform(2))
    input_nodes, pair_g, neg_g, blocks = ep.sample(g, np.arange(10))
    assert pair_g.num_edges() == 10
    assert neg_g.num_edges() == 20
    assert len(blocks) == 1


def test_sample_neighbors_biased():
    """Tag-biased sampling: zero-bias tags are never picked; high-bias
    tags dominate (reference sampling/neighbor.py:690 semantics)."""
    rng = np.random.default_rng(0)
    n = 60
    tag = rng.integers(0, 3, n)
    row = np.repeat(np.arange(n), 10)
    col = rng.integers(0, n, n * 10)
    # in-edges of each seed: neighbors = srcs
    g = dgl.graph((col, row), num_nodes=n)   # sample in-edges of seeds
    from dgl_tpu.sampling import sample_neighbors_biased
    bias = np.array([0.0, 1.0, 10.0])
    sub = sample_neighbors_biased(g, np.arange(n), 4, bias, tag=tag)
    srow, scol = (np.asarray(a) for a in sub.unit().coo())
    # neighbors (srcs) with tag 0 never picked
    assert (tag[srow] != 0).all()
    # heavy tag picked much more often than light (10:1 bias)
    c1 = (tag[srow] == 1).sum()
    c2 = (tag[srow] == 2).sum()
    assert c2 > 2 * c1
    assert "_bias_w" not in g.edata   # temp weight cleaned up


def test_layerwise_inference_parity():
    """Layer-wise offline inference (reference SAGE.inference,
    ``examples/pytorch/graphsage/node_classification.py:40``): the
    batched full-neighbor path must equal the full-graph path exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn
    from dgl_tpu.dataloading import layerwise_inference

    rng = np.random.default_rng(7)
    n, e = 200, 1500
    g = dgl.add_self_loop(dgl.graph(
        (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n))
    x = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
    c1 = dglnn.SAGEConv(10, 12, "mean")
    c2 = dglnn.SAGEConv(12, 3, "mean")
    p1 = c1.init(jax.random.PRNGKey(0), g, x)
    p2 = c2.init(jax.random.PRNGKey(1), g, jnp.zeros((n, 12)))
    fns = [lambda gg, h: jax.nn.relu(c1.apply(p1, gg, h)),
           lambda gg, h: c2.apply(p2, gg, h)]
    full = layerwise_inference(g, fns, x)
    batched = layerwise_inference(g, fns, x, batch_size=48)
    assert full.shape == batched.shape == (n, 3)
    np.testing.assert_allclose(np.asarray(full), np.asarray(batched),
                               atol=1e-5)
    # the temp field must not leak
    assert "_infer_h" not in g.ndata
