"""GraphBolt-pipeline tests (mirror reference
``tests/python/pytorch/graphbolt/``)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import graphbolt as gb

rng = np.random.default_rng(0)


@pytest.fixture(scope="module")
def graph():
    dgl.set_seed(1)
    N, E = 200, 2000
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    return gb.from_dglgraph(g), g


def test_itemset():
    s = gb.ItemSet(np.arange(10))
    assert len(s) == 10
    assert s[3] == 3
    s2 = gb.ItemSet((np.arange(10), np.arange(10) * 2),
                    names=("seeds", "labels"))
    a, b = s2[np.array([1, 2])]
    np.testing.assert_array_equal(b, [2, 4])


def test_item_sampler():
    s = gb.ItemSet((np.arange(20), np.arange(20) % 3),
                   names=("seeds", "labels"))
    batches = list(gb.ItemSampler(s, batch_size=8))
    assert len(batches) == 3
    assert len(batches[0].seeds) == 8
    assert batches[0].labels is not None


def test_sample_neighbors_contract(graph):
    gbg, g = graph
    seeds = np.array([3, 7, 11])
    sg = gbg.sample_neighbors(seeds, [4])
    assert len(sg.indptr) == 4
    np.testing.assert_array_equal(sg.original_column_node_ids, seeds)
    # every edge is a real in-edge of its seed
    grow, gcol = (np.asarray(a) for a in g.unit().coo())
    for i, s in enumerate(seeds):
        nbrs = sg.indices[sg.indptr[i]:sg.indptr[i + 1]]
        eids = sg.original_edge_ids[sg.indptr[i]:sg.indptr[i + 1]]
        assert len(nbrs) <= 4
        # original_edge_ids index the CSC layout; verify via the graph's csc
        csc = g.unit().csc()
        np.testing.assert_array_equal(
            np.asarray(csc.indices)[eids], nbrs)


def test_in_subgraph(graph):
    gbg, g = graph
    sg = gbg.in_subgraph(np.array([5]))
    assert sg.indptr[-1] == int(g.in_degrees(5))


def test_labor_shared_randomness(graph):
    gbg, g = graph
    seeds = np.arange(50)
    sg1 = gbg.sample_neighbors(seeds, [3], layer=True, random_seed=7)
    sg2 = gbg.sample_neighbors(seeds, [3], layer=True, random_seed=7)
    np.testing.assert_array_equal(sg1.original_edge_ids,
                                  sg2.original_edge_ids)


def test_unique_and_compact():
    uniq, (a, b) = gb.unique_and_compact(
        [np.array([5, 3, 5]), np.array([3, 9])])
    np.testing.assert_array_equal(uniq, [3, 5, 9])
    np.testing.assert_array_equal(uniq[a], [5, 3, 5])
    np.testing.assert_array_equal(uniq[b], [3, 9])


def test_feature_stores(tmp_path):
    arr = rng.normal(size=(50, 8)).astype(np.float32)
    f = gb.ArrayFeature(arr)
    np.testing.assert_array_equal(f.read(np.array([3])), arr[[3]])
    path = os.path.join(tmp_path, "feat.npy")
    np.save(path, arr)
    d = gb.DiskBasedFeature(path)
    np.testing.assert_array_equal(d.read(np.array([7, 9])), arr[[7, 9]])
    cached = gb.DeviceCachedFeature(gb.ArrayFeature(arr),
                                    cache_ids=np.array([0, 1, 2]))
    np.testing.assert_allclose(cached.read(np.array([1, 10])),
                               arr[[1, 10]], rtol=1e-6)


def test_full_pipeline(graph):
    gbg, g = graph
    feat = rng.normal(size=(200, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 200)
    store = gb.BasicFeatureStore({
        ("node", None, "feat"): gb.ArrayFeature(feat),
    })
    items = gb.ItemSet((np.arange(64), labels[:64]),
                       names=("seeds", "labels"))
    pipe = (gb.ItemSampler(items, batch_size=16, shuffle=True)
            .sample_neighbor(gbg, [3, 3])
            .fetch_feature(store, ["feat"])
            .to_blocks(pad=True))
    count = 0
    for mb in gb.DataLoader(pipe):
        count += 1
        assert len(mb.blocks) == 2
        assert mb.blocks[0].is_block
        assert "feat" in mb.node_features
        # seeds are the prefix of the last block's dst NID
        dst = np.asarray(mb.blocks[-1].dstdata[dgl.NID])[:16]
        assert set(dst.tolist()) <= set(range(200))
    assert count == 4


def test_pipeline_training(graph):
    """Minibatch training through the graphbolt pipeline."""
    import optax
    import flax.linen as nn
    from dgl_tpu import nn as dglnn
    from dgl_tpu.dataloading import PAD_MASK

    gbg, g = graph
    feat = rng.normal(size=(200, 8)).astype(np.float32)
    labels = (feat[:, 0] > 0).astype(np.int32)
    store = gb.BasicFeatureStore({
        ("node", None, "feat"): gb.ArrayFeature(feat)})
    items = gb.ItemSet((np.arange(200), labels), names=("seeds", "labels"))

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = jax.nn.relu(dglnn.SAGEConv(8, 16, "mean")(blocks[0], x))
            return dglnn.SAGEConv(16, 2, "mean")(blocks[1], h)

    model = SAGE()
    tx = optax.adam(1e-2)
    params = opt_state = None

    @jax.jit
    def step(params, opt_state, blocks, x, y, mask):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(3):
        pipe = (gb.ItemSampler(items, batch_size=64, shuffle=True)
                .sample_neighbor(gbg, [4, 4])
                .fetch_feature(store, ["feat"])
                .to_blocks(pad=True))
        for mb in pipe:
            x = jnp.asarray(mb.blocks[0].srcdata["_gb_feat"]
                            if "_gb_feat" in mb.blocks[0].srcdata
                            else feat[np.asarray(
                                mb.blocks[0].srcdata[dgl.NID])])
            # pad x to block size
            S = mb.blocks[0].num_src_nodes()
            if x.shape[0] < S:
                x = jnp.concatenate(
                    [x, jnp.zeros((S - x.shape[0], x.shape[1]))])
            y_ids = np.asarray(mb.blocks[-1].dstdata[dgl.NID])
            y = jnp.asarray(labels[y_ids])
            mask = mb.blocks[-1].dstdata[PAD_MASK].astype(jnp.float32)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), mb.blocks, x)
                opt_state = tx.init(params)
            params, opt_state, loss = step(params, opt_state, mb.blocks,
                                           x, y, mask)
            losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_negative_sampler(graph):
    gbg, g = graph
    pairs = np.stack([rng.integers(0, 200, 10),
                      rng.integers(0, 200, 10)], 1)
    items = gb.ItemSet(pairs, names=("seeds",))
    pipe = gb.ItemSampler(items, batch_size=5).sample_uniform_negative(
        gbg, 2)
    mb = next(iter(pipe))
    assert len(mb.negative_srcs) == 10
    assert len(mb.negative_dsts) == 10


def test_ondisk_dataset(tmp_path):
    import yaml
    root = str(tmp_path)
    edges = np.stack([rng.integers(0, 30, 100),
                      rng.integers(0, 30, 100)], 1)
    np.save(os.path.join(root, "edges.npy"), edges)
    feat = rng.normal(size=(30, 4)).astype(np.float32)
    np.save(os.path.join(root, "feat.npy"), feat)
    train = np.arange(20)
    np.save(os.path.join(root, "train.npy"), train)
    meta = {
        "dataset_name": "toy",
        "graph": {"nodes": [{"num": 30}],
                  "edges": [{"path": "edges.npy"}]},
        "feature_data": [{"domain": "node", "name": "feat",
                          "path": "feat.npy", "in_memory": True}],
        "tasks": [{"name": "node_classification", "num_classes": 2,
                   "train_set": [{"name": "seeds", "path": "train.npy"}]}],
    }
    with open(os.path.join(root, "metadata.yaml"), "w") as f:
        yaml.safe_dump(meta, f)
    ds = gb.OnDiskDataset(root).load()
    assert ds.graph.total_num_nodes == 30
    assert ds.graph.total_num_edges == 100
    assert ds.tasks[0].metadata["num_classes"] == 2
    assert len(ds.tasks[0].train_set) == 20
    np.testing.assert_array_equal(
        ds.feature.read("node", None, "feat", np.array([3])), feat[[3]])


def test_exclude_seed_edges(graph):
    """Seed edges are removed from sampled subgraphs (leakage removal)."""
    gbg, g = graph
    row, col = (np.asarray(a) for a in g.unit().coo())
    seeds = np.stack([row[:5], col[:5]], 1)     # first 5 edges as pairs
    sg = gbg.sample_neighbors(np.unique(seeds.reshape(-1)), [-1])
    mb = gb.MiniBatch(seeds=seeds, sampled_subgraphs=[sg])
    mb = gb.exclude_seed_edges(mb)
    out = mb.sampled_subgraphs[0]
    dst = np.repeat(out.original_column_node_ids, np.diff(out.indptr))
    banned = set(map(tuple, seeds.tolist()))
    for u, v in zip(out.indices.tolist(), dst.tolist()):
        assert (u, v) not in banned
    # indptr consistent
    assert out.indptr[-1] == len(out.indices)


def test_preprocess_ondisk_dataset(tmp_path):
    import yaml
    import numpy as np
    import dgl_tpu.graphbolt as gb
    rng = np.random.default_rng(0)
    n, e = 50, 300
    (tmp_path / "data").mkdir()
    pairs = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)],
                     axis=1).astype(np.int64)
    np.save(tmp_path / "data" / "edges.npy", pairs)
    meta = {"dataset_name": "t", "graph": {
        "nodes": [{"num": n}], "edges": [{"path": "data/edges.npy"}]}}
    with open(tmp_path / "metadata.yaml", "w") as f:
        yaml.safe_dump(meta, f)
    out = gb.preprocess_ondisk_dataset(str(tmp_path))
    z = np.load(tmp_path / "preprocessed" / "csc_graph.npz")
    assert z["indptr"][-1] == e
    # csc reconstructs the edge set
    dst = np.repeat(np.arange(n), np.diff(z["indptr"]))
    src = z["indices"]
    assert sorted(zip(src.tolist(), dst.tolist())) == \
        sorted(zip(pairs[:, 0].tolist(), pairs[:, 1].tolist()))
    # unchanged dataset -> no re-preprocess (hash manifest)
    assert not gb.check_dataset_change(str(tmp_path))
    # touch the data -> change detected
    np.save(tmp_path / "data" / "edges.npy", pairs[:-1])
    assert gb.check_dataset_change(str(tmp_path))


def test_graphbolt_stage_classes():
    import numpy as np
    import dgl_tpu.graphbolt as gb
    # Bufferer preserves order; EndMarker is identity
    class Src:
        def __iter__(self):
            return iter(range(5))
    out = list(gb.EndMarker(gb.Bufferer(Src(), buffer_size=2)))
    assert out == [0, 1, 2, 3, 4]
    adj = gb.datapipe_graph_to_adjlist(gb.EndMarker(gb.Bufferer(Src())))
    assert "EndMarker" in adj
