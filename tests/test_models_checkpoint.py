"""Model-zoo + checkpoint/resume tests."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import dgl_tpu as dgl
from dgl_tpu import models
from dgl_tpu import checkpoint as ckpt
from conftest import random_graph


@pytest.fixture
def g():
    g, _, _ = random_graph(30, 150, seed=0)
    return dgl.add_self_loop(g)


@pytest.mark.parametrize("cls,kw", [
    (models.GCN, {}),
    (models.GraphSAGE, {}),
    (models.GAT, {}),
    (models.GIN, {}),
    (models.SGC, {}),
])
def test_node_encoders(g, cls, kw):
    x = jnp.ones((30, 6), jnp.float32)
    m = cls(in_size=6, out_size=4, **kw)
    params = m.init(jax.random.PRNGKey(0), g, x)
    out = m.apply(params, g, x)
    assert out.shape == (30, 4)


def test_node_encoder_on_blocks(g):
    from dgl_tpu.dataloading import DataLoader, NeighborSampler
    g.ndata["feat"] = np.ones((30, 6), np.float32)
    dl = DataLoader(g, np.arange(12), NeighborSampler([3, 3]),
                    batch_size=12)
    input_nodes, output_nodes, blocks = next(iter(dl))
    x = blocks[0].srcdata["feat"]
    m = models.GraphSAGE(in_size=6, out_size=4)
    params = m.init(jax.random.PRNGKey(0), blocks, x)
    out = m.apply(params, blocks, x)
    assert out.shape[0] == blocks[-1].num_dst_nodes()


def test_edge_scorers():
    h1 = jnp.ones((7, 8))
    h2 = jnp.ones((7, 8)) * 2
    for cls in (models.DotPredictor, models.MLPPredictor,
                models.BilinearPredictor):
        m = cls()
        params = m.init(jax.random.PRNGKey(0), h1, h2)
        s = m.apply(params, h1, h2)
        assert s.shape == (7,)


def test_graph_encoder():
    gs = [random_graph(8, 20, seed=i)[0] for i in range(3)]
    bg = dgl.batch(gs)
    x = jnp.ones((bg.num_nodes(), 5))
    m = models.GINGraphEncoder(in_size=5, out_size=3)
    params = m.init(jax.random.PRNGKey(0), bg, x)
    out = m.apply(params, bg, x)
    assert out.shape == (3, 3)


def test_checkpoint_roundtrip(tmp_path, g):
    x = jnp.ones((30, 6), jnp.float32)
    m = models.GCN(in_size=6, out_size=4)
    params = m.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(1e-2)
    state = {"params": params, "opt": tx.init(params), "step": 5}
    path = ckpt.save_checkpoint(str(tmp_path), state, step=5)
    assert ckpt.latest_step(str(tmp_path)) == 5
    loaded, step = ckpt.load_checkpoint(str(tmp_path))
    assert step == 5
    out1 = m.apply(params, g, x)
    out2 = m.apply(jax.tree_util.tree_map(jnp.asarray,
                                          loaded["params"]), g, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6)
    # rotation: write more steps, keep_last=2
    for s in (6, 7, 8):
        ckpt.save_checkpoint(str(tmp_path), state, step=s, keep_last=2)
    assert ckpt.latest_step(str(tmp_path)) == 8
    import os
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_"))
    assert kept == ["step_7", "step_8"]


def test_epoch_state_resume():
    rng = np.random.default_rng(42)
    _ = rng.permutation(100)          # advance
    st = ckpt.epoch_state(3, 17, rng)
    nxt_expected = rng.permutation(50)
    epoch, bidx, rng2 = ckpt.restore_epoch_state(st)
    assert (epoch, bidx) == (3, 17)
    np.testing.assert_array_equal(rng2.permutation(50), nxt_expected)
