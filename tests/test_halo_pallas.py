"""Pallas local kernels inside the halo plane (parallel/halo_pallas)
vs the XLA halo path and the single-chip oracle, on the 8-device CPU
mesh (kernels run in Pallas interpret mode off-TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import dgl_tpu as dgl
from dgl_tpu.ops import gspmm
from dgl_tpu.parallel import shard_graph


def _mesh():
    devs = jax.devices()
    return Mesh(np.array(devs[:8]), ("data",))


def _graph(n=280, e=2200, seed=0, with_dups=True):
    rng = np.random.default_rng(seed)
    block = n // 8
    src = rng.integers(0, n, e)
    intra = rng.uniform(size=e) < 0.7
    dst = np.where(intra,
                   (src // block) * block + rng.integers(0, block, e),
                   rng.integers(0, n, e))
    if with_dups:   # multi-edges exercise the bit-kind COO remainder
        src[:40] = src[0]
        dst[:40] = dst[0]
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    return g, x


@pytest.mark.parametrize("kind", ["bit", "tiled"])
def test_halo_fast_spmm_parity(kind):
    g, x = _graph()
    mesh = _mesh()
    mg = shard_graph(g, mesh, part_method="contiguous")
    chosen = mg.create_pallas_format(kind=kind)
    assert chosen == kind
    xs = mg.shard_node_array(x)
    want = gspmm(g.unit(), "copy_lhs", "sum", jnp.asarray(x), None)
    got = mg.unit().halo_gspmm("copy_lhs", "sum", xs, None)
    np.testing.assert_allclose(mg.unshard_node_array(got),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["bit", "tiled"])
def test_halo_fast_spmm_grad(kind):
    g, x = _graph(seed=1)
    mesh = _mesh()
    mg = shard_graph(g, mesh, part_method="contiguous")
    mg.create_pallas_format(kind=kind)
    unit = mg.unit()

    def loss_mesh(xv):
        out = unit.halo_gspmm("copy_lhs", "sum",
                              mg.shard_node_array(xv), None)
        return (out[:mg.hg.num_nodes] ** 2).sum()

    def loss_oracle(xv):
        return (gspmm(g.unit(), "copy_lhs", "sum", xv, None) ** 2).sum()

    gm = jax.grad(loss_mesh)(jnp.asarray(x))
    go = jax.grad(loss_oracle)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gm), np.asarray(go),
                               rtol=5e-2, atol=5e-2)


def test_graphconv_on_fast_path():
    """GraphConv via update_all hits the fast format (copy_u/sum) and
    matches the single-device module."""
    from dgl_tpu import nn as dglnn
    g, x = _graph(seed=2, with_dups=False)
    mesh = _mesh()
    mg = shard_graph(g, mesh, part_method="contiguous")
    mg.create_pallas_format(kind="bit")
    conv = dglnn.GraphConv(12, 6)
    params = conv.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    want = conv.apply(params, g, jnp.asarray(x))
    got = mg.unshard_node_array(
        conv.apply(params, mg.local_var(), mg.shard_node_array(x)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-2,
                               atol=2e-2)
