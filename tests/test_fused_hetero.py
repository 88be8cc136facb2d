"""Fused multi_update_all dispatch: one stacked SpMM per dst type must
match the per-relation reference path exactly (reference semantics
``python/dgl/heterograph.py:5161``)."""
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu
import dgl_tpu.function as fn
from dgl_tpu.utils import config


def _hetero():
    rng = np.random.default_rng(0)
    g = dgl_tpu.heterograph({
        ("user", "follows", "user"): (rng.integers(0, 10, 30),
                                      rng.integers(0, 10, 30)),
        ("item", "bought-by", "user"): (rng.integers(0, 7, 20),
                                        rng.integers(0, 10, 20)),
        ("tag", "tags", "user"): (rng.integers(0, 5, 12),
                                  rng.integers(0, 10, 12)),
        ("user", "likes", "item"): (rng.integers(0, 10, 15),
                                    rng.integers(0, 7, 15)),
    })
    g.nodes["user"].data["h"] = jnp.asarray(
        rng.normal(size=(10, 4)).astype(np.float32))
    g.nodes["item"].data["h"] = jnp.asarray(
        rng.normal(size=(7, 4)).astype(np.float32))
    g.nodes["tag"].data["h"] = jnp.asarray(
        rng.normal(size=(5, 4)).astype(np.float32))
    for cet in g.canonical_etypes:
        ne = g.num_edges(cet)
        g.edges[cet].data["w"] = jnp.asarray(
            rng.normal(size=(ne,)).astype(np.float32))
        g.edges[cet].data["m"] = jnp.asarray(
            rng.normal(size=(ne, 4)).astype(np.float32))
    return g


def _run(g, etype_dict, cross, fuse):
    old = config.get("fuse_multi_update_all")
    config.set("fuse_multi_update_all", fuse)
    try:
        g = g.clone() if hasattr(g, "clone") else g
        g.multi_update_all(etype_dict, cross)
        return {nt: np.asarray(g.nodes[nt].data["out"])
                for nt in g.ntypes if "out" in g.nodes[nt].data}
    finally:
        config.set("fuse_multi_update_all", old)


@pytest.mark.parametrize("cross", ["sum", "mean"])
@pytest.mark.parametrize("mkind", ["copy_u", "u_mul_e", "copy_e"])
def test_fused_matches_unfused(cross, mkind):
    def mk(et):
        if mkind == "copy_u":
            return fn.copy_u("h", "m")
        if mkind == "u_mul_e":
            return fn.u_mul_e("h", "w", "m")
        return fn.copy_e("m", "m")

    for g in [_hetero()]:
        ed = {et: (mk(et), fn.sum("m", "out"))
              for et in ["follows", "bought-by", "tags", "likes"]}
        ref = _run(_hetero(), ed, cross, fuse=False)
        out = _run(_hetero(), ed, cross, fuse=True)
        assert set(ref) == set(out)
        for nt in ref:
            np.testing.assert_allclose(out[nt], ref[nt],
                                       rtol=1e-5, atol=1e-5)


def test_fused_cache_reused():
    g = _hetero()
    ed = {et: (fn.copy_u("h", "m"), fn.sum("m", "out"))
          for et in ["follows", "bought-by", "tags"]}
    config.set("fuse_multi_update_all", True)
    g.multi_update_all(ed, "sum")
    assert len(g._fused_cache) == 1
    cached = next(iter(g._fused_cache.values()))
    g.multi_update_all(ed, "sum")
    assert next(iter(g._fused_cache.values())) is cached


def test_mixed_kinds_fall_back_correctly():
    g = _hetero()
    ed = {
        "follows": (fn.copy_u("h", "m"), fn.sum("m", "out")),
        "bought-by": (fn.u_mul_e("h", "w", "m"), fn.sum("m", "out")),
        "tags": (fn.copy_u("h", "m"), fn.sum("m", "out")),
    }
    ref = _run(_hetero(), ed, "sum", fuse=False)
    out = _run(_hetero(), ed, "sum", fuse=True)
    for nt in ref:
        np.testing.assert_allclose(out[nt], ref[nt], rtol=1e-5, atol=1e-5)


def test_nonfusable_reducers_unchanged():
    g = _hetero()
    ed = {et: (fn.copy_u("h", "m"), fn.max("m", "out"))
          for et in ["follows", "bought-by", "tags"]}
    ref = _run(_hetero(), ed, "max", fuse=False)
    out = _run(g, ed, "max", fuse=True)
    for nt in ref:
        np.testing.assert_allclose(out[nt], ref[nt], rtol=1e-5, atol=1e-5)
    assert len(g._fused_cache) == 0


def test_stack_cross_reducer_still_works():
    ed = {et: (fn.copy_u("h", "m"), fn.sum("m", "out"))
          for et in ["follows", "bought-by", "tags"]}
    out = _run(_hetero(), ed, "stack", fuse=True)
    assert out["user"].shape == (10, 3, 4)


def test_fused_on_hetero_blocks():
    """Fused dispatch must also be exact on block (MFG) heterographs —
    the R-GCN minibatch path."""
    rng = np.random.default_rng(3)
    g = _hetero()
    seeds = {"user": np.arange(6)}
    block = dgl_tpu.to_block(g, seeds) if hasattr(dgl_tpu, "to_block") \
        else None
    if block is None:
        pytest.skip("to_block unavailable")
    # set src features on the block for each src type
    for st in set(c[0] for c in block.canonical_etypes):
        n = block.num_src_nodes(st)
        block.srcnodes[st].data["h"] = jnp.asarray(
            rng.normal(size=(n, 4)).astype(np.float32))
    ed = {et[1]: (fn.copy_u("h", "m"), fn.sum("m", "out"))
          for et in block.canonical_etypes if et[2] == "user"}
    if len(ed) < 2:
        pytest.skip("not enough relations into user")

    def run(fuse):
        old = config.get("fuse_multi_update_all")
        config.set("fuse_multi_update_all", fuse)
        try:
            b = block.clone()
            b.multi_update_all(ed, "sum")
            return np.asarray(b.dstnodes["user"].data["out"])
        finally:
            config.set("fuse_multi_update_all", old)

    np.testing.assert_allclose(run(True), run(False), rtol=1e-5,
                               atol=1e-5)
