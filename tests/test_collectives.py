"""Sparse all-to-all collectives over an 8-device mesh (reference
``python/dgl/cuda/nccl.py sparse_all_to_all_push/pull`` semantics, on
ICI via shard_map + lax.all_to_all)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from dgl_tpu.parallel.collectives import push_sharded, pull_sharded

P_, N, F, CAP = 8, 16, 4, 8


def _mesh():
    return Mesh(np.array(jax.devices()[:P_]), ("data",))


def test_push_sharded():
    mesh = _mesh()
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 64, (P_, N)))
    val = jnp.asarray(rng.normal(size=(P_, N, F)).astype(np.float32))
    owner = (idx % P_).astype(jnp.int32)
    ri, rv, rm = push_sharded(mesh, "data", idx, val, owner, CAP)
    ri, rv, rm = (np.asarray(x) for x in (ri, rv, rm))
    # device d received exactly the items destined to it, values intact
    for d in range(P_):
        got = sorted(map(tuple, np.round(rv[d][rm[d]], 4).tolist()))
        want = []
        for s in range(P_):
            sel = np.asarray(owner)[s] == d
            want += np.round(np.asarray(val)[s][sel], 4).tolist()
        assert got == sorted(map(tuple, want)), d


def test_pull_sharded():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(64, F)).astype(np.float32))
    table_s = jax.device_put(table, NamedSharding(mesh, PS("data")))
    req = jnp.asarray(rng.integers(0, 64, (P_, N)))
    out = np.asarray(pull_sharded(mesh, "data", req, table_s, CAP))
    want = np.asarray(table)[np.asarray(req)]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_push_grad_accumulate_semantics():
    """Duplicate indices land as separate slots — the receiver
    scatter-adds them (the sparse-optimizer contract)."""
    mesh = _mesh()
    idx = jnp.zeros((P_, 2), jnp.int32)          # everyone pushes id 0
    val = jnp.ones((P_, 2, F), jnp.float32)
    owner = jnp.zeros((P_, 2), jnp.int32)        # all to device 0
    ri, rv, rm = push_sharded(mesh, "data", idx, val, owner, CAP)
    ri, rv, rm = (np.asarray(x) for x in (ri, rv, rm))
    # accumulate on the receiving side
    acc = np.zeros((1, F), np.float32)
    np.add.at(acc, ri[0][rm[0]], rv[0][rm[0]])
    np.testing.assert_allclose(acc[0], P_ * 2)
