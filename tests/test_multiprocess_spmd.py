"""True multi-process SPMD test (SURVEY §4: multi-host is tested by
spawning N localhost processes): 2 jax.distributed processes x 4 CPU
devices = one global 8-device mesh running a sharded dgl_tpu train step.

This validates the actual multi-host code path (jax.distributed
coordinator + global mesh + collectives across process boundaries) that
``dryrun_multichip`` only exercises single-process.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dgl_tpu
import dgl_tpu.function as fn

devices = np.array(jax.devices()).reshape(-1)
assert len(devices) == 8, f"expected 8 global devices, got {len(devices)}"
mesh = Mesh(devices, ("dp",))

# replicated small graph; batch-sharded features (DP)
rng = np.random.default_rng(0)
N, E, F = 64, 256, 8
g = dgl_tpu.graph((rng.integers(0, N, E), rng.integers(0, N, E)),
                  num_nodes=N)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.1)

def step(x, w):
    gg = g.clone()
    gg.ndata["h"] = x @ w
    gg.update_all(fn.copy_u("h", "m"), fn.sum("m", "out"))
    return gg.ndata["out"].sum()

sharding = NamedSharding(mesh, P())
xs = jax.device_put(x, sharding)
ws = jax.device_put(w, sharding)
out = jax.jit(step)(xs, ws)
# cross-process collective: psum over the global mesh
from functools import partial
from jax.experimental.shard_map import shard_map
vals = jax.device_put(jnp.arange(8.0),
                      NamedSharding(mesh, P("dp")))
total = jax.jit(shard_map(lambda v: jax.lax.psum(v.sum(), "dp"),
                          mesh=mesh, in_specs=P("dp"), out_specs=P()))(
    vals)
assert float(total) == 28.0, float(total)
print(f"proc {sys.argv[3]} OK loss={float(out):.4f}", flush=True)
"""


def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
        assert "OK loss=" in out
    # both processes computed the same replicated loss
    losses = [o.split("loss=")[1].strip() for _, o, _ in outs]
    assert losses[0] == losses[1]


_BIT_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl_tpu.parallel import (build_bit_sharded_format, shard_bit_format,
                              pad_bit_nodes, bit_sharded_spmm)

devices = np.array(jax.devices()).reshape(-1)
assert len(devices) == 8
mesh = Mesh(devices, ("data",))

rng = np.random.default_rng(0)
n, e, f = 300, 4000, 4
r0 = rng.integers(0, n, e // 2)
c0 = rng.integers(0, n, e // 2)
row = np.r_[r0, c0]; col = np.r_[c0, r0]
fmt = build_bit_sharded_format(row, col, n, 8, symmetric=True)
fmt = shard_bit_format(fmt, mesh)
x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
xp = jax.device_put(pad_bit_nodes(fmt, x), NamedSharding(mesh, P("data")))

out = jax.jit(lambda fmt, xp: bit_sharded_spmm(fmt, xp, mesh, "data"))(
    fmt, xp)
dense = np.zeros((n, n), np.float32)
np.add.at(dense, (col, row), 1.0)
ref_full = np.zeros((fmt.num_parts * fmt.npp, f), np.float32)
ref_full[:n] = dense @ np.asarray(x)
# the global array spans processes: check the LOCAL shards only
err = 0.0
for shard in out.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(shard.data)
    want = ref_full[lo:lo + got.shape[0]]
    err = max(err, float(np.abs(got - want).max()
                         / (np.abs(ref_full).max() + 1e-9)))
assert err < 5e-2, err
print(f"proc {sys.argv[3]} OK err={err:.5f}", flush=True)
"""


def _run_two_process(tmp_path, name, worker_src, ok_marker):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / name
    worker.write_text(worker_src)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
        assert ok_marker in out
    return outs


def test_two_process_bit_sharded(tmp_path):
    """Mesh-sharded bitmask SpMM across a real process boundary: the
    per-device Pallas kernel (interpret on CPU) + all_gather compose on
    a 2-process global mesh."""
    _run_two_process(tmp_path, "bit_worker.py", _BIT_WORKER, "OK err=")


_HETERO_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp
from jax.sharding import Mesh

import dgl_tpu
from dgl_tpu.parallel.hetero_mesh import shard_hetero_graph

devices = np.array(jax.devices()).reshape(-1)
assert len(devices) == 8
mesh = Mesh(devices, ("data",))
P_ = 8

rng = np.random.default_rng(0)
nu, ni, e = 160, 96, 1200
g = dgl_tpu.heterograph({
    ("user", "follows", "user"): (rng.integers(0, nu, e),
                                  rng.integers(0, nu, e)),
    ("user", "rates", "item"): (rng.integers(0, nu, e),
                                rng.integers(0, ni, e)),
}, num_nodes_dict={"user": nu, "item": ni})
parts = {nt: np.minimum(np.arange(g.num_nodes(nt)) * P_
                        // g.num_nodes(nt), P_ - 1) for nt in g.ntypes}
hmg = shard_hetero_graph(g, mesh, partitions=parts)
xu = hmg.shard_node_array(
    rng.normal(size=(nu, 6)).astype(np.float32), "user")

# multiprocess discipline: global arrays cannot ride as jit CLOSURE
# constants (non-addressable) — the per-etype HaloUnits are pytrees,
# so pass them as ARGUMENTS (same rule as graphs-through-the-tunnel)
u_follows = hmg._units[hmg.get_etype_id("follows")]
u_rates = hmg._units[hmg.get_etype_id("rates")]
w = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32) * 0.3)


@jax.jit
def step(u_f, u_r, xu, w):
    def loss_fn(w):
        hu = u_f.halo_gspmm("copy_lhs", "sum", xu @ w, None)
        hi = u_r.halo_gspmm("copy_lhs", "sum", xu @ w, None)
        return (hu ** 2).mean() + (hi ** 2).mean()
    return jax.value_and_grad(loss_fn)(w)


l, gw = step(u_follows, u_rates, xu, w)
l = float(l)
assert np.isfinite(l) and np.isfinite(float(gw[0, 0]))
print(f"proc {sys.argv[3]} OK hetero loss={l:.5f}", flush=True)
"""


def test_two_process_hetero_mesh(tmp_path):
    """Hetero mesh plane (per-etype bipartite halo planes) across a
    real 2-process global mesh: R-GCN fwd+bwd (VERDICT r4 #4)."""
    outs = _run_two_process(tmp_path, "hetero_worker.py", _HETERO_WORKER,
                            "OK hetero loss=")
    losses = [o.split("loss=")[1].strip() for _, o, _ in outs]
    assert losses[0] == losses[1]


_MB_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl_tpu.parallel.mesh_minibatch import (
    build_mesh_csc_edges, mesh_shard_rows, sample_frontier,
    gather_frontier, frontier_sizes, block_mean, block_gat,
    sample_seed_edges, edge_minibatch_seeds)

devices = np.array(jax.devices()).reshape(-1)
assert len(devices) == 8
mesh = Mesh(devices, ("data",))
P_ = 8

rng = np.random.default_rng(0)
N, E, F = 512, 4096, 8
row = rng.integers(0, N, E).astype(np.int32)
col = rng.integers(0, N, E).astype(np.int32)
mcsc, perm = build_mesh_csc_edges(row, col, N, mesh)
xs = mesh_shard_rows(rng.normal(size=(N, F)).astype(np.float32), perm,
                     mcsc, mesh)
S, FANOUTS = 4, [3, 2]
sizes = frontier_sizes(S, FANOUTS)
seeds = jax.device_put(
    jnp.asarray(rng.integers(0, N, (P_, S)), jnp.int32),
    NamedSharding(mesh, P("data")))
key = jax.random.PRNGKey(0)
ids, masks = sample_frontier(mcsc, seeds, FANOUTS, key, mesh)
feats = gather_frontier(xs, ids, mcsc, mesh)
ws = {"w1": jnp.asarray(rng.normal(size=(F, 4)).astype(np.float32)),
      "al": jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32)),
      "ar": jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32)),
      "w2": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}


@jax.jit
def loss(ws, feats, masks):
    # inner layer: block_gat attention (H=2, D=2); outer: mean reduce
    ft = (feats @ ws["w1"]).reshape(feats.shape[0], sizes[-1], 2, 2)
    el = (ft * ws["al"]).sum(-1)
    er = (ft * ws["ar"]).sum(-1)
    h = block_gat(ft, el, er, masks[1], sizes[1], FANOUTS[1])
    h = jax.nn.relu(h.reshape(h.shape[0], sizes[1], 4))
    dstv, mean = block_mean(h, masks[0], sizes[0], FANOUTS[0])
    h = (dstv + mean) @ ws["w2"]
    return (h ** 2).mean()


l, gw = jax.value_and_grad(loss)(ws, feats, masks)
l = float(l)
assert np.isfinite(l) and np.isfinite(float(gw["w1"][0, 0]))

# edge-prediction path: seed edges + exclusion across processes
psrc, pdst = sample_seed_edges(mcsc, S, key, mesh)
excl = (jnp.concatenate([psrc, pdst], 1),
        jnp.concatenate([pdst, psrc], 1))
eseeds = edge_minibatch_seeds(psrc, pdst, jax.device_put(
    jnp.asarray(rng.integers(0, N, (P_, S, 2)), jnp.int32),
    NamedSharding(mesh, P("data"))))
ids2, masks2 = sample_frontier(mcsc, eseeds, FANOUTS, key, mesh,
                               exclude=excl)
s2 = float(sum(m.sum() for m in masks2))
assert np.isfinite(s2) and s2 > 0
print(f"proc {sys.argv[3]} OK minibatch loss={l:.5f}", flush=True)
"""


def test_two_process_mesh_minibatch(tmp_path):
    """Sampled-minibatch plane (owner-routed sampling + feature pull +
    link-prediction exclusion) across a real 2-process global mesh
    (VERDICT r4 #4)."""
    outs = _run_two_process(tmp_path, "mb_worker.py", _MB_WORKER,
                            "OK minibatch loss=")
    losses = [o.split("loss=")[1].strip() for _, o, _ in outs]
    assert losses[0] == losses[1]
