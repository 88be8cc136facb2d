"""papers100M-scale structural gate on the virtual mesh (VERDICT r3 #4).

Builds a papers100M-shaped synthetic graph (>=2M nodes / >=100M edges),
partitions it 8 ways, constructs the halo plane + the halo-TILED Pallas
formats under a per-device HBM budget, prints a per-device memory
audit, and executes ONE fwd+bwd training step over the 8-device mesh
(XLA halo path — the tiled Pallas kernels run interpret-mode off-TPU,
so the kernel-path execution at this scale is the single-chip TPU run
in tools/perf_tiled_papers.py).

This is the structural half of SURVEY §7 GATE #3 (reference
``distributed/partition.py:648`` partitions exactly this graph class);
the measured multi-chip scaling half stays hardware-blocked.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python tools/scale_papers100m.py [N] [E]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def fmt_bytes(b):
    return f"{b / (1 << 30):.2f} GiB" if b >= (1 << 30) \
        else f"{b / (1 << 20):.1f} MiB"


def tree_bytes(x):
    import jax
    return sum(v.size * v.dtype.itemsize
               for v in jax.tree_util.tree_leaves(x)
               if hasattr(v, "size"))


def main(num_nodes=2_400_000, num_edges=100_000_000, budget_gb=12.0):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import dgl_tpu as dgl
    from dgl_tpu.data.synth_papers import papers_like_graph
    from dgl_tpu.parallel import build_halo_sharded_graph, \
        shard_halo_graph
    from dgl_tpu.parallel.halo_ops import HaloUnit
    from dgl_tpu.parallel.halo_pallas import build_halo_fast_format

    P_ = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    print(f"devices: {P_}  graph: {num_nodes} nodes / {num_edges} edges")

    t0 = time.time()
    row, col = papers_like_graph(num_nodes, num_edges)
    t_gen = time.time() - t0
    print(f"generate: {t_gen:.0f}s")

    t0 = time.time()
    g = dgl.graph((row, col), num_nodes=num_nodes)
    hg, perm = build_halo_sharded_graph(
        g, P_, partition=np.minimum(
            np.arange(num_nodes) * P_ // num_nodes, P_ - 1))
    t_plane = time.time() - t0
    stats = hg.comm_stats(feat_dim=16)
    plane_bytes = tree_bytes(hg)
    print(f"halo plane build: {t_plane:.0f}s  exchange={stats['exchange']}"
          f"  halo rows/layer={stats['halo_rows']}"
          f"  wire={fmt_bytes(stats['bytes_wire'])}"
          f" (useful {fmt_bytes(stats['bytes_useful'])},"
          f" all_gather equiv {fmt_bytes(stats['allgather_bytes_equiv'])})")
    print(f"plane arrays total: {fmt_bytes(plane_bytes)}"
          f"  per device: {fmt_bytes(plane_bytes // P_)}")

    t0 = time.time()
    fmt = build_halo_fast_format(hg, kind="tiled")
    t_fmt = time.time() - t0
    fmt_dev = fmt.hbm_bytes_per_device
    print(f"halo-tiled format build: {t_fmt:.0f}s  "
          f"per-device kernel formats: {fmt_bytes(fmt_dev)}")

    feat = 16
    x_bytes = (hg.num_parts * hg.nodes_per_part * feat * 4) // P_
    recv_bytes = hg.h_total * feat * 4
    per_dev_total = plane_bytes // P_ + fmt_dev + x_bytes + recv_bytes
    print(f"per-device audit: plane {fmt_bytes(plane_bytes // P_)} + "
          f"formats {fmt_bytes(fmt_dev)} + features {fmt_bytes(x_bytes)}"
          f" + halo recv {fmt_bytes(recv_bytes)} = "
          f"{fmt_bytes(per_dev_total)}  (budget {budget_gb} GiB/device)")
    assert per_dev_total < budget_gb * (1 << 30), "HBM budget exceeded"

    # one fwd+bwd step over the mesh (XLA halo path)
    hg_dev = shard_halo_graph(hg, mesh)
    unit = HaloUnit(hg_dev, mesh)
    rng = np.random.default_rng(0)
    spec = NamedSharding(mesh, P("data"))
    total_rows = hg.num_parts * hg.nodes_per_part
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(total_rows, feat)).astype(np.float32)), spec)
    w = jnp.asarray(rng.normal(size=(feat, feat),
                               scale=0.2).astype(np.float32))

    @jax.jit
    def step(w, x):
        def loss_fn(w):
            h = unit.halo_gspmm("copy_lhs", "sum", x @ w, None)
            return (h ** 2).mean()
        return jax.value_and_grad(loss_fn)(w)

    t0 = time.time()
    l, gw = step(w, x)
    l = float(l)
    t_step = time.time() - t0
    assert np.isfinite(l) and np.isfinite(float(gw[0, 0]))
    t0 = time.time()
    l2, _ = step(w * 0.5, x)
    float(l2)
    t_steady = time.time() - t0
    print(f"fwd+bwd step over {P_}-device mesh: first {t_step:.1f}s, "
          f"steady {t_steady:.1f}s, loss={l:.4f}")
    print(f"RESULT: {num_nodes} nodes / {num_edges} edges, {P_} parts, "
          f"{fmt_bytes(per_dev_total)}/device, "
          f"build {t_plane + t_fmt:.0f}s, step {t_steady:.1f}s (CPU mesh)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    main(n, e)
