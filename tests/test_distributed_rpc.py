"""Distributed stack tests: native RPC, KVStore, remote sampling.

Mirrors the reference's single-machine "distributed" strategy
(``tests/distributed/test_distributed_sampling.py:32-74``): spawn real
server processes on localhost ports with a generated ip_config and a
shared tmpdir partition, then drive them from a client.
"""
import multiprocessing as mp
import os
import socket
import threading
import time

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import dgl_tpu as dgl
from dgl_tpu.distributed import rpc as dtrpc


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


# ---------------------------------------------------------------------------
# layer 1: native sender/receiver + serialization


def test_rpc_send_recv_roundtrip():
    recv = dtrpc.Receiver("127.0.0.1", 0)
    send = dtrpc.Sender(my_id=7)
    assert send.connect(0, "127.0.0.1", recv.port, timeout_ms=5000)
    payloads = [b"hello", b"x" * (1 << 20), b""]
    for p in payloads:
        send.send(0, p)
    got = [recv.recv(timeout_ms=10000) for _ in payloads]
    assert all(g is not None for g in got)
    assert [g[1] for g in got] == payloads       # per-connection FIFO
    assert all(g[0] == 7 for g in got)
    assert recv.recv(timeout_ms=50) is None      # timeout path
    send.close()
    recv.close()


def test_serialize_numpy_roundtrip():
    obj = {"a": np.arange(100, dtype=np.int64),
           "b": np.random.default_rng(0).normal(size=(8, 3)).astype(
               np.float32),
           "meta": ("x", 3, [1.5])}
    frame = dtrpc.serialize(obj)
    out = dtrpc.deserialize(frame)
    np.testing.assert_array_equal(out["a"], obj["a"])
    np.testing.assert_array_equal(out["b"], obj["b"])
    assert out["meta"] == obj["meta"]


def test_multithread_rpc_echo():
    """A receiver thread echoing back through a reverse channel."""
    r_srv = dtrpc.Receiver("127.0.0.1", 0)
    r_cli = dtrpc.Receiver("127.0.0.1", 0)

    def server():
        s = dtrpc.Sender(my_id=0)
        assert s.connect(1, "127.0.0.1", r_cli.port, 5000)
        for _ in range(3):
            sender, data = r_srv.recv(10000)
            s.send(1, data.upper())
        s.close()

    t = threading.Thread(target=server)
    t.start()
    c = dtrpc.Sender(my_id=1)
    assert c.connect(0, "127.0.0.1", r_srv.port, 5000)
    for msg in [b"ab", b"cd", b"ef"]:
        c.send(0, msg)
        _, out = r_cli.recv(10000)
        assert out == msg.upper()
    t.join()
    c.close()
    r_srv.close()
    r_cli.close()


# ---------------------------------------------------------------------------
# layer 2: full server/client deployment on localhost


def _run_server(server_id, ip_config, num_clients, part_config):
    os.environ["JAX_PLATFORMS"] = "cpu"
    from dgl_tpu.distributed import DistGraphServer
    server = DistGraphServer(server_id, ip_config, num_clients, part_config)
    server.start(max_idle_ms=120000)


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    """Partition a random graph into 2 parts and start 2 server procs."""
    tmp = tmp_path_factory.mktemp("dist")
    rng = np.random.default_rng(3)
    n, e = 200, 1200
    row = rng.integers(0, n, e).astype(np.int64)
    col = rng.integers(0, n, e).astype(np.int64)
    g = dgl.graph((row, col), num_nodes=n)
    g.ndata["feat"] = rng.normal(size=(n, 5)).astype(np.float32)
    g.edata["w"] = rng.random(e).astype(np.float32)
    order, e_order = dgl.distributed.partition_graph(
        g, "testg", 2, str(tmp), part_method="metis", return_mapping=True)
    order = np.asarray(order)           # new nid -> old nid
    e_order = np.asarray(e_order)       # new eid -> old eid
    part_config = str(tmp / "testg.json")

    ip_config = str(tmp / "ip_config.txt")
    with open(ip_config, "w") as f:
        for _ in range(2):
            f.write(f"127.0.0.1 {_free_port()}\n")

    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_run_server,
                         args=(sid, ip_config, 1, part_config))
             for sid in range(2)]
    for p in procs:
        p.start()
    dgl.distributed.initialize(ip_config, client_id=0, num_clients=1)
    dist_g = dgl.distributed.DistGraph("testg", part_config)

    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)           # old nid -> new nid
    yield dict(g=g, dist_g=dist_g, order=order, e_order=e_order, inv=inv,
               part_config=part_config)

    dgl.distributed.exit_client(shutdown=True)
    for p in procs:
        p.join(timeout=30)
        if p.is_alive():
            p.terminate()


def test_dist_feature_pull(cluster):
    g, dist_g = cluster["g"], cluster["dist_g"]
    order = cluster["order"]
    ids = np.array([0, 5, 17, 150, 199, 63])
    got = np.asarray(dist_g.ndata["feat"][ids])
    want = np.asarray(g.ndata["feat"])[order[ids]]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # edge feature pull through kvstore
    kv = dist_g._kv
    eids = np.array([0, 3, 700, 1199])
    got_w = kv.pull("w", eids).ravel()
    want_w = np.asarray(g.edata["w"])[cluster["e_order"][eids]]
    np.testing.assert_allclose(got_w, want_w, rtol=1e-6)


def test_dist_push_pull_add(cluster):
    dist_g = cluster["dist_g"]
    kv = dist_g._kv
    kv.init_data("acc", (dist_g.num_nodes(), 2), np.float32)
    ids = np.array([1, 7, 100, 198])
    kv.push("acc", ids, np.ones((4, 2), np.float32))
    kv.push("acc", ids, np.ones((4, 2), np.float32))
    got = kv.pull("acc", ids)          # same-connection FIFO fences pushes
    np.testing.assert_allclose(got, 2.0)
    other = kv.pull("acc", np.array([0, 50]))
    np.testing.assert_allclose(other, 0.0)


def test_dist_sample_neighbors(cluster):
    g, dist_g = cluster["g"], cluster["dist_g"]
    inv, e_order = cluster["inv"], cluster["e_order"]
    row, col = (np.asarray(x) for x in g.unit().coo())
    new_row, new_col = inv[row], inv[col]   # reshuffled global COO (old eid)
    # edge set keyed by new eid
    old2new_e = np.empty(len(e_order), np.int64)
    old2new_e[e_order] = np.arange(len(e_order))
    seeds = np.array([2, 9, 77, 120, 199])
    sub = dgl.distributed.sample_neighbors(dist_g, seeds, 3)
    srow, scol = (np.asarray(x) for x in sub.unit().coo())
    from dgl_tpu.graph.graph import EID
    seid = np.asarray(sub.edata[EID])
    assert len(srow) > 0
    for s, d, eid in zip(srow, scol, seid):
        old_eid = e_order[eid]
        assert new_row[old_eid] == s and new_col[old_eid] == d
        assert d in seeds
    # fanout respected
    for s in seeds:
        assert (scol == s).sum() <= 3


def test_dist_find_edges(cluster):
    g = cluster["g"]
    inv, e_order = cluster["inv"], cluster["e_order"]
    row, col = (np.asarray(x) for x in g.unit().coo())
    eids = np.array([0, 10, 600, 1100])
    src, dst = dgl.distributed.find_edges(cluster["dist_g"], eids)
    np.testing.assert_array_equal(src, inv[row[e_order[eids]]])
    np.testing.assert_array_equal(dst, inv[col[e_order[eids]]])


def test_dist_in_subgraph(cluster):
    dist_g = cluster["dist_g"]
    inv, e_order = cluster["inv"], cluster["e_order"]
    g = cluster["g"]
    row, col = (np.asarray(x) for x in g.unit().coo())
    new_col = inv[col]
    seeds = np.array([4, 44, 190])
    sub = dgl.distributed.in_subgraph(dist_g, seeds)
    scol = np.asarray(sub.unit().coo()[1])
    # every in-edge of the seeds must be present
    expected = sum(int((new_col == s).sum()) for s in seeds)
    assert len(scol) == expected


def test_dist_node_dataloader(cluster):
    dist_g = cluster["dist_g"]
    from dgl_tpu.dataloading import NeighborSampler
    from dgl_tpu.graph.graph import NID
    sampler = NeighborSampler([2, 2])
    loader = dgl.distributed.DistNodeDataLoader(
        dist_g, np.arange(40), sampler, batch_size=16, shuffle=True)
    n_batches = 0
    for input_nodes, output_nodes, blocks in loader:
        n_batches += 1
        assert len(blocks) == 2
        assert len(output_nodes) <= 16
        # dst of last block == seeds
        np.testing.assert_array_equal(
            np.asarray(blocks[-1].dstdata[NID]), output_nodes)
        feats = dist_g.ndata["feat"][input_nodes]
        assert feats.shape == (len(input_nodes), 5)
    assert n_batches == 3


def test_dist_barrier_and_tensor(cluster):
    dist_g = cluster["dist_g"]
    from dgl_tpu.distributed import KVDistTensor
    t = KVDistTensor(dist_g._kv, "newt", shape=(dist_g.num_nodes(), 3),
                     dtype=np.float32)
    assert t.shape == (200, 3)
    t[np.array([5, 6])] = np.full((2, 3), 9.0, np.float32)
    dist_g.barrier()
    np.testing.assert_allclose(np.asarray(t[np.array([5, 6])]), 9.0)


# ---------------------------------------------------------------------------
# launcher


def test_launch_build_commands(tmp_path):
    ipc = tmp_path / "ip_config.txt"
    ipc.write_text("10.0.0.1 30050\n10.0.0.2 30050\n")
    from dgl_tpu.distributed.launch import build_commands
    cmds = build_commands(str(ipc), "/data/g.json", "/ws",
                          "python train.py", num_trainers=2)
    assert len(cmds) == 2 + 4
    ips = [c[0] for c in cmds]
    assert ips[:2] == ["10.0.0.1", "10.0.0.2"]
    assert "DGL_TPU_ROLE=server" in cmds[0][1]
    assert "DGL_TPU_SERVER_ID=1" in cmds[1][1]
    client_cmds = cmds[2:]
    seen = set()
    for ip, c in client_cmds:
        assert "DGL_TPU_ROLE=client" in c and "python train.py" in c
        cid = int(c.split("DGL_TPU_CLIENT_ID=")[1].split()[0])
        seen.add(cid)
    assert seen == {0, 1, 2, 3}


def _client_worker(cid, ipc, pc, n, q):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import dgl_tpu as dgl
    import numpy as np
    dgl.distributed.initialize(ipc, client_id=cid, num_clients=2)
    dist_g = dgl.distributed.DistGraph("testg2", pc)
    kv = dist_g._kv
    kv.init_data("cnt", (n, 1), np.float32)
    ids = np.arange(cid, n, 2)
    kv.push("cnt", ids, np.ones((len(ids), 1), np.float32))
    dist_g.barrier()            # all-client fence: both pushes visible
    got = kv.pull("cnt", np.arange(n))
    q.put((cid, got.sum()))
    dist_g.barrier()
    if cid == 0:
        dgl.distributed.exit_client(shutdown=True)
    else:
        dgl.distributed.exit_client(shutdown=False)


def test_two_clients_barrier(tmp_path):
    """Two trainer processes push disjoint rows; the all-client barrier
    fences both before pulls (reference tests/distributed multi-client
    strategy)."""
    rng = np.random.default_rng(5)
    n, e = 80, 400
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    g.ndata["feat"] = rng.normal(size=(n, 2)).astype(np.float32)
    dgl.distributed.partition_graph(g, "testg2", 2, str(tmp_path))
    pc = str(tmp_path / "testg2.json")
    ipc = str(tmp_path / "ip.txt")
    with open(ipc, "w") as f:
        f.write(f"127.0.0.1 {_free_port()}\n127.0.0.1 {_free_port()}\n")
    ctx = mp.get_context("spawn")
    servers = [ctx.Process(target=_run_server, args=(s, ipc, 2, pc))
               for s in range(2)]
    for p in servers:
        p.start()
    q = ctx.Queue()
    clients = [ctx.Process(target=_client_worker, args=(c, ipc, pc, n, q))
               for c in range(2)]
    for p in clients:
        p.start()
    results = [q.get(timeout=120) for _ in range(2)]
    for cid, total in results:
        assert total == n, (cid, total)   # sees both clients' pushes
    for p in clients + servers:
        p.join(timeout=60)
        assert not p.is_alive()


def test_dist_edge_dataloader(cluster):
    dist_g = cluster["dist_g"]
    from dgl_tpu.dataloading import NeighborSampler
    from dgl_tpu.dataloading.negative_sampler import Uniform
    from dgl_tpu.distributed import DistEdgeDataLoader
    sampler = NeighborSampler([2])
    loader = DistEdgeDataLoader(
        dist_g, np.arange(30), sampler, batch_size=10,
        negative_sampler=Uniform(1))
    n_batches = 0
    for input_nodes, pair_graph, neg_pair_graph, blocks in loader:
        n_batches += 1
        assert pair_graph.num_edges() == 10
        assert neg_pair_graph.num_edges() == 10
        assert len(blocks) == 1
    assert n_batches == 3


def test_sender_failure_detection_and_reconnect():
    """Receiver dies -> sends fail fast (alive=False) -> reconnect to a
    fresh receiver on the same port delivers again (failure recovery:
    reference has no sender-side reconnect; see VERDICT aux table)."""
    import time
    from dgl_tpu.distributed.rpc import Receiver, Sender

    r1 = Receiver("127.0.0.1", 0)
    port = r1.port
    s = Sender(my_id=7)
    assert s.connect(7, "127.0.0.1", port)
    s.send(7, b"hello")
    sid, msg = r1.recv(timeout_ms=5000)
    assert msg == b"hello" and sid == 7

    r1.close()          # peer dies
    # sends eventually fail fast: the writer thread notices on the next
    # actual write (TCP may buffer one or two small sends)
    dead = False
    for _ in range(50):
        try:
            s.send(7, b"x" * 65536)
        except RuntimeError:
            dead = True
            break
        time.sleep(0.05)
    assert dead, "sender never detected the dead peer"
    assert not s.alive(7)

    r2 = Receiver("127.0.0.1", port)   # fresh receiver, same port
    assert s.reconnect(7, "127.0.0.1", port, attempts=8)
    assert s.alive(7)
    s.send(7, b"again")
    sid, msg = r2.recv(timeout_ms=5000)
    assert msg == b"again" and sid == 7
    r2.close()
    s.close()


def test_dist_optim_kv_sparse_adam(cluster):
    """KV-mode distributed SparseAdam (reference
    ``distributed/optim/pytorch/sparse_optim.py:579``): state lives in
    the kvstore as name+_mean/_power/_step; touched rows only."""
    from dgl_tpu.distributed import KVDistTensor
    from dgl_tpu.distributed.optim import SparseAdam

    dist_g = cluster["dist_g"]
    n = dist_g.num_nodes()
    emb = KVDistTensor(dist_g._kv, "opt_emb", shape=(n, 4),
                       dtype=np.float32,
                       init_func=lambda s, d: np.zeros(s, np.float32))
    opt = SparseAdam([emb], lr=0.1)
    rng = np.random.default_rng(1)
    ids_steps, grads_steps = [], []
    for _ in range(2):
        ids = rng.integers(0, n, 8)
        ids[0] = ids[1]
        ids_steps.append(ids)
        grads_steps.append(rng.normal(size=(8, 4)).astype(np.float32))
        opt.step([(ids_steps[-1], grads_steps[-1])])

    # numpy oracle
    w = np.zeros((n, 4), np.float32)
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    t = np.zeros(n)
    for ids, gr in zip(ids_steps, grads_steps):
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        g = np.zeros((len(uniq), 4), np.float32)
        np.add.at(g, inv, gr)
        g /= cnt[:, None]
        t[uniq] += 1
        m[uniq] = 0.9 * m[uniq] + 0.1 * g
        v[uniq] = 0.999 * v[uniq] + 0.001 * g * g
        mh = m[uniq] / (1 - 0.9 ** t[uniq][:, None])
        vh = v[uniq] / (1 - 0.999 ** t[uniq][:, None])
        w[uniq] -= 0.1 * mh / (np.sqrt(vh) + 1e-8)

    all_ids = np.arange(n)
    got = np.asarray(emb[all_ids])
    np.testing.assert_allclose(got, w, rtol=2e-5, atol=2e-6)
    # optimizer state actually lives in the kvstore
    st = dist_g._kv.pull("opt_emb_step", np.unique(ids_steps[0]))
    assert (st[:, 0] >= 1).all()
