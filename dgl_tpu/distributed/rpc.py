"""RPC plane for dgl_tpu.distributed.

Reference: ``python/dgl/distributed/rpc.py:362-947`` (Request/Response
registry, pickled metadata + zero-copy tensor frames) riding the C++
socket communicator (``src/rpc/network/socket_communicator.cc``).

This build keeps the same two-level design: a native TCP core
(``dgl_tpu/csrc/rpc.cpp`` — per-peer async send queues, per-connection
reader threads, one blocking recv queue) and a Python layer that
(de)serializes ``Request``/``Response`` objects with pickle protocol 5
out-of-band buffers, so numpy payloads are reconstructed zero-copy from
the received frame.

Identity scheme: servers are ranks ``0..num_servers-1`` (line order in
``ip_config``); client *c* handshakes as rank ``num_servers + c``.

Security: frames are pickle — arbitrary code runs on deserialize.  The
native handshake therefore requires a shared uint64 session token
(``DGL_TPU_RPC_TOKEN``, distributed by the launcher): connections that do
not present it are dropped before any frame is read.  This gates
connections on a trusted network; it is NOT cryptographic transport
security — never expose the RPC plane on untrusted networks.
"""
from __future__ import annotations

import ctypes
import os
import pickle
import socket
import struct
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# native library
_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, os.pardir, "csrc", "rpc.cpp")
_SO = os.path.join(_HERE, os.pardir, "csrc", "librpctpu.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def rpc_token() -> int:
    """The shared session token (uint64) from ``DGL_TPU_RPC_TOKEN``.
    0 when unset (single-machine/test default: receiver and senders then
    both present 0, so local flows still pair up)."""
    raw = os.environ.get("DGL_TPU_RPC_TOKEN", "0")
    try:
        return int(raw, 0) & 0xFFFFFFFFFFFFFFFF
    except ValueError:
        # non-numeric secrets allowed: hash to a u64
        import hashlib
        return int.from_bytes(
            hashlib.sha256(raw.encode()).digest()[:8], "little")


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        from ..csrc import build_so
        if not build_so([_SRC], _SO,
                        ["-O3", "-shared", "-fPIC", "-pthread"],
                        timeout=180):
            raise RuntimeError("failed to build RPC native core")
        lib = ctypes.CDLL(_SO)
        lib.rpc_receiver_create.restype = ctypes.c_void_p
        lib.rpc_receiver_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_uint64]
        lib.rpc_receiver_port.restype = ctypes.c_int
        lib.rpc_receiver_port.argtypes = [ctypes.c_void_p]
        lib.rpc_receiver_num_connected.restype = ctypes.c_int
        lib.rpc_receiver_num_connected.argtypes = [ctypes.c_void_p]
        lib.rpc_receiver_recv.restype = ctypes.c_int64
        lib.rpc_receiver_recv.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.rpc_receiver_destroy.argtypes = [ctypes.c_void_p]
        lib.rpc_sender_create.restype = ctypes.c_void_p
        lib.rpc_sender_create.argtypes = [ctypes.c_int]
        lib.rpc_sender_connect.restype = ctypes.c_int
        lib.rpc_sender_connect.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_uint64]
        lib.rpc_sender_send.restype = ctypes.c_int
        lib.rpc_sender_send.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_char_p, ctypes.c_int64]
        lib.rpc_sender_alive.restype = ctypes.c_int
        lib.rpc_sender_alive.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rpc_sender_disconnect.argtypes = [ctypes.c_void_p,
                                              ctypes.c_int]
        lib.rpc_sender_destroy.argtypes = [ctypes.c_void_p]
        lib.rpc_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
        _lib = lib
        return lib


class Receiver:
    """Listens on (ip, port); ``recv`` pops the next framed message."""

    def __init__(self, ip: str = "127.0.0.1", port: int = 0,
                 backlog: int = 512, token: Optional[int] = None):
        lib = _load_lib()
        self._lib = lib
        tok = rpc_token() if token is None else token
        self._h = lib.rpc_receiver_create(ip.encode(), port, backlog, tok)
        if not self._h:
            raise OSError(f"cannot listen on {ip}:{port}")
        self.port = lib.rpc_receiver_port(self._h)
        self.ip = ip

    def recv(self, timeout_ms: int = -1) -> Optional[Tuple[int, bytes]]:
        out = ctypes.POINTER(ctypes.c_char)()
        sender = ctypes.c_int()
        n = self._lib.rpc_receiver_recv(self._h, ctypes.byref(out),
                                        ctypes.byref(sender), timeout_ms)
        if n < 0:
            return None
        data = ctypes.string_at(out, n)
        self._lib.rpc_free(out)
        return sender.value, data

    def num_connected(self) -> int:
        return self._lib.rpc_receiver_num_connected(self._h)

    def close(self):
        if self._h:
            self._lib.rpc_receiver_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Sender:
    """Async sender: per-peer queue + writer thread in the native core."""

    def __init__(self, my_id: int):
        self._lib = _load_lib()
        self._h = self._lib.rpc_sender_create(my_id)
        self.my_id = my_id

    def connect(self, peer_id: int, ip: str, port: int,
                timeout_ms: int = 30000,
                token: Optional[int] = None) -> bool:
        tok = rpc_token() if token is None else token
        return bool(self._lib.rpc_sender_connect(
            self._h, peer_id, ip.encode(), port, timeout_ms, tok))

    def send(self, peer_id: int, data: bytes):
        if not self._lib.rpc_sender_send(self._h, peer_id, data, len(data)):
            raise RuntimeError(f"send to peer {peer_id} failed (not "
                               "connected, or peer died?)")

    def alive(self, peer_id: int) -> bool:
        """False once the peer's socket has failed (failure detection)."""
        return bool(self._lib.rpc_sender_alive(self._h, peer_id))

    def disconnect(self, peer_id: int):
        """Tear down a (possibly dead) peer so ``connect`` can rebuild."""
        self._lib.rpc_sender_disconnect(self._h, peer_id)

    def reconnect(self, peer_id: int, ip: str, port: int,
                  attempts: int = 5, backoff_s: float = 0.5,
                  timeout_ms: int = 10000) -> bool:
        """Reconnect with exponential backoff after a detected failure.

        Delivery is at-most-once across the failure: messages enqueued
        around the drop may be lost — resend unacked requests after this
        returns True (``send_request``/``recv_response`` timeouts are the
        ack layer)."""
        import time as _time
        self.disconnect(peer_id)
        for i in range(attempts):
            if self.connect(peer_id, ip, port, timeout_ms=timeout_ms):
                return True
            _time.sleep(backoff_s * (2 ** i))
        return False

    def close(self):
        if self._h:
            self._lib.rpc_sender_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# serialization: pickle-5 with out-of-band buffers.
# frame = [u32 n_bufs][u64 pickle_len][u64 buf_len]*n  ||  pickle || bufs...

def serialize(obj) -> bytes:
    bufs: List[pickle.PickleBuffer] = []
    payload = pickle.dumps(obj, protocol=5, buffer_callback=bufs.append)
    raws = [b.raw() for b in bufs]
    head = struct.pack("<I", len(raws)) + struct.pack("<Q", len(payload))
    head += b"".join(struct.pack("<Q", r.nbytes) for r in raws)
    return b"".join([head, payload] + [bytes(r) for r in raws])


def deserialize(frame: bytes):
    from ..utils import DGLError
    mv = memoryview(frame)
    total = len(mv)
    if total < 12:
        raise DGLError(f"truncated RPC frame: {total} bytes < 12-byte header")
    (n_bufs,) = struct.unpack_from("<I", mv, 0)
    off = 4
    (plen,) = struct.unpack_from("<Q", mv, off)
    off += 8
    if off + 8 * n_bufs > total:
        raise DGLError(
            f"corrupt RPC frame: {n_bufs} buffer lengths do not fit in "
            f"{total} bytes")
    lens = []
    for _ in range(n_bufs):
        (ln,) = struct.unpack_from("<Q", mv, off)
        off += 8
        lens.append(ln)
    if off + plen + sum(lens) != total:
        raise DGLError(
            f"corrupt RPC frame: declared {off + plen + sum(lens)} bytes, "
            f"got {total}")
    payload = mv[off:off + plen]
    off += plen
    bufs = []
    for ln in lens:
        bufs.append(mv[off:off + ln])
        off += ln
    return pickle.loads(payload, buffers=bufs)


# ---------------------------------------------------------------------------
# service registry (reference distributed/rpc.py:641 register_service)

SERVICE_REGISTRY: Dict[int, tuple] = {}


class Request:
    """Subclass + implement ``process_request(server_state) -> Response or
    None``.  Set ``service_id`` via ``register_service``."""

    service_id: int = -1

    def process_request(self, server_state):
        raise NotImplementedError


class Response:
    service_id: int = -1


def register_service(service_id: int, req_cls, res_cls=None):
    SERVICE_REGISTRY[service_id] = (req_cls, res_cls)
    req_cls.service_id = service_id
    if res_cls is not None:
        res_cls.service_id = service_id


# reserved service ids (reference uses the same pattern of small ints)
CLIENT_REGISTER = 1
SHUTDOWN = 2
BARRIER = 3
KVSTORE_PULL = 11
KVSTORE_PUSH = 12
KVSTORE_INIT = 13
KVSTORE_META = 14
SAMPLING = 21
EDGE_SAMPLING = 22
IN_SUBGRAPH = 23
NODE_SPLIT = 24


class RPCContext:
    """Per-process RPC state: my rank, a receiver, senders to peers."""

    def __init__(self):
        self.role = None           # "server" | "client"
        self.rank = -1             # server_id or client_id
        self.num_servers = 0
        self.num_clients = 0
        self.receiver: Optional[Receiver] = None
        self.sender: Optional[Sender] = None
        self.server_addrs: List[Tuple[str, int]] = []
        self.seq = 0
        self.machine_id = 0
        self._response_cache: Dict[int, object] = {}

    # -- wire helpers ------------------------------------------------------
    def _send_obj(self, peer_rank: int, obj):
        self.sender.send(peer_rank, serialize(obj))

    def _recv_obj(self, timeout_ms: int = -1):
        got = self.receiver.recv(timeout_ms)
        if got is None:
            return None, None
        sender, frame = got
        return sender, deserialize(frame)


_CTX = RPCContext()

# One request/response cycle at a time: the client receiver has a single
# inbound queue, so two threads interleaving calls could steal each
# other's responses (the prefetch thread + the training thread both do
# RPC).  The lock is reentrant so remote_call can build on send_request.
_CALL_LOCK = threading.RLock()


def get_ctx() -> RPCContext:
    return _CTX


def reset():
    global _CTX
    if _CTX.receiver is not None:
        _CTX.receiver.close()
    if _CTX.sender is not None:
        _CTX.sender.close()
    _CTX = RPCContext()


def read_ip_config(ip_config: str) -> List[Tuple[str, int]]:
    """Each line: ``<ip> <port>`` — one server per line (reference format,
    ``tests/distributed/utils.py:11 generate_ip_config``)."""
    out = []
    with open(ip_config) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            out.append((parts[0], int(parts[1])))
    return out


# ---------------------------------------------------------------------------
# client bootstrap

def connect_to_servers(ip_config: str, client_id: int,
                       num_clients: int) -> RPCContext:
    """Create the client context: receiver on an ephemeral port, connect to
    every server, register the back-channel."""
    ctx = get_ctx()
    ctx.role = "client"
    ctx.rank = client_id
    ctx.server_addrs = read_ip_config(ip_config)
    ctx.num_servers = len(ctx.server_addrs)
    ctx.num_clients = num_clients
    ctx.receiver = Receiver("127.0.0.1", 0)
    ctx.sender = Sender(ctx.num_servers + client_id)
    for sid, (ip, port) in enumerate(ctx.server_addrs):
        if not ctx.sender.connect(sid, ip, port):
            raise ConnectionError(f"cannot reach server {sid} @ {ip}:{port}")
        ctx._send_obj(sid, (CLIENT_REGISTER, client_id, 0,
                            (_my_ip(ip), ctx.receiver.port)))
    # wait for each server to dial back and ack
    acks = 0
    while acks < ctx.num_servers:
        _, msg = ctx._recv_obj(timeout_ms=60000)
        if msg is None:
            raise TimeoutError("server register-ack timeout")
        assert msg[0] == CLIENT_REGISTER
        acks += 1
    return ctx


def _my_ip(server_ip: str) -> str:
    """Best-effort local ip as seen by the server (loopback in tests)."""
    if server_ip.startswith("127.") or server_ip == "localhost":
        return "127.0.0.1"
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect((server_ip, 1))
        return s.getsockname()[0]
    finally:
        s.close()


def send_request(server_id: int, req: Request):
    """Fire a request at a server (async; response read separately)."""
    ctx = get_ctx()
    with _CALL_LOCK:
        ctx.seq += 1
        seq = ctx.seq
        ctx._send_obj(server_id, (req.service_id, ctx.rank, seq, req))
    return seq


def recv_response(timeout_ms: int = -1) -> Response:
    ctx = get_ctx()
    _, msg = ctx._recv_obj(timeout_ms)
    if msg is None:
        raise TimeoutError("rpc response timeout")
    return msg[3]


def remote_call(server_id: int, req: Request, timeout_ms: int = -1):
    with _CALL_LOCK:
        send_request(server_id, req)
        return recv_response(timeout_ms)


def remote_call_multi(server_ids: List[int], reqs: List[Request],
                      timeout_ms: int = -1) -> List:
    """Send to many servers, gather all responses (order = server_ids)."""
    ctx = get_ctx()
    with _CALL_LOCK:
        seqs = {}
        for sid, req in zip(server_ids, reqs):
            seqs[send_request(sid, req)] = sid
        out = {}
        for _ in server_ids:
            _, msg = ctx._recv_obj(timeout_ms)
            if msg is None:
                raise TimeoutError("rpc response timeout")
            service, rank, seq, res = msg
            out[seqs[seq]] = res
    return [out[sid] for sid in server_ids]


def barrier():
    """Global client barrier (all clients must call).

    Sent to EVERY server: per-connection FIFO then guarantees each
    server processed this client's earlier async pushes before its
    barrier arrives, and each server acks only once all clients arrived
    — so after barrier() returns, every client's pushes to every server
    are visible (a single-server barrier would not fence pushes sent to
    the other servers)."""
    ctx = get_ctx()
    with _CALL_LOCK:
        for sid in range(ctx.num_servers):
            ctx.seq += 1
            ctx._send_obj(sid, (BARRIER, ctx.rank, ctx.seq, None))
        for _ in range(ctx.num_servers):
            _, msg = ctx._recv_obj(-1)
            assert msg is not None and msg[0] == BARRIER


def shutdown_servers():
    ctx = get_ctx()
    for sid in range(ctx.num_servers):
        ctx.seq += 1
        ctx._send_obj(sid, (SHUTDOWN, ctx.rank, ctx.seq, None))


def finalize_client():
    reset()


# ---------------------------------------------------------------------------
# server loop

class ServerState:
    """Mutable state the serve loop hands to ``process_request``:
    kv store data, the local graph partition, the partition book."""

    def __init__(self):
        self.kv = None              # KVServer
        self.graph = None           # local partition Graph
        self.partition_book = None
        self.meta = {}
        self.server_id = -1
        self.num_clients = 0
        self._barrier_waiting: List[int] = []


def start_server(server_id: int, ip_config: str, num_clients: int,
                 server_state: ServerState, max_idle_ms: int = -1):
    """Serve loop (reference ``rpc_server.py start_server``): accept client
    registrations, dispatch requests, stop on SHUTDOWN."""
    ctx = get_ctx()
    ctx.role = "server"
    ctx.rank = server_id
    ctx.server_addrs = read_ip_config(ip_config)
    ctx.num_servers = len(ctx.server_addrs)
    ctx.num_clients = num_clients
    ip, port = ctx.server_addrs[server_id]
    ctx.receiver = Receiver(ip, port)
    ctx.sender = Sender(server_id)
    server_state.server_id = server_id
    server_state.num_clients = num_clients

    registered = set()
    while True:
        got = ctx.receiver.recv(max_idle_ms)
        if got is None:
            break  # idle timeout
        sender_rank, frame = got
        service, client_id, seq, payload = deserialize(frame)
        if service == CLIENT_REGISTER:
            cip, cport = payload
            peer = ctx.num_servers + client_id
            ctx.sender.connect(peer, cip, cport)
            registered.add(client_id)
            ctx._send_obj(peer, (CLIENT_REGISTER, server_id, seq, None))
        elif service == SHUTDOWN:
            break
        elif service == BARRIER:
            server_state._barrier_waiting.append((client_id, seq))
            if len(server_state._barrier_waiting) == num_clients:
                for cid, cseq in server_state._barrier_waiting:
                    ctx._send_obj(ctx.num_servers + cid,
                                  (BARRIER, server_id, cseq, None))
                server_state._barrier_waiting = []
        else:
            req = payload
            res = req.process_request(server_state)
            if res is not None:
                ctx._send_obj(ctx.num_servers + client_id,
                              (service, server_id, seq, res))
    reset()
