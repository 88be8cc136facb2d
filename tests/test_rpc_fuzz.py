"""Fuzz tests for the RPC framing layer (ROADMAP: "fuzz the RPC framing").

Covers the Python pickle-5 frame codec (serialize/deserialize) against
malformed input, and the native TCP receiver against rogue peers sending
corrupt length prefixes.
"""
import socket
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dgl_tpu.distributed import rpc
from dgl_tpu.utils import DGLError


# ---------------------------------------------------------------------------
# codec round-trip fuzz
# ---------------------------------------------------------------------------

_scalars = st.one_of(
    st.integers(min_value=-2**62, max_value=2**62),
    st.floats(allow_nan=False),
    st.text(max_size=40),
    st.binary(max_size=200),
    st.booleans(),
    st.none(),
)

_arrays = st.builds(
    lambda shape, dt, seed: np.random.default_rng(seed).integers(
        0, 100, shape).astype(dt),
    st.lists(st.integers(0, 7), min_size=0, max_size=3).map(tuple),
    st.sampled_from([np.int32, np.int64, np.float32, np.uint8]),
    st.integers(0, 2**31),
)

_payloads = st.recursive(
    st.one_of(_scalars, _arrays),
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
        st.tuples(children, children),
    ),
    max_leaves=12,
)


def _eq(a, b):
    if isinstance(a, np.ndarray):
        return (isinstance(b, np.ndarray) and a.dtype == b.dtype
                and a.shape == b.shape and np.array_equal(a, b))
    if isinstance(a, (list, tuple)):
        return (type(a) is type(b) and len(a) == len(b)
                and all(_eq(x, y) for x, y in zip(a, b)))
    if isinstance(a, dict):
        return (isinstance(b, dict) and set(a) == set(b)
                and all(_eq(a[k], b[k]) for k in a))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (a != a and b != b)
    return a == b


@settings(max_examples=150, deadline=None)
@given(_payloads)
def test_roundtrip_fuzz(obj):
    frame = rpc.serialize(obj)
    out = rpc.deserialize(frame)
    assert _eq(obj, out)


@settings(max_examples=80, deadline=None)
@given(_payloads, st.data())
def test_truncated_frames_raise_cleanly(obj, data):
    """Any strict prefix of a valid frame must raise DGLError, never
    segfault or return garbage silently."""
    frame = rpc.serialize(obj)
    cut = data.draw(st.integers(0, max(0, len(frame) - 1)))
    with pytest.raises(DGLError):
        rpc.deserialize(frame[:cut])


@settings(max_examples=50, deadline=None)
@given(_payloads, st.binary(min_size=1, max_size=64))
def test_trailing_garbage_raises(obj, junk):
    frame = rpc.serialize(obj) + junk
    with pytest.raises(DGLError):
        rpc.deserialize(frame)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=256))
def test_random_bytes_never_crash(blob):
    """deserialize on arbitrary bytes raises a controlled error at worst."""
    try:
        rpc.deserialize(blob)
    except (DGLError, Exception):
        pass


def test_header_lies_about_buffer_count():
    # header claims 1000 buffers but the frame is tiny
    frame = struct.pack("<I", 1000) + struct.pack("<Q", 2) + b"xx"
    with pytest.raises(DGLError):
        rpc.deserialize(frame)


# ---------------------------------------------------------------------------
# native receiver vs rogue peers
# ---------------------------------------------------------------------------

def _rogue_connect(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(struct.pack("<i", 99))  # handshake: sender id
    return s


def test_receiver_survives_corrupt_length_prefix():
    recv = rpc.Receiver("127.0.0.1", 0)
    port = recv.port
    try:
        # negative length
        s1 = _rogue_connect(port)
        s1.sendall(struct.pack("<q", -12345))
        # absurd length (beyond the 64 GiB cap)
        s2 = _rogue_connect(port)
        s2.sendall(struct.pack("<q", 1 << 60))
        # partial header then hard close
        s3 = _rogue_connect(port)
        s3.sendall(b"\x01\x02\x03")
        s3.close()

        # a legitimate sender still gets through
        sender = rpc.Sender(my_id=7)
        assert sender.connect(7, "127.0.0.1", port)
        payload = rpc.serialize({"x": np.arange(5)})
        sender.send(7, payload)
        got = recv.recv(timeout_ms=5000)
        assert got is not None
        sid, frame = got
        assert sid == 7
        out = rpc.deserialize(frame)
        assert np.array_equal(out["x"], np.arange(5))
        sender.close()
        s1.close()
        s2.close()
    finally:
        recv.close()


def test_receiver_rejects_oversized_then_serves_next_message():
    recv = rpc.Receiver("127.0.0.1", 0)
    try:
        rogue = _rogue_connect(recv.port)
        rogue.sendall(struct.pack("<q", (1 << 36) + 1))  # just over cap
        rogue.sendall(b"A" * 1024)  # receiver must have dropped us already

        sender = rpc.Sender(my_id=3)
        assert sender.connect(3, "127.0.0.1", recv.port)
        sender.send(3, rpc.serialize([1, 2, 3]))
        got = recv.recv(timeout_ms=5000)
        assert got is not None and rpc.deserialize(got[1]) == [1, 2, 3]
        sender.close()
        rogue.close()
    finally:
        recv.close()


def test_recv_timeout_on_dead_peer():
    """A receiver with no traffic must return None at the timeout, and a
    sender whose peer dies must fail the send, not hang (SURVEY §5.3:
    timeouts are the failure-detection contract)."""
    import time
    recv = rpc.Receiver("127.0.0.1", 0)
    t0 = time.time()
    assert recv.recv(timeout_ms=300) is None
    assert time.time() - t0 < 5
    sender = rpc.Sender(my_id=1)
    assert sender.connect(1, "127.0.0.1", recv.port)
    recv.close()                      # peer dies
    time.sleep(0.2)
    # sends either raise immediately or the writer thread drops the
    # connection; a follow-up connect to the dead port must fail fast
    try:
        sender.send(1, b"x" * 1024)
    except RuntimeError:
        pass
    sender2 = rpc.Sender(my_id=2)
    assert not sender2.connect(2, "127.0.0.1", recv.port,
                               timeout_ms=1000)
    sender.close()
    sender2.close()
