"""Test harness configuration.

Tests run on an 8-device *CPU* mesh so that (a) they are fast (no TPU-tunnel
round trips), and (b) multi-chip sharding paths are exercised exactly as the
driver's ``dryrun_multichip`` does (``xla_force_host_platform_device_count``).

The container's sitecustomize force-registers the axon TPU backend at
interpreter start; backends initialize lazily, so switching the platform
config here (before any computation runs) lands everything on CPU.  Set
``DGL_TPU_TESTS_ON_TPU=1`` to run the suite against the real chip instead.
"""
import os
import sys

if os.environ.get("DGL_TPU_TESTS_ON_TPU", "0") != "1":
    xla = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla:
        os.environ["XLA_FLAGS"] = (
            xla + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(num_nodes=50, num_edges=300, seed=0, bipartite=None):
    """A random test graph with self-consistency: returns (g, row, col)."""
    import dgl_tpu as dgl
    rng = np.random.default_rng(seed)
    if bipartite:
        nsrc, ndst = bipartite
    else:
        nsrc = ndst = num_nodes
    row = rng.integers(0, nsrc, num_edges).astype(np.int32)
    col = rng.integers(0, ndst, num_edges).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=max(nsrc, ndst))
    return g, row, col


def dense_adj(row, col, n, m=None):
    """Dense (dst, src) adjacency count matrix as the kernel oracle."""
    m = m or n
    a = np.zeros((m, n), np.float32)
    np.add.at(a, (col, row), 1.0)
    return a
