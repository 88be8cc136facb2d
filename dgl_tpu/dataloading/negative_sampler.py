"""Negative samplers for link prediction (reference
``python/dgl/dataloading/negative_sampler.py``)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import np_rng
from ..sampling.negative import global_uniform_negative_sampling


class _BaseNegativeSampler:
    def __call__(self, g, eids):
        return self._generate(g, np.asarray(eids))


class Uniform(_BaseNegativeSampler):
    """Per-edge uniform corruption of the destination (reference
    ``negative_sampler.Uniform``)."""

    def __init__(self, k: int):
        self.k = k

    def _generate(self, g, eids):
        rng = np_rng()
        row, col = (np.asarray(x) for x in g.unit().coo())
        src = np.repeat(row[eids], self.k)
        dst = rng.integers(0, g.unit().num_dst, len(src))
        return (jnp.asarray(src.astype(np.int32)),
                jnp.asarray(dst.astype(np.int32)))


class PerSourceUniform(Uniform):
    pass


class GlobalUniform(_BaseNegativeSampler):
    """Globally-unique negative pairs with rejection (reference
    ``negative_sampler.GlobalUniform`` backed by the C++ kernel)."""

    def __init__(self, k: int, exclude_self_loops: bool = True):
        self.k = k
        self.exclude_self_loops = exclude_self_loops

    def _generate(self, g, eids):
        return global_uniform_negative_sampling(
            g, len(eids) * self.k,
            exclude_self_loops=self.exclude_self_loops)
