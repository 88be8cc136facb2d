"""Edge scorers for link prediction (reference ``dglgo/dglgo/model/
edge_encoder/{dot,bilinear}.py``)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DotPredictor(nn.Module):
    @nn.compact
    def __call__(self, h_src, h_dst):
        return (h_src * h_dst).sum(-1)


class BilinearPredictor(nn.Module):
    @nn.compact
    def __call__(self, h_src, h_dst):
        W = self.param("W", nn.initializers.glorot_uniform(),
                       (h_src.shape[-1], h_dst.shape[-1]), h_src.dtype)
        return ((h_src @ W) * h_dst).sum(-1)


class MLPPredictor(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, h_src, h_dst):
        h = jnp.concatenate([h_src, h_dst], -1)
        h = jax.nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h).squeeze(-1)
