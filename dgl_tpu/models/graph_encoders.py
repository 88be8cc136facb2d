"""Graph-level encoders (reference ``dglgo/dglgo/model/graph_encoder/
gin.py``)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import nn as dglnn


class GINGraphEncoder(nn.Module):
    in_size: int
    out_size: int
    hidden_size: int = 64
    num_layers: int = 3
    pooling: str = "sum"

    @nn.compact
    def __call__(self, bg, x, *, deterministic: bool = True):
        pool = {"sum": dglnn.SumPooling, "mean": dglnn.AvgPooling,
                "max": dglnn.MaxPooling}[self.pooling]()
        h = x
        readouts = []
        for i in range(self.num_layers):
            h = jax.nn.relu(dglnn.GINConv(nn.Dense(self.hidden_size),
                                          "sum")(bg, h))
            readouts.append(pool(bg, h))
        return nn.Dense(self.out_size)(jnp.concatenate(readouts, -1))
