"""nn utilities (reference ``python/dgl/nn/pytorch/utils.py``):
JumpingKnowledge, LabelPropagation."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import gspmm


class JumpingKnowledge(nn.Module):
    """Combine per-layer representations (reference ``utils.py
    JumpingKnowledge``): mode in {cat, max, lstm}."""
    mode: str = "cat"
    in_feats: int = 0
    num_layers: int = 0

    @nn.compact
    def __call__(self, feat_list: Sequence[jnp.ndarray]):
        if self.mode == "cat":
            return jnp.concatenate(list(feat_list), axis=-1)
        if self.mode == "max":
            return jnp.stack(list(feat_list)).max(0)
        if self.mode == "lstm":
            x = jnp.stack(list(feat_list), axis=1)  # (N, L, D)
            cell = nn.OptimizedLSTMCell(self.in_feats, name="lstm")
            carry = cell.initialize_carry(jax.random.PRNGKey(0),
                                          (x.shape[0], self.in_feats))
            attn_dense = nn.Dense(1, name="attn")

            def step(carry, xt):
                carry, y = cell(carry, xt)
                return carry, y
            _, ys = jax.lax.scan(step, carry, jnp.swapaxes(x, 0, 1))
            ys = jnp.swapaxes(ys, 0, 1)  # (N, L, D)
            alpha = jax.nn.softmax(attn_dense(ys).squeeze(-1), axis=-1)
            return (ys * alpha[..., None]).sum(1)
        raise ValueError(self.mode)


class LabelPropagation(nn.Module):
    """Iterative label propagation (reference ``utils.py
    LabelPropagation``)."""
    k: int = 3
    alpha: float = 0.9
    clamp: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, g, labels, mask=None):
        if labels.ndim == 1:
            y = jax.nn.one_hot(labels, int(labels.max()) + 1)
        else:
            y = labels.astype(jnp.float32)
        if mask is not None:
            y = y * mask[:, None].astype(y.dtype)
        init = y
        unit = g.unit()
        deg_in = jnp.maximum(unit.in_degrees(), 1).astype(y.dtype) ** -0.5
        deg_out = jnp.maximum(unit.out_degrees(), 1).astype(y.dtype) ** -0.5
        for _ in range(self.k):
            h = y * deg_out[:, None]
            h = gspmm(unit, "copy_lhs", "sum", h, None)
            h = h * deg_in[:, None]
            y = self.alpha * h + (1 - self.alpha) * init
            if self.clamp:
                y = jnp.clip(y, 0.0, 1.0)
            if self.normalize:
                y = y / jnp.maximum(y.sum(-1, keepdims=True), 1e-12)
        return y


class Sequential(nn.Module):
    """Chain graph modules: each gets ``(g, h)`` (reference
    ``nn/pytorch/utils.py:113 Sequential``)."""
    layers: Sequence[nn.Module]

    @nn.compact
    def __call__(self, graph, feat, *args):
        h = feat
        for i, layer in enumerate(self.layers):
            mod = layer.clone(name=f"layer{i}", parent=self)
            h = mod(graph, h, *args)
        return h


class WeightBasis(nn.Module):
    """Basis-decomposed weight bank: W_o = sum_b coeff[o,b] * V_b
    (reference ``utils.py:235 WeightBasis``; Schlichtkrull et al.)."""
    shape: Sequence[int]
    num_bases: int
    num_outputs: int

    @nn.compact
    def __call__(self):
        V = self.param("weight", nn.initializers.glorot_uniform(),
                       (self.num_bases,) + tuple(self.shape), jnp.float32)
        coeff = self.param("w_comp", nn.initializers.glorot_uniform(),
                           (self.num_outputs, self.num_bases), jnp.float32)
        return jnp.einsum("ob,b...->o...", coeff, V)
