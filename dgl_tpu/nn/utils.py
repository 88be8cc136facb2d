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


class Identity(nn.Module):
    """Argument-insensitive identity placeholder (reference
    ``nn/pytorch/utils.py:99``)."""

    @nn.compact
    def __call__(self, x):
        return x


def matmul_maybe_select(A, B):
    """C = A @ B, but an integer ``A`` is treated as a one-hot row
    selector — the dense matmul becomes an index lookup (reference
    ``nn/pytorch/utils.py:12``)."""
    if jnp.issubdtype(jnp.asarray(A).dtype, jnp.integer):
        return jnp.take(B, A, axis=0)
    return A @ B


def bmm_maybe_select(A, B, index):
    """Batched matmul C[i] = A[i] @ B[index[i]], with the integer-``A``
    one-hot shortcut (reference ``nn/pytorch/utils.py:53``): when A is an
    id vector, C[i] = B[index[i], A[i]]."""
    A = jnp.asarray(A)
    if jnp.issubdtype(A.dtype, jnp.integer):
        return B[index, A]
    BB = jnp.take(B, index, axis=0)          # (n, in, out)
    return jnp.einsum("ni,nio->no", A, BB)


def pairwise_squared_distance(x):
    """(n_samples, n_points, dims) -> (n_samples, n_points, n_points)
    squared euclidean distances (reference ``nn/pytorch/factory.py:7``)."""
    x2s = (x * x).sum(-1, keepdims=True)
    return x2s + jnp.swapaxes(x2s, -1, -2) - 2 * x @ jnp.swapaxes(x, -1,
                                                                  -2)


def get_aggregate_fn(agg):
    """Cross-relation aggregator factory (reference
    ``nn/pytorch/hetero.py:253``): 'sum'/'max'/'min'/'mean'/'stack' ->
    callable(list of tensors, dsttype) -> tensor."""
    from ..utils import DGLError
    if agg not in ("sum", "max", "min", "mean", "stack"):
        raise DGLError(
            "Invalid cross type aggregator. Must be one of "
            f'"sum", "max", "min", "mean" or "stack". But got "{agg}"')

    def fn(tensors, dsttype=None):
        stacked = jnp.stack(tensors)
        if agg == "sum":
            return stacked.sum(0)
        if agg == "max":
            return stacked.max(0)
        if agg == "min":
            return stacked.min(0)
        if agg == "mean":
            return stacked.mean(0)
        return jnp.stack(tensors, axis=1)
    return fn
