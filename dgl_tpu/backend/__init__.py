"""Minimal backend shim (reference ``python/dgl/backend/backend.py``
defines ~102 abstract tensor functions dispatched per framework).

dgl_tpu is single-backend (JAX); this module maps the most commonly
used backend functions onto jnp so reference-style ``import
dgl.backend as F`` code ports mechanically.  backend_name == 'jax'.
"""
from __future__ import annotations

import numpy as _np
import jax as _jax
import jax.numpy as _jnp

backend_name = "jax"
data_type_dict = {
    "float16": _jnp.float16, "bfloat16": _jnp.bfloat16,
    "float32": _jnp.float32, "float64": _jnp.float32,
    "int8": _jnp.int8, "int16": _jnp.int16,
    "int32": _jnp.int32, "int64": _jnp.int32,
    "uint8": _jnp.uint8, "bool": _jnp.bool_,
}
float32 = _jnp.float32
int64 = _jnp.int32   # int32-first ids on TPU
int32 = _jnp.int32


def tensor(data, dtype=None):
    return _jnp.asarray(data, dtype)


def asnumpy(x):
    return _np.asarray(x)


def zerocopy_to_numpy(x):
    return _np.asarray(x)


def zerocopy_from_numpy(x):
    return _jnp.asarray(x)


def shape(x):
    return tuple(x.shape)


def dtype(x):
    return _jnp.asarray(x).dtype


def ndim(x):
    return _jnp.asarray(x).ndim


def context(x):
    devs = getattr(x, "devices", None)
    return next(iter(devs())) if callable(devs) else None


def device_type(ctx):
    return getattr(ctx, "platform", "cpu")


def cpu():
    return _jax.devices("cpu")[0]


def copy_to(x, ctx, **kwargs):
    return _jax.device_put(x, ctx)


def astype(x, ty):
    return _jnp.asarray(x).astype(ty)


def cat(seq, dim=0):
    return _jnp.concatenate(seq, axis=dim)


def stack(seq, dim=0):
    return _jnp.stack(seq, axis=dim)


def split(x, sizes_or_sections, dim=0):
    if isinstance(sizes_or_sections, int):
        return _jnp.split(x, sizes_or_sections, axis=dim)
    idx = _np.cumsum(sizes_or_sections)[:-1]
    return _jnp.split(x, idx, axis=dim)


def repeat(x, repeats, dim=0):
    return _jnp.repeat(x, repeats, axis=dim)


def gather_row(data, row_index):
    return _jnp.take(data, row_index, axis=0)


def scatter_row(data, row_index, value):
    return data.at[row_index].set(value)


def slice_axis(data, axis, begin, end):
    return _jax.lax.slice_in_dim(data, begin, end, axis=axis)


def take(data, indices, dim):
    return _jnp.take(data, indices, axis=dim)


def narrow_row(x, start, stop):
    return x[start:stop]


def reshape(x, shape_):
    return _jnp.reshape(x, shape_)


def swapaxes(x, axis1, axis2):
    return _jnp.swapaxes(x, axis1, axis2)


def unsqueeze(x, dim):
    return _jnp.expand_dims(x, dim)


def squeeze(x, dim):
    return _jnp.squeeze(x, dim)


def sum(x, dim=None, keepdims=False):  # noqa: A001
    return _jnp.sum(x, axis=dim, keepdims=keepdims)


def mean(x, dim=None):
    return _jnp.mean(x, axis=dim)


def max(x, dim=None):  # noqa: A001
    return _jnp.max(x, axis=dim)


def min(x, dim=None):  # noqa: A001
    return _jnp.min(x, axis=dim)


def argmax(x, dim=None):
    return _jnp.argmax(x, axis=dim)


def argsort(x, dim=-1, descending=False):
    out = _jnp.argsort(x, axis=dim)
    return _jnp.flip(out, axis=dim) if descending else out


def nonzero_1d(x):
    return _jnp.nonzero(_jnp.asarray(x))[0]


def unique(x, return_inverse=False):
    return _jnp.unique(x, return_inverse=return_inverse)


def zeros(shape_, dtype=_jnp.float32, ctx=None):
    return _jnp.zeros(shape_, dtype)


def ones(shape_, dtype=_jnp.float32, ctx=None):
    return _jnp.ones(shape_, dtype)


def arange(start, stop, dtype=_jnp.int32, ctx=None):
    return _jnp.arange(start, stop, dtype=dtype)


def full_1d(length, fill_value, dtype, ctx=None):
    return _jnp.full((length,), fill_value, dtype)


def boolean_mask(x, mask):
    return _jnp.asarray(_np.asarray(x)[_np.asarray(mask)])


def equal(x, y):
    return x == y


def where(cond, x, y):
    return _jnp.where(cond, x, y)


def as_scalar(x):
    return _jnp.asarray(x).reshape(()).item()


def clamp(x, lo, hi):
    return _jnp.clip(x, lo, hi)


def softmax(x, dim=-1):
    return _jax.nn.softmax(x, axis=dim)
