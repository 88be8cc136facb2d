"""Global runtime configuration flags.

Analogue of the reference's ``python/dgl/global_config.py`` /
``src/runtime/config.cc`` (libxsmm on/off) — here the toggles select Pallas
fast paths vs pure-XLA reference kernels.
"""
from __future__ import annotations

import os

_FLAGS = {
    "use_pallas": os.environ.get("DGL_TPU_USE_PALLAS", "1") != "0",
    "pallas_spmm_min_edges": int(
        os.environ.get("DGL_TPU_PALLAS_SPMM_MIN_EDGES", "65536")),
    # build the tiled format on first eligible SpMM automatically (host
    # graphs only; costs one-time preprocessing)
    "pallas_auto_build_tiled": os.environ.get(
        "DGL_TPU_PALLAS_AUTO_TILED", "0") != "0",
    # fuse same-op sum-reduce relations in multi_update_all into one
    # stacked SpMM per destination type (one compiled program instead of
    # one per relation)
    "fuse_multi_update_all": os.environ.get(
        "DGL_TPU_FUSE_MULTI_UPDATE_ALL", "1") != "0",
    # UDF reduce: bucket dst nodes by power-of-two-padded degree (bounded
    # compiled-shape count on power-law graphs) instead of exact degree.
    # Padded mailbox rows are zero and masked (NodeBatch.mailbox_mask).
    "udf_pow2_bucketing": os.environ.get(
        "DGL_TPU_UDF_POW2_BUCKETING", "1") != "0",
}


def use_pallas() -> bool:
    return _FLAGS["use_pallas"]


def set_use_pallas(flag: bool) -> None:
    _FLAGS["use_pallas"] = bool(flag)


def get(name: str):
    return _FLAGS[name]


def set(name: str, value) -> None:
    if name not in _FLAGS:
        raise KeyError(name)
    _FLAGS[name] = value
