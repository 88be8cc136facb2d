"""Profiling / observability (SURVEY §5.1: the reference has no built-in
tracer — dmlc logging + ASV only; this build does better natively).

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  Perfetto/XPlane trace viewable in TensorBoard or ui.perfetto.dev.
* ``annotate(name)`` — named region inside a trace (TraceAnnotation).
* ``op_timer`` — median wall timing with async-dispatch barriers.
* ``spmm_roofline`` — analytic per-kernel roofline counters (FLOPs, HBM
  bytes, arithmetic intensity, and the bound given a chip spec).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/dgl_tpu_trace", create_perfetto_link=False):
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region: ``with annotate('spmm_fwd'): ...``"""
    import jax
    return jax.profiler.TraceAnnotation(name)


def op_timer(fn, *args, repeats: int = 5, warmup: int = 1, **kwargs):
    """Median wall time of ``fn(*args)`` with block_until_ready fences."""
    import jax
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


# chip specs for roofline bounds (public figures)
CHIP_SPECS: Dict[str, Dict[str, float]] = {
    # name: peak bf16 FLOP/s, HBM GB/s
    "v5e": {"flops": 197e12, "hbm_gbps": 819.0},
    "v5p": {"flops": 459e12, "hbm_gbps": 2765.0},
    "v4": {"flops": 275e12, "hbm_gbps": 1228.0},
    "generic": {"flops": 200e12, "hbm_gbps": 800.0},
}


@dataclass
class Roofline:
    flops: float
    bytes: float
    intensity: float            # FLOPs / byte
    bound: str                  # "memory" | "compute"
    min_time_s: float           # speed-of-light on the chip
    achieved_time_s: Optional[float] = None
    efficiency: Optional[float] = None   # min_time / achieved

    def as_dict(self):
        return self.__dict__.copy()


def spmm_roofline(num_edges: int, feat_dim: int, num_nodes: int,
                  dtype_bytes: int = 4, chip: str = "generic",
                  achieved_time_s: Optional[float] = None) -> Roofline:
    """Roofline for g-SpMM ``copy_u/sum``: 1 FMA per (edge, feat);
    traffic = read E*F src rows (upper bound, no cache) + write N*F +
    indices."""
    spec = CHIP_SPECS.get(chip, CHIP_SPECS["generic"])
    flops = 2.0 * num_edges * feat_dim
    bytes_ = (num_edges * feat_dim * dtype_bytes          # gather reads
              + num_nodes * feat_dim * dtype_bytes        # output write
              + num_edges * 8)                            # indices
    intensity = flops / bytes_
    t_mem = bytes_ / (spec["hbm_gbps"] * 1e9)
    t_cmp = flops / spec["flops"]
    min_t = max(t_mem, t_cmp)
    r = Roofline(flops, bytes_, intensity,
                 "memory" if t_mem >= t_cmp else "compute", min_t,
                 achieved_time_s,
                 (min_t / achieved_time_s) if achieved_time_s else None)
    return r


def gemm_roofline(m: int, n: int, k: int, dtype_bytes: int = 2,
                  chip: str = "generic",
                  achieved_time_s: Optional[float] = None) -> Roofline:
    spec = CHIP_SPECS.get(chip, CHIP_SPECS["generic"])
    flops = 2.0 * m * n * k
    bytes_ = dtype_bytes * (m * k + k * n + m * n)
    t_mem = bytes_ / (spec["hbm_gbps"] * 1e9)
    t_cmp = flops / spec["flops"]
    min_t = max(t_mem, t_cmp)
    return Roofline(flops, bytes_, flops / bytes_,
                    "memory" if t_mem >= t_cmp else "compute", min_t,
                    achieved_time_s,
                    (min_t / achieved_time_s) if achieved_time_s else None)
