"""Benchmark harness (reference ``benchmarks/benchmarks/utils.py:546
@benchmark decorator, :375 parametrize`` — the ASV-style regression
suite).

Usage::

    from benchmarks.harness import benchmark, parametrize

    @benchmark("time")
    @parametrize("n", [1000, 10000])
    def bench_spmm(n): ...

    python -m benchmarks.run            # run all, print JSON lines
    python -m benchmarks.run --filter spmm

Device selection via ``DGL_BENCH_DEVICE`` (cpu | tpu), mirroring the
reference's env knob (``benchmarks/benchmarks/utils.py:337``).
"""
from __future__ import annotations

import functools
import itertools
import json
import time
from typing import Callable, Dict, List

REGISTRY: List[Dict] = []


def benchmark(track_type: str = "time", timeout: float = 120.0):
    """Register a tracked function; it must return the measured value
    (seconds for "time", a float for "acc"/custom units)."""
    assert track_type in ("time", "acc", "throughput", "mem")

    def deco(fn: Callable):
        REGISTRY.append({
            "name": fn.__name__,
            "fn": fn,
            "type": track_type,
            "params": getattr(fn, "_bench_params", [{}]),
        })
        return fn

    return deco


def parametrize(name: str, values):
    def deco(fn: Callable):
        existing = getattr(fn, "_bench_params", [{}])
        fn._bench_params = [dict(p, **{name: v})
                            for v, p in itertools.product(values, existing)]
        return fn

    return deco


class Timer:
    """Median-of-k wall timer that blocks on jax async dispatch."""

    def __init__(self, repeats: int = 3):
        self.repeats = repeats

    @staticmethod
    def _perturb(args, i):
        """Distinct float inputs per repeat: the axon remote-execution
        tunnel memoizes identical-input executions (~0.1 ms no-op
        returns), so repeated same-arg calls time nothing."""
        import jax.numpy as jnp

        def f(a):
            if (hasattr(a, "dtype") and hasattr(a, "ndim") and a.ndim >= 1
                    and jnp.issubdtype(a.dtype, jnp.floating)):
                # multiplicative: representable at any magnitude incl.
                # bf16 (an absolute 1e-7 nudge rounds to a no-op there)
                return a * jnp.asarray(1 + i * 0.01, a.dtype)
            return a
        return tuple(f(a) for a in args)

    @staticmethod
    def _sync(out):
        """Fetch a VALUE — block_until_ready alone can return before
        remote completion through the tunnel."""
        import jax
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "ravel")]
        if leaves:
            _ = float(leaves[0].ravel()[0])

    @staticmethod
    def _drain(args):
        """Force perturbed inputs to exist on-device BEFORE the timed
        region: the eager multiplies in _perturb ship a fresh scalar
        host->device, which through the axon tunnel can cost 0.5 s+ and
        would otherwise drain inside fn's timing (this was the entire
        r2->r4 suite 'drift' — see PERF_NOTES round-5 drift section)."""
        import jax
        import jax.numpy as jnp
        for leaf in jax.tree_util.tree_leaves(args):
            if (hasattr(leaf, "dtype") and getattr(leaf, "ndim", 0) >= 1
                    and getattr(leaf, "size", 0)
                    and jnp.issubdtype(leaf.dtype, jnp.floating)):
                _ = float(leaf.ravel()[0])

    def bench(self, fn, *args, **kwargs) -> float:
        self._sync(fn(*args, **kwargs))  # warmup / compile
        times = []
        for i in range(self.repeats):
            a = self._perturb(args, i + 1)
            kwargs = dict(zip(kwargs, self._perturb(
                tuple(kwargs.values()), i + 1)))
            self._drain(a)
            self._drain(tuple(kwargs.values()))
            t0 = time.perf_counter()
            out = fn(*a, **kwargs)
            self._sync(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]


def run_all(filter_str: str = "", out_file: str = None) -> List[Dict]:
    results = []
    for entry in REGISTRY:
        if filter_str and filter_str not in entry["name"]:
            continue
        for params in entry["params"]:
            try:
                value = entry["fn"](**params)
                rec = {"name": entry["name"], "params": params,
                       "type": entry["type"], "value": value}
            except Exception as e:  # record failures, keep going
                rec = {"name": entry["name"], "params": params,
                       "type": entry["type"], "error": str(e)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if out_file:
        with open(out_file, "w") as f:
            json.dump(results, f, indent=2)
    return results
