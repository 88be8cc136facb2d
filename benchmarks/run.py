"""Benchmark runner: `python -m benchmarks.run [--filter X] [-o out.json]`.

Mirrors the reference's ASV nightly flow (docs/source/performance.rst:7-11)
as a single-command JSON emitter; DGL_BENCH_DEVICE selects cpu/tpu.
"""
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    if os.environ.get("DGL_BENCH_DEVICE", "") == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from . import bench_kernels, bench_api, bench_model_speed  # noqa: F401
    from .harness import run_all
    run_all(args.filter, args.output)


if __name__ == "__main__":
    main()
