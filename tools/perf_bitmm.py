"""On-chip profiling of the bitmask SpMM family (ops/pallas/bitmm.py).

Times, with distinct pre-committed inputs and value-fetch syncs:
  1. MXU practical peak (square bf16 matmul chain)
  2. wide kernel  _bit_matmul   (f_pad=128)
  3. transposed   _bit_matmul_t (f_pad=16)
  4. full train step (for step composition)

Usage: PYTHONPATH=/root/repo python tools/perf_bitmm.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_list, sync):
    """fn over distinct pre-committed args; returns sec/call."""
    out = fn(*args_list[0])
    _ = sync(out)                        # compile + warm
    t0 = time.perf_counter()
    for a in args_list[1:]:
        out = fn(*a)
    _ = sync(out)
    return (time.perf_counter() - t0) / (len(args_list) - 1)


def main():
    from dgl_tpu.ops.pallas import bitmm

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        "bits_sym_232965_114615892_s0_v2.npz")
    n = 232_965
    print("# loading packed bits...", flush=True)
    bf = bitmm.load_bit_format(cache)
    packed = bf.packed
    packed.block_until_ready()
    kp, n32 = packed.shape
    print(f"# packed {packed.shape} = {packed.size*4/2**30:.2f} GiB",
          flush=True)

    rng = np.random.default_rng(0)
    reps = 6

    # 1. practical MXU peak: big square bf16 matmul
    m = 8192
    mats = [jnp.asarray(rng.normal(size=(m, m)).astype(np.float32),
                        dtype=jnp.bfloat16) for _ in range(reps + 1)]
    for a in mats:
        a.block_until_ready()
    f = jax.jit(lambda a, b: a @ b)
    dt = timed(f, [(mats[i], mats[i + 1]) for i in range(reps)],
               lambda o: float(o[0, 0]))
    print(f"peak_test: {dt*1e3:.1f} ms -> {2*m**3/dt/1e12:.0f} TFLOP/s",
          flush=True)

    # 2. wide kernel, f_pad=128
    xs = [jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
          for _ in range(reps)]
    for x in xs:
        x.block_until_ready()

    def wide(x):
        xp = bitmm._arrange_x(x, n32, 128)
        return bitmm._bit_matmul(packed, xp)

    dt = timed(wide, [(x,) for x in xs], lambda o: float(o[0, 0]))
    fl = 2.0 * kp * n32 * 32 * 128
    print(f"wide F=128: {dt*1e3:.1f} ms -> {fl/dt/1e12:.0f} TFLOP/s, "
          f"{packed.size*4/dt/2**30:.0f} GiB/s stream", flush=True)

    # 3. transposed kernel, f_pad=16
    xs16 = [jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
            for _ in range(reps)]
    for x in xs16:
        x.block_until_ready()

    def tk(x):
        return bitmm._apply_t(packed, n, x)

    dt = timed(tk, [(x,) for x in xs16], lambda o: float(o[0, 0]))
    fl = 2.0 * kp * n32 * 32 * 16
    print(f"transposed F=16: {dt*1e3:.1f} ms -> {fl/dt/1e12:.0f} TFLOP/s, "
          f"{packed.size*4/dt/2**30:.0f} GiB/s stream", flush=True)

    # 4. full bit_spmm dispatch at F=16 and F=41 (what the bench runs)
    for fdim in (16, 41):
        xs2 = [jnp.asarray(rng.normal(size=(n, fdim)).astype(np.float32))
               for _ in range(reps)]
        for x in xs2:
            x.block_until_ready()
        dt = timed(jax.jit(bitmm.bit_spmm), [(bf, x) for x in xs2],
                   lambda o: float(o[0, 0]))
        print(f"bit_spmm F={fdim}: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
