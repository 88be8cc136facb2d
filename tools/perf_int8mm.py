"""Validate + profile the int8 streaming matmul (ops/pallas/int8mm.py).

Correctness vs the XLA upcast dot at small K; stream bandwidth at
K=8192/16384, N=233k, F=16 (the bench's dense-block shape).
Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/perf_int8mm.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, label=""):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from dgl_tpu.ops.pallas.int8mm import int8_matmul, pad_int8_block

    rng = np.random.default_rng(0)
    # correctness at modest size
    K, N, F = 1024, 4096, 16
    a = rng.integers(0, 4, (K, N)).astype(np.int8)
    x = rng.normal(size=(N, F)).astype(np.float32)
    z = rng.normal(size=(K, F)).astype(np.float32)
    ad = jnp.asarray(pad_int8_block(a))
    out = np.asarray(int8_matmul(ad, jnp.asarray(x)))[:K]
    ref = (a.astype(np.float32) @ x.astype(np.float32))
    # bf16 rounding of x: compare loosely
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"fwd rel err {err:.2e}", flush=True)
    out_t = np.asarray(int8_matmul(ad, jnp.asarray(z),
                                   contract_rows=True))[:N]
    ref_t = a.astype(np.float32).T @ z
    err_t = np.abs(out_t - ref_t).max() / (np.abs(ref_t).max() + 1e-9)
    print(f"bwd rel err {err_t:.2e}", flush=True)
    assert err < 2e-2 and err_t < 2e-2

    # bandwidth at bench scale
    for K in (8192, 16384):
        N = 232_965
        a = rng.integers(0, 2, (K, N)).astype(np.int8)
        ad = jnp.asarray(pad_int8_block(a))
        gb = ad.size / 2**30
        x = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
        z = jnp.asarray(rng.normal(size=(K, 16)).astype(np.float32))
        jax.block_until_ready((ad, x, z))
        dt = timeit(lambda x: int8_matmul(ad, x), x,
                    label=f"int8 K={K} fwd ({gb:.2f} GB)")
        print(f"  -> {gb/dt:.0f} GB/s", flush=True)
        dt = timeit(lambda z: int8_matmul(ad, z, contract_rows=True), z,
                    label=f"int8 K={K} bwd")
        print(f"  -> {gb/dt:.0f} GB/s", flush=True)
        # bf16 XLA dot for comparison (2x bytes)
        ab = ad.astype(jnp.bfloat16)
        jax.block_until_ready(ab)
        dot = jax.jit(lambda a, x: jax.lax.dot_general(
            a, x.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dt = timeit(lambda x: dot(ab, x), x, label=f"bf16 K={K} fwd")
        print(f"  -> {2*gb/dt:.0f} GB/s", flush=True)
        del ab, ad


if __name__ == "__main__":
    main()
