"""Profile hybrid SpMM pieces at the bench's real width (F=16).

Questions:
 1. hybrid fwd at F=16 vs F=128 — narrow-F lane padding penalty?
 2. scatter `.at[dense_ids].add` cost (8192 rows into 233k)
 3. T=512/C=512 remainder geometry — does fill hold after hub removal?
 4. k_dense=16384 — dense-coverage expansion

Run on the real chip:  PYTHONPATH="/root/repo:$PYTHONPATH" python tools/perf_hybrid_f16.py
Scale down: DGL_TPU_BENCH_EDGES=23000000
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, label=""):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])   # force completion (tunnel!)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    from dgl_tpu.data.synth_reddit import reddit_like_graph
    from dgl_tpu.ops.pallas.hybrid import build_hybrid_format, hybrid_spmm
    from dgl_tpu.ops.pallas.tiled_spmm import tiled_spmm

    N = 232_965
    E = int(os.environ.get("DGL_TPU_BENCH_EDGES", 114_615_892))
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    gpath = os.path.join(cache_dir, f"reddit_{N}_{E}_s0.npz")
    if os.path.exists(gpath):
        z = np.load(gpath)
        row, col = z["row"], z["col"]
    else:
        row, col = reddit_like_graph(num_nodes=N, num_edges=E, seed=0)
        with open(gpath + ".tmp", "wb") as f:
            np.savez(f, row=row, col=col)
        os.replace(gpath + ".tmp", gpath)
    print(f"graph gen {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(2)
    x16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    x128 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    x16.block_until_ready(); x128.block_until_ready()

    variants = [
        ("k8192/T1024", dict(k_dense=8192, tile=1024, cap=512)),
        ("k16384/T1024", dict(k_dense=16384, tile=1024, cap=512)),
        ("k24576/T1024", dict(k_dense=24576, tile=1024, cap=512,
                              min_degree=192)),
    ]
    results = {}
    for name, kw in variants:
        t0 = time.time()
        cpath = os.path.join(
            cache_dir,
            f"hybrid_{N}_{E}_s0_k{kw['k_dense']}_t{kw['tile']}.npz")
        hf = build_hybrid_format(row, col, N, N,
                                 min_degree=kw.pop("min_degree", 256),
                                 cache_path=cpath, **kw)
        nb = len(hf.tf_fwd.dst_tile) if hasattr(hf.tf_fwd, "dst_tile") else -1
        e_rem = int(jnp.sum(hf.tf_fwd.valid)) if hasattr(hf.tf_fwd, "valid") else -1
        print(f"{name}: build {time.time()-t0:.0f}s, k={hf.k}, "
              f"remainder_edges={e_rem}", flush=True)
        jax.block_until_ready(hf.a_dense)
        results[name + "/F16"] = timeit(
            lambda x, hf=hf: hybrid_spmm(hf, x), x16,
            label=f"{name} hybrid fwd F=16")
        if name == "k8192/T1024":
            results[name + "/F128"] = timeit(
                lambda x, hf=hf: hybrid_spmm(hf, x), x128,
                label=f"{name} hybrid fwd F=128")
            # piece timings
            results["tiled/F16"] = timeit(
                lambda x, hf=hf: tiled_spmm(hf.tf_fwd, x), x16,
                label="tiled remainder only F=16")
            dense = jax.jit(lambda a, x: jax.lax.dot_general(
                a, x.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            xpad = jnp.zeros((hf.a_dense.shape[1], 16), jnp.float32
                             ).at[:N].set(x16)
            xpad.block_until_ready()
            results["dense/F16"] = timeit(
                lambda x, a=hf.a_dense: dense(a, x), xpad,
                label="dense block only F=16")
            base = jnp.zeros((N, 16), jnp.float32)
            od = jnp.asarray(rng.normal(size=(hf.k, 16)).astype(np.float32))
            base.block_until_ready(); od.block_until_ready()
            scat = jax.jit(lambda b, o, ids: b.at[ids].add(o))
            results["scatter"] = timeit(
                lambda b, o, hf=hf: scat(b, o, hf.dense_ids), base, od,
                label="scatter 8192 rows F=16")
        # bwd too
        g = jax.jit(jax.grad(lambda x, hf=hf: hybrid_spmm(hf, x).sum()))
        results[name + "/bwd16"] = timeit(
            lambda x, g=g: g(x), x16, label=f"{name} fwd+bwd(F=16)")
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
