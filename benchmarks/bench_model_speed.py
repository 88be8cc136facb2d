"""Model speed benchmarks (reference ``benchmarks/benchmarks/model_speed/``:
bench_gcn, bench_gat, bench_sage — time per training epoch)."""
import numpy as np

from .harness import benchmark, parametrize, Timer


def _setup(n=20_000, e=200_000, feat=64, classes=8):
    import jax.numpy as jnp
    import dgl_tpu as dgl
    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    g = dgl.add_self_loop(g)
    g.create_formats_()
    g.create_tiled_format()   # Pallas fast paths (SpMM + fused GAT)
    x = jnp.asarray(rng.normal(size=(n, feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, n).astype(np.int32))
    return g, x, y, classes


def _epoch_time(model_ctor):
    import jax
    import optax
    import flax.linen as nn  # noqa: F401
    g, x, y, classes = _setup()
    model = model_ctor(classes)
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            import optax as ox
            logits = model.apply(p, g, x)
            return ox.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    def epoch(params, opt):
        return step(params, opt)

    return Timer().bench(epoch, params, opt)


@benchmark("time")
def bench_gcn_epoch():
    import jax
    import flax.linen as nn
    from dgl_tpu import nn as dglnn

    def ctor(classes):
        class GCN(nn.Module):
            @nn.compact
            def __call__(self, g, x):
                h = dglnn.GraphConv(x.shape[-1], 128,
                                    activation=jax.nn.relu)(g, x)
                return dglnn.GraphConv(128, classes)(g, h)
        return GCN()

    return _epoch_time(ctor)


@benchmark("time")
def bench_gat_epoch():
    import jax
    import flax.linen as nn
    from dgl_tpu import nn as dglnn

    def ctor(classes):
        class GAT(nn.Module):
            @nn.compact
            def __call__(self, g, x):
                h = dglnn.GATConv(x.shape[-1], 32, 4)(g, x)
                h = jax.nn.elu(h.reshape(h.shape[0], -1))
                return dglnn.GATConv(h.shape[-1], classes, 1)(
                    g, h).reshape(h.shape[0], -1)
        return GAT()

    return _epoch_time(ctor)


@benchmark("time")
def bench_sage_epoch():
    import jax
    import flax.linen as nn
    from dgl_tpu import nn as dglnn

    def ctor(classes):
        class SAGE(nn.Module):
            @nn.compact
            def __call__(self, g, x):
                h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], 128,
                                               "mean")(g, x))
                return dglnn.SAGEConv(128, classes, "mean")(g, h)
        return SAGE()

    return _epoch_time(ctor)


@benchmark("time")
def bench_rgcn_epoch():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from dgl_tpu import nn as dglnn

    def ctor(classes):
        rng = np.random.default_rng(1)

        class RGCN(nn.Module):
            @nn.compact
            def __call__(self, g, x):
                et = jnp.asarray(rng.integers(0, 8, g.num_edges()),
                                 jnp.int32)
                h = dglnn.RelGraphConv(x.shape[-1], 64, 8,
                                       regularizer="basis",
                                       num_bases=4)(g, x, et)
                return nn.Dense(classes)(jax.nn.relu(h))
        return RGCN()

    return _epoch_time(ctor)
