"""Sampled-minibatch training on the mesh (VERDICT r3 #1b).

The TPU-native DistDGL regime: SPMD fanout sampling (owner-routed over
all_gather/psum_scatter), distributed feature pull, dense positional
blocks, end-to-end jitted train step.  Reference counterparts:
``distributed/graph_services.py:35-255`` (sample_neighbors service),
``kvstore.py:962`` (pull), ``dataloading/dist_dataloader.py``.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

import dgl_tpu as dgl
from dgl_tpu.parallel import shard_graph
from dgl_tpu.parallel.mesh_minibatch import (
    MeshCSC, build_mesh_csc, sample_frontier, gather_frontier,
    frontier_sizes, block_mean)

FANOUTS = [3, 2]
S = 4


def _setup(seed=5, n=200, E=1600):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, 7)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    mg = shard_graph(g, mesh)
    mcsc = build_mesh_csc(g, mg)
    return rng, g, x, mesh, mg, mcsc, src, dst, n


def test_sample_frontier_exact():
    rng, g, x, mesh, mg, mcsc, src, dst, n = _setup()
    P_ = len(jax.devices())
    seeds = rng.integers(0, n, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(0), mesh)
    ids_h = np.asarray(ids)
    sizes = frontier_sizes(S, FANOUTS)
    assert ids_h.shape == (P_, sizes[-1])
    assert np.array_equal(ids_h[:, :S], seeds)

    inv = np.empty(n, np.int64)
    inv[np.asarray(mg.perm)] = np.arange(n)
    in_nbrs = {}          # id set (for membership)
    in_deg = np.zeros(n, np.int64)   # edge multiplicity (for counts)
    for r, c in zip(inv[src], inv[dst]):
        in_nbrs.setdefault(int(c), set()).add(int(r))
        in_deg[c] += 1
    for li, k in enumerate(FANOUTS):
        m_prev = sizes[li]
        mk = np.asarray(masks[li])
        for p in range(P_):
            cur = ids_h[p, :m_prev]
            nb = ids_h[p, m_prev:sizes[li + 1]].reshape(m_prev, k)
            for i in range(m_prev):
                v = int(cur[i])
                got = [int(u) for u, mm in zip(nb[i], mk[p, i]) if mm]
                # sampled ids are true in-neighbors
                assert set(got) <= in_nbrs.get(v, set())
                # without replacement picks distinct EDGES: valid count
                # = min(edge-multiplicity degree, fanout)
                assert len(got) == min(in_deg[v], k)


def test_gather_frontier_parity():
    rng, g, x, mesh, mg, mcsc, *_ , n = _setup(6)
    P_ = len(jax.devices())
    xs = mg.shard_node_array(x)
    seeds = rng.integers(0, n, (P_, S)).astype(np.int32)
    ids, _ = sample_frontier(mcsc, seeds, FANOUTS,
                             jax.random.PRNGKey(1), mesh)
    feats = np.asarray(gather_frontier(xs, ids, mcsc, mesh))
    x_new = x[np.asarray(mg.perm)]
    ref = x_new[np.asarray(ids).reshape(-1)].reshape(feats.shape)
    np.testing.assert_allclose(feats, ref, atol=1e-6)


def test_block_mean_positional():
    rng, g, x, mesh, mg, mcsc, *_, n = _setup(7)
    P_ = len(jax.devices())
    xs = mg.shard_node_array(x)
    seeds = rng.integers(0, n, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(2), mesh)
    feats = gather_frontier(xs, ids, mcsc, mesh)
    sizes = frontier_sizes(S, FANOUTS)
    w1 = jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))

    h = feats
    for li in reversed(range(len(FANOUTS))):
        dstv, mean = block_mean(h, masks[li], sizes[li], FANOUTS[li])
        w = w1 if li == len(FANOUTS) - 1 else w2
        h = jax.nn.relu((dstv + mean) @ w)
    out = np.asarray(h)

    hn = np.asarray(feats).copy()
    for li in reversed(range(len(FANOUTS))):
        m_prev, k = sizes[li], FANOUTS[li]
        mk = np.asarray(masks[li]).astype(np.float32)[..., None]
        nbr = hn[:, m_prev:m_prev * (1 + k)].reshape(P_, m_prev, k, -1)
        mean = (nbr * mk).sum(2) / np.maximum(mk.sum(2), 1)
        w = np.asarray(w1 if li == len(FANOUTS) - 1 else w2)
        hn = np.maximum((hn[:, :m_prev] + mean) @ w, 0)
    np.testing.assert_allclose(out, hn, atol=1e-4)


def test_minibatch_sage_trains_end_to_end():
    """The full DistDGL loop as one jitted SPMD program: sample +
    gather + 2-layer SAGE + CE + adam, scanned; loss decreases and the
    model learns a planted community signal."""
    rng = np.random.default_rng(11)
    n, classes = 256, 4
    y = (np.arange(n) % classes).astype(np.int32)
    # 85% intra-community edges
    src = rng.integers(0, n, 3000)
    dst = np.where(rng.uniform(size=3000) < 0.85,
                   (src + classes * rng.integers(
                       0, n // classes, 3000)) % n,
                   rng.integers(0, n, 3000))
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    x += 1.5 * np.eye(classes)[y] @ rng.normal(size=(classes, 8))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    mg = shard_graph(g, mesh)
    mcsc = build_mesh_csc(g, mg)
    xs = mg.shard_node_array(x)
    ys = mg.shard_node_array(y[:, None])[:, 0]
    P_ = len(jax.devices())
    fanouts, s = [4, 4], 8
    sizes = frontier_sizes(s, fanouts)

    params = {
        "w1": jnp.asarray(rng.normal(size=(8, 16),
                                     scale=0.3).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(16, classes),
                                     scale=0.3).astype(np.float32)),
    }
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    def fwd(p, feats, masks):
        h = feats
        for li in reversed(range(len(fanouts))):
            dstv, mean = block_mean(h, masks[li], sizes[li],
                                    fanouts[li])
            w = p["w1"] if li == len(fanouts) - 1 else p["w2"]
            h = (dstv + mean) @ w
            if li == len(fanouts) - 1:
                h = jax.nn.relu(h)
        return h

    npp = mcsc.nodes_per_part

    @jax.jit
    def train(params, opt, key):
        def body(carry, key):
            params, opt = carry
            # fresh seeds + fresh sample every step, all inside jit
            seeds = jax.random.randint(key, (P_, s), 0, n, jnp.int32)
            ids, masks = sample_frontier(mcsc, seeds, fanouts,
                                         key, mesh)
            feats = gather_frontier(xs, ids, mcsc, mesh)
            yb = gather_frontier(ys[:, None].astype(jnp.float32),
                                 ids[:, :s], mcsc, mesh)
            yb = yb[..., 0].astype(jnp.int32)

            def loss_fn(p):
                logits = fwd(p, feats, masks)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
            l, gr = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(gr, opt)
            return (optax.apply_updates(params, up), opt), l

        keys = jax.random.split(key, 40)
        (params, opt), ls = jax.lax.scan(body, (params, opt), keys)
        return params, opt, ls

    params, opt, ls = train(params, opt, jax.random.PRNGKey(3))
    ls = np.asarray(ls)
    assert ls[-5:].mean() < ls[:5].mean() * 0.7, ls

    # full-graph eval with the trained params via one big "minibatch"
    seeds = np.arange(P_ * npp, dtype=np.int32).reshape(P_, npp) \
        % n  # padded rows re-ask real nodes; mask below uses orig ids
    ids, masks = sample_frontier(mcsc, seeds, fanouts,
                                 jax.random.PRNGKey(9), mesh)
    feats = gather_frontier(xs, ids, mcsc, mesh)
    sizes_eval = frontier_sizes(npp, fanouts)
    h = feats
    for li in reversed(range(len(fanouts))):
        dstv, mean = block_mean(h, masks[li], sizes_eval[li],
                                fanouts[li])
        w = params["w1"] if li == len(fanouts) - 1 else params["w2"]
        h = (dstv + mean) @ w
        if li == len(fanouts) - 1:
            h = jax.nn.relu(h)
    pred = np.asarray(h).reshape(P_ * npp, classes).argmax(1)
    # seeds were global new-order ids p*npp+i mod n; map back
    perm = np.asarray(mg.perm)
    ok = 0
    for j, sid in enumerate(np.asarray(seeds).reshape(-1)):
        ok += pred[j] == y[perm[sid]]
    assert ok / (P_ * npp) > 0.7


def test_minibatch_grads_match_replay():
    """Grads of the mesh minibatch step == grads of a host replay on
    the SAME blocks (oracle: identical math on unsharded copies)."""
    rng, g, x, mesh, mg, mcsc, *_, n = _setup(13)
    P_ = len(jax.devices())
    xs = mg.shard_node_array(x)
    seeds = rng.integers(0, n, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(4), mesh)
    feats = gather_frontier(xs, ids, mcsc, mesh)
    sizes = frontier_sizes(S, FANOUTS)
    params = {
        "w1": jnp.asarray(rng.normal(size=(7, 6)).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(6, 2)).astype(np.float32)),
    }
    yb = jnp.asarray(rng.integers(0, 2, (P_, S)).astype(np.int32))

    def loss_fn(p, feats):
        h = feats
        for li in reversed(range(len(FANOUTS))):
            dstv, mean = block_mean(h, masks[li], sizes[li],
                                    FANOUTS[li])
            w = p["w1"] if li == len(FANOUTS) - 1 else p["w2"]
            h = (dstv + mean) @ w
            if li == len(FANOUTS) - 1:
                h = jax.nn.relu(h)
        return optax.softmax_cross_entropy_with_integer_labels(
            h, yb).mean()

    g_mesh = jax.grad(loss_fn)(params, feats)
    g_host = jax.grad(loss_fn)(params, jnp.asarray(np.asarray(feats)))
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g_mesh, g_host)))
    assert err < 1e-5


def test_hetero_minibatch_sampling_and_training():
    """Heterogeneous sampled minibatches on the mesh — DistDGL's actual
    regime: typed frontiers over per-etype sharded CSCs, per-etype
    fanouts, R-GCN-style block model; sampled ids are exact and a
    2-layer model trains.  Reference: graph_services.py:35-255."""
    import optax
    from dgl_tpu.parallel import shard_hetero_graph
    from dgl_tpu.parallel.mesh_minibatch import (
        build_hetero_mesh_csc, hetero_sample_frontier,
        hetero_frontier_sizes, hetero_gather_frontier,
        hetero_block_reduce)
    rng = np.random.default_rng(17)
    n_user, n_item, classes = 160, 96, 3
    yu = (np.arange(n_user) % classes).astype(np.int32)
    # community-biased user-user follows; informative item features
    su = rng.integers(0, n_user, 1200)
    du = np.where(rng.uniform(size=1200) < 0.9,
                  (su + classes * rng.integers(0, n_user // classes,
                                               1200)) % n_user,
                  rng.integers(0, n_user, 1200))
    g = dgl.heterograph({
        ("user", "follows", "user"): (su, du),
        ("item", "bought-by", "user"): (rng.integers(0, n_item, 800),
                                        rng.integers(0, n_user, 800)),
    }, num_nodes_dict={"user": n_user, "item": n_item})
    xu = rng.normal(size=(n_user, 6)).astype(np.float32)
    xu += 1.2 * np.eye(classes)[yu] @ rng.normal(size=(classes, 6))
    xi = rng.normal(size=(n_item, 6)).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    hmg = shard_hetero_graph(g, mesh)
    cscs, npp = build_hetero_mesh_csc(g, hmg, mesh)
    xs = {"user": hmg.shard_node_array(xu, "user"),
          "item": hmg.shard_node_array(xi, "item")}
    ysf = hmg.shard_node_array(yu[:, None].astype(np.float32), "user")

    P_ = len(jax.devices())
    s = 6
    fanouts = [
        {("user", "follows", "user"): 3,
         ("item", "bought-by", "user"): 2},
        {("user", "follows", "user"): 3,
         ("item", "bought-by", "user"): 2},
    ]
    sizes = hetero_frontier_sizes({"user": s}, fanouts)
    seeds = {"user": rng.integers(0, n_user, (P_, s)).astype(np.int32)}

    ids, masks = hetero_sample_frontier(cscs, seeds, fanouts,
                                        jax.random.PRNGKey(0), mesh)
    # layout + sizes
    for nt in ids:
        assert ids[nt].shape == (P_, sizes[-1][nt]), (nt, ids[nt].shape)
    # exactness of sampled neighbors, layer 0 (user seeds)
    inv_u = np.empty(n_user, np.int64)
    inv_u[np.asarray(hmg.perms["user"])] = np.arange(n_user)
    inv_i = np.empty(n_item, np.int64)
    inv_i[np.asarray(hmg.perms["item"])] = np.arange(n_item)
    nbrs_uu, nbrs_iu = {}, {}
    for r, c in zip(inv_u[su], inv_u[du]):
        nbrs_uu.setdefault(int(c), set()).add(int(r))
    bb = g._units[1].coo()
    for r, c in zip(inv_i[np.asarray(bb[0])], inv_u[np.asarray(bb[1])]):
        nbrs_iu.setdefault(int(c), set()).add(int(r))
    ids_u = np.asarray(ids["user"])
    ids_i = np.asarray(ids["item"])
    m_uu = np.asarray(masks[(0, ("user", "follows", "user"))])
    m_iu = np.asarray(masks[(0, ("item", "bought-by", "user"))])
    for p in range(P_):
        for i in range(s):
            v = int(ids_u[p, i])
            got = [int(u) for u, mm in
                   zip(ids_u[p, s + i * 3: s + (i + 1) * 3], m_uu[p, i])
                   if mm]
            assert set(got) <= nbrs_uu.get(v, set())
            got_i = [int(u) for u, mm in
                     zip(ids_i[p, i * 2: (i + 1) * 2], m_iu[p, i])
                     if mm]
            assert set(got_i) <= nbrs_iu.get(v, set())

    # gather parity per ntype
    feats = hetero_gather_frontier(xs, ids, npp, mesh)
    xu_new = xu[np.asarray(hmg.perms["user"])]
    ref = xu_new[ids_u.reshape(-1)].reshape(np.asarray(
        feats["user"]).shape)
    np.testing.assert_allclose(np.asarray(feats["user"]), ref,
                               atol=1e-6)

    # 2-layer hetero block model trains (loss decreases)
    params = {
        "self1": jnp.asarray(rng.normal(size=(6, 8),
                                        scale=0.4).astype(np.float32)),
        "uu1": jnp.asarray(rng.normal(size=(6, 8),
                                      scale=0.4).astype(np.float32)),
        "iu1": jnp.asarray(rng.normal(size=(6, 8),
                                      scale=0.4).astype(np.float32)),
        "self2": jnp.asarray(rng.normal(size=(8, classes),
                                        scale=0.4).astype(np.float32)),
        "uu2": jnp.asarray(rng.normal(size=(8, classes),
                                      scale=0.4).astype(np.float32)),
        "iu2": jnp.asarray(rng.normal(size=(8, classes),
                                      scale=0.4).astype(np.float32)),
    }
    tx = optax.adam(3e-2)
    opt = tx.init(params)
    UU = ("user", "follows", "user")
    IU = ("item", "bought-by", "user")

    def model(p, feats, masks):
        h = feats
        for li in reversed(range(2)):
            wl = "1" if li == 1 else "2"

            def combine(nt, h_dst, means, _wl=wl):
                if nt != "user":
                    return h_dst      # items keep raw feats at layer 1
                out = h_dst @ p["self" + _wl]
                if UU in means:
                    out = out + means[UU] @ p["uu" + _wl]
                if IU in means:
                    out = out + means[IU] @ p["iu" + _wl]
                return jax.nn.relu(out) if _wl == "1" else out
            h = hetero_block_reduce(h, masks, sizes, fanouts, li,
                                    combine)
            if li == 1 and "item" in h:
                # items entering layer 2 need matching width: project
                h["item"] = jax.nn.relu(h["item"] @ p["self1"])
        return h["user"]

    @jax.jit
    def step(params, opt, key):
        seeds = {"user": jax.random.randint(key, (P_, s), 0, n_user,
                                            jnp.int32)}
        ids, masks = hetero_sample_frontier(cscs, seeds, fanouts,
                                            key, mesh)
        feats = hetero_gather_frontier(xs, ids, npp, mesh)
        yb = hetero_gather_frontier({"user": ysf},
                                    {"user": ids["user"][:, :s]},
                                    npp, mesh)["user"][..., 0].astype(
            jnp.int32)

        def loss_fn(p):
            logits = model(p, feats, masks)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        l, gr = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(gr, opt)
        return optax.apply_updates(params, up), opt2, l

    losses = []
    for i in range(30):
        params, opt, l = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.75, losses


def test_block_gat_oracle():
    """block_gat == explicit per-dst masked softmax over the sampled
    slots (+ self), computed in numpy from the same ids/masks."""
    from dgl_tpu.parallel.mesh_minibatch import block_gat
    rng, g, x, mesh, mg, mcsc, *_, n = _setup(13)
    P_ = len(jax.devices())
    H, D = 2, 3
    xs = mg.shard_node_array(x[:, :H * D].astype(np.float32))
    seeds = rng.integers(0, n, (P_, S)).astype(np.int32)
    ids, masks = sample_frontier(mcsc, seeds, FANOUTS,
                                 jax.random.PRNGKey(4), mesh)
    feats = gather_frontier(xs, ids, mcsc, mesh)   # (P, M, H*D)
    sizes = frontier_sizes(S, FANOUTS)
    M = sizes[-1]
    ft = jnp.asarray(feats).reshape(P_, M, H, D)
    al = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32))
    ar = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32))
    el = (ft * al).sum(-1)
    er = (ft * ar).sum(-1)

    li = len(FANOUTS) - 1           # innermost level
    m_prev, k = sizes[li], FANOUTS[li]
    out = np.asarray(block_gat(ft, el, er, masks[li], m_prev, k))

    ftn = np.asarray(ft)
    eln, ern = np.asarray(el), np.asarray(er)
    mk = np.asarray(masks[li])
    for p in range(P_):
        for i in range(m_prev):
            for h in range(H):
                lg = [eln[p, i, h] + ern[p, i, h]]      # self
                fts = [ftn[p, i, h]]
                for j in range(k):
                    if mk[p, i, j]:
                        sidx = m_prev + i * k + j
                        lg.append(eln[p, sidx, h] + ern[p, i, h])
                        fts.append(ftn[p, sidx, h])
                lg = np.asarray(lg, np.float32)
                lg = np.where(lg > 0, lg, 0.2 * lg)     # leaky_relu
                a = np.exp(lg - lg.max())
                a /= a.sum()
                ref = (a[:, None] * np.asarray(fts)).sum(0)
                np.testing.assert_allclose(out[p, i, h], ref,
                                           atol=2e-4)


def test_minibatch_gat_trains_end_to_end():
    """2-layer GAT over sampled mesh minibatches (block_gat reduce):
    loss falls and the planted community signal is learned — the
    attention counterpart of the SAGE loop (reference GATConv on MFG
    blocks)."""
    from dgl_tpu.parallel.mesh_minibatch import block_gat
    rng = np.random.default_rng(17)
    n, classes = 256, 4
    y = (np.arange(n) % classes).astype(np.int32)
    src = rng.integers(0, n, 3000)
    dst = np.where(rng.uniform(size=3000) < 0.85,
                   (src + classes * rng.integers(
                       0, n // classes, 3000)) % n,
                   rng.integers(0, n, 3000))
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    x += 1.5 * np.eye(classes)[y] @ rng.normal(size=(classes, 8))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    mg = shard_graph(g, mesh)
    mcsc = build_mesh_csc(g, mg)
    xs = mg.shard_node_array(x)
    ys = mg.shard_node_array(y[:, None])[:, 0]
    P_ = len(jax.devices())
    fanouts, s = [4, 4], 8
    sizes = frontier_sizes(s, fanouts)
    H, D = 2, 8

    params = {
        "w1": jnp.asarray(rng.normal(size=(8, H * D),
                                     scale=0.3).astype(np.float32)),
        "al1": jnp.asarray(rng.normal(size=(H, D),
                                      scale=0.3).astype(np.float32)),
        "ar1": jnp.asarray(rng.normal(size=(H, D),
                                      scale=0.3).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(H * D, classes),
                                     scale=0.3).astype(np.float32)),
        "al2": jnp.asarray(rng.normal(size=(1, classes),
                                      scale=0.3).astype(np.float32)),
        "ar2": jnp.asarray(rng.normal(size=(1, classes),
                                      scale=0.3).astype(np.float32)),
    }
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    def fwd(p, feats, masks):
        M = sizes[-1]
        ft = (feats @ p["w1"]).reshape(feats.shape[0], M, H, D)
        el = (ft * p["al1"]).sum(-1)
        er = (ft * p["ar1"]).sum(-1)
        h = block_gat(ft, el, er, masks[1], sizes[1], fanouts[1])
        h = jax.nn.relu(h.reshape(h.shape[0], sizes[1], H * D))
        ft2 = (h @ p["w2"]).reshape(h.shape[0], sizes[1], 1, classes)
        el2 = (ft2 * p["al2"]).sum(-1)
        er2 = (ft2 * p["ar2"]).sum(-1)
        # level-0 masks span seeds only
        out = block_gat(ft2, el2, er2, masks[0], sizes[0], fanouts[0])
        return out[..., 0, :]

    @jax.jit
    def step(params, opt, key):
        key, k1, k2 = jax.random.split(key, 3)
        seeds = jax.random.randint(k1, (P_, s), 0, n, jnp.int32)
        ids, masks = sample_frontier(mcsc, seeds, fanouts, k2, mesh)
        feats = gather_frontier(xs, ids, mcsc, mesh)
        labels = gather_frontier(ys[:, None].astype(jnp.float32),
                                 ids[:, :s], mcsc, mesh)[..., 0]
        labels = labels.astype(jnp.int32)

        def loss_fn(p):
            logits = fwd(p, feats, masks)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        l, gr = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(gr, opt)
        return optax.apply_updates(params, up), opt2, l, key

    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        params, opt, l, key = step(params, opt, key)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.3, losses[:3] + losses[-3:]


def test_hetero_block_reduce_raw_slabs_attention():
    """raw_slabs=True hands combine the positional (slab, mask) pairs —
    per-relation attention on the hetero sampled plane.  Oracle: the
    slab must be the exact positional slice of the typed frontier, and
    a masked-softmax attention combine must match a numpy replay."""
    from dgl_tpu.parallel import shard_hetero_graph
    from dgl_tpu.parallel.mesh_minibatch import (
        build_hetero_mesh_csc, hetero_sample_frontier,
        hetero_frontier_sizes, hetero_gather_frontier,
        hetero_block_reduce)
    rng = np.random.default_rng(23)
    n_user, n_item = 96, 64
    g = dgl.heterograph({
        ("user", "follows", "user"): (rng.integers(0, n_user, 600),
                                      rng.integers(0, n_user, 600)),
        ("item", "bought-by", "user"): (rng.integers(0, n_item, 400),
                                        rng.integers(0, n_user, 400)),
    }, num_nodes_dict={"user": n_user, "item": n_item})
    xu = rng.normal(size=(n_user, 5)).astype(np.float32)
    xi = rng.normal(size=(n_item, 5)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    hmg = shard_hetero_graph(g, mesh)
    cscs, npp = build_hetero_mesh_csc(g, hmg, mesh)
    xs = {"user": hmg.shard_node_array(xu, "user"),
          "item": hmg.shard_node_array(xi, "item")}
    P_ = len(jax.devices())
    s = 4
    UU = ("user", "follows", "user")
    IU = ("item", "bought-by", "user")
    fanouts = [{UU: 3, IU: 2}]
    sizes = hetero_frontier_sizes({"user": s}, fanouts)
    seeds = {"user": rng.integers(0, n_user, (P_, s)).astype(np.int32)}
    ids, masks = hetero_sample_frontier(cscs, seeds, fanouts,
                                        jax.random.PRNGKey(5), mesh)
    feats = hetero_gather_frontier(xs, ids, npp, mesh)

    al = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    ar = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    seen = {}

    def combine(nt, h_dst, slabs):
        if nt != "user":
            return h_dst
        out = h_dst
        for cet, (slab, mask) in sorted(slabs.items()):
            seen[cet] = (np.asarray(slab), np.asarray(mask))
            lg = jax.nn.leaky_relu(
                (slab * al).sum(-1) + (h_dst * ar).sum(-1)[..., None],
                0.2)
            lg = jnp.where(mask, lg, -1e9)
            a = jax.nn.softmax(lg, -1)
            a = a * mask                      # all-masked rows -> 0
            out = out + (a[..., None] * slab).sum(-2)
        return out

    out = hetero_block_reduce(feats, masks, sizes, fanouts, 0, combine,
                              raw_slabs=True)["user"]

    # slab layout oracle: IU slab = items[0 : s*2], UU slab =
    # users[s : s + s*3], both reshaped (P, s, k, F)
    fi = np.asarray(feats["item"])
    fu = np.asarray(feats["user"])
    np.testing.assert_allclose(
        seen[IU][0], fi[:, :s * 2].reshape(P_, s, 2, 5), atol=1e-6)
    np.testing.assert_allclose(
        seen[UU][0], fu[:, s:s + s * 3].reshape(P_, s, 3, 5), atol=1e-6)

    # attention math oracle (numpy replay)
    ref = fu[:, :s].copy()
    alv, arv = np.asarray(al), np.asarray(ar)
    for cet in (IU, UU):
        slab, mk = seen[cet]
        lg = (slab * alv).sum(-1) + (fu[:, :s] * arv).sum(-1)[..., None]
        lg = np.where(lg > 0, lg, 0.2 * lg)
        lg = np.where(mk, lg, -1e9)
        a = np.exp(lg - lg.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True) * mk
        ref = ref + (a[..., None] * slab).sum(-2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
