"""kd-tree + NN-descent KNN (VERDICT r1 missing item 8).
Ref: src/geometry/cpu (nanoflann kd-tree, NN-descent)."""
import numpy as np
import jax.numpy as jnp

from dgl_tpu.geometry import knn, nn_descent


def _oracle(x, k):
    d2 = ((x[:, None, :] - x[None]) ** 2).sum(-1)
    return np.argsort(d2, axis=1)[:, :k]


def test_kdtree_knn_exact():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1200, 3)).astype(np.float32)
    k = 6
    got = np.asarray(knn(x, k, algorithm="kd-tree"))
    want = _oracle(x, k)
    # same sets (ties may reorder)
    assert (np.sort(got, 1) == np.sort(want, 1)).mean() > 0.999


def test_bruteforce_matches_kdtree():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, 4)).astype(np.float32)
    bf = np.asarray(knn(x, 5, algorithm="bruteforce"))
    kd = np.asarray(knn(x, 5, algorithm="kd-tree"))
    assert (np.sort(bf, 1) == np.sort(kd, 1)).mean() > 0.99


def test_nn_descent_high_recall():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(800, 16)).astype(np.float32)
    k = 10
    got = nn_descent(x, k, seed=3)
    want = _oracle(x, k + 1)[:, 1:]   # oracle excl self
    # recall of true neighbors (nn-descent excludes self by construction)
    recall = np.mean([len(set(got[i]) & set(want[i])) / k
                      for i in range(len(x))])
    assert recall > 0.85, recall
