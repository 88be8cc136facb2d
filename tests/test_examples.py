"""Examples smoke tests (reference CI runs example scripts as its
acceptance suite — Jenkinsfile 'example tests' stage).  Runs the fast
examples in subprocesses on CPU with reduced epochs."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args=(), timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_gcn_example():
    out = _run("gcn.py", ["--epochs", "30"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.8


def test_graphbolt_pipeline_example():
    out = _run("graphbolt_pipeline.py")
    assert "blocks" in out


def test_deepwalk_example():
    out = _run("deepwalk.py")
    agree = float(out.strip().splitlines()[-1].split()[-1])
    assert agree > 0.6


def test_gin_example():
    out = _run("gin_graph_classification.py")
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.8


def test_pinsage_example():
    out = _run("pinsage.py")
    assert "weighted edges" in out


def test_cluster_gcn_example():
    out = _run("cluster_gcn.py", ["--epochs", "10"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7


def test_gatv2_example():
    out = _run("gatv2.py", ["--epochs", "15"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.6


def test_graphormer_example():
    out = _run("graphormer.py", ["--epochs", "25"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.5


def test_metapath2vec_example():
    out = _run("metapath2vec.py", ["--epochs", "120"], timeout=540)
    agree = float(out.strip().splitlines()[-1].split()[-1])
    assert agree > 0.7


def test_egat_example():
    out = _run("egat_edge_features.py", ["--epochs", "100"], timeout=500)
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.75


def test_sage_device_pipeline_example():
    out = _run("sage_device_pipeline.py", ["--epochs", "8"], timeout=600)
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7, out


def test_link_prediction_device_example():
    out = _run("link_prediction_device.py", ["--steps", "80"],
               timeout=700)
    auc = float(out.strip().splitlines()[-1].split()[-1])
    assert auc > 0.7, out


def test_graphsaint_example():
    out = _run("graphsaint.py", ["--epochs", "15"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7


def test_dgi_example():
    out = _run("dgi.py", ["--epochs", "30"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7


def test_node2vec_example():
    out = _run("node2vec.py", ["--iters", "30"])
    agree = float(out.strip().splitlines()[-1].split()[-1])
    assert agree > 0.6


def test_jknet_example():
    out = _run("jknet.py", ["--epochs", "30"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7


def test_correct_and_smooth_example():
    out = _run("correct_and_smooth.py", ["--epochs", "60"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7
    # C&S must not hurt the base predictor on this easy planted task
    base = float(out.strip().splitlines()[-2].split()[-1])
    assert acc >= base - 0.05


def test_hgt_example():
    out = _run("hgt.py", ["--epochs", "60"])
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.6


def test_gat_dense_attention_example():
    out = _run("gat_dense_attention.py", ["--epochs", "30"], timeout=500)
    acc = float(out.strip().splitlines()[-1].split()[-1])
    assert acc > 0.7
