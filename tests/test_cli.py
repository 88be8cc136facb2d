"""CLI tests (reference dglgo behavior: recipe/config/train/export)."""
import json
import subprocess
import sys

import yaml
import pytest

from dgl_tpu.cli import PIPELINES, default_config, get_pipeline
from dgl_tpu.cli.main import main


def test_recipe_list(capsys):
    main(["recipe", "list"])
    out = capsys.readouterr().out.split()
    # every pipeline has at least one recipe in the zoo
    for p_ in PIPELINES:
        assert any(name.startswith(p_) for name in out), p_


def test_config_and_train_nodepred(tmp_path, capsys):
    cfg_path = str(tmp_path / "cfg.yaml")
    main(["config", "nodepred", "--data", "cora", "--model", "gcn",
          "-o", cfg_path])
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    assert cfg["pipeline_name"] == "nodepred"
    cfg["general_pipeline"]["epochs"] = 30
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    metrics = main(["train", "--cfg", cfg_path])
    assert metrics["test_acc"] > 0.5


def test_export_roundtrip(tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    main(["config", "graphpred", "--data", "minigc", "-o", cfg_path])
    out = str(tmp_path / "script.py")
    main(["export", "--cfg", cfg_path, "-o", out])
    text = open(out).read()
    assert "get_pipeline" in text and "CFG" in text


@pytest.mark.parametrize("pipeline", ["linkpred", "graphpred",
                                      "nodepred-ns"])
def test_pipelines_run(pipeline):
    cfg = default_config(pipeline, data="cora")
    cfg["general_pipeline"]["epochs"] = 3
    if pipeline == "nodepred-ns":
        cfg["general_pipeline"]["epochs"] = 1
    metrics = get_pipeline(pipeline)(cfg)
    assert "loss" in metrics


def test_train_checkpoint_apply(tmp_path):
    import numpy as np
    cfg = default_config("nodepred", data="cora", model="gcn")
    cfg["general_pipeline"]["epochs"] = 10
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["train", "--cfg", cfg_path])
    out = str(tmp_path / "pred.npz")
    res = main(["apply", "--cfg", cfg_path, "--checkpoint",
                str(tmp_path / "ckpt"), "-o", out])
    data = np.load(out)
    assert data["pred"].shape[0] == res["num_nodes"]


@pytest.mark.parametrize("pipeline", ["linkpred", "graphpred"])
def test_train_checkpoint_apply_link_graph(tmp_path, pipeline):
    import numpy as np
    cfg = default_config(pipeline, data="cora")
    cfg["general_pipeline"]["epochs"] = 3
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["train", "--cfg", cfg_path])
    out = str(tmp_path / "pred.npz")
    res = main(["apply", "--cfg", cfg_path, "--checkpoint",
                str(tmp_path / "ckpt"), "-o", out])
    data = np.load(out)
    if pipeline == "linkpred":
        assert data["scores"].shape[0] == res["num_edges"]
        assert data["node_emb"].shape[0] == res["num_nodes"]
    else:
        assert data["pred"].shape[0] == res["num_graphs"]


def test_recipe_zoo(tmp_path, capsys):
    main(["recipe", "list"])
    out = capsys.readouterr().out.splitlines()
    assert len(out) >= 16 and "nodepred_cora_gcn" in out
    cfg_path = str(tmp_path / "r.yaml")
    main(["recipe", "get", "linkpred_cora_sage", "-o", cfg_path])
    cfg = yaml.safe_load(open(cfg_path))
    assert cfg["pipeline_name"] == "linkpred"
    # the recipe trains end-to-end
    cfg["general_pipeline"]["epochs"] = 2
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    metrics = main(["train", "--cfg", cfg_path])
    assert "test_auc" in metrics
