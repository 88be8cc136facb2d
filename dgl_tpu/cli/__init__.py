"""dgl_tpu command-line interface — the dglgo equivalent.

Reference: ``dglgo/dglgo/cli/cli.py`` (typer CLI with
``train/config/recipe/export/apply``) + pipelines
``dglgo/dglgo/pipeline/{nodepred,nodepred_sample,linkpred,graphpred}``.

Commands::

    python -m dgl_tpu.cli recipe list
    python -m dgl_tpu.cli config nodepred --data cora --model gcn -o cfg.yml
    python -m dgl_tpu.cli train --cfg cfg.yml
    python -m dgl_tpu.cli export --cfg cfg.yml -o train_script.py
"""
from .pipelines import PIPELINES, get_pipeline, default_config
from .main import main
