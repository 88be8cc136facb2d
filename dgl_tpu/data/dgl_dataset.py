"""Dataset base class (reference ``python/dgl/data/dgl_dataset.py``).

Pipeline: ``has_cache? load : (download -> process -> save)``.  This
container is zero-egress, so ``download`` only checks for pre-existing files
under ``raw_dir``; datasets that cannot find real files fall back to a
deterministic synthetic generator with the same schema when
``synthetic_fallback`` is enabled (the default here — clearly marked via
``dataset.is_synthetic``).
"""
from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.environ.get(
    "DGL_TPU_DATA_DIR",
    os.path.join(os.path.expanduser("~"), ".dgl_tpu"))


class DGLDataset:
    def __init__(self, name: str, url: Optional[str] = None,
                 raw_dir: Optional[str] = None,
                 save_dir: Optional[str] = None,
                 force_reload: bool = False, verbose: bool = False,
                 transform=None):
        self._name = name
        self._url = url
        self._raw_dir = raw_dir or _DEFAULT_DIR
        self._save_dir = save_dir or self._raw_dir
        self._verbose = verbose
        self._transform = transform
        self.is_synthetic = False
        self._load(force_reload)

    # -- subclass hooks ----------------------------------------------------
    def download(self):
        pass

    def process(self):
        raise NotImplementedError

    def has_cache(self) -> bool:
        return False

    def save(self):
        pass

    def load(self):
        pass

    # ----------------------------------------------------------------------
    def _load(self, force_reload):
        if not force_reload and self.has_cache():
            self.load()
            return
        self.download()
        self.process()
        self.save()

    @property
    def name(self):
        return self._name

    @property
    def raw_dir(self):
        return self._raw_dir

    @property
    def raw_path(self):
        return os.path.join(self._raw_dir, self._name)

    @property
    def save_dir(self):
        return self._save_dir

    @property
    def save_path(self):
        return os.path.join(self._save_dir, self._name)

    @property
    def verbose(self):
        return self._verbose

    def _g(self, g):
        return g if self._transform is None else self._transform(g)

    def __getitem__(self, idx):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError
