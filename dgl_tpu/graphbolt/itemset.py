"""ItemSet / ItemSetDict (reference ``python/dgl/graphbolt/itemset.py``):
the indexable source of seeds (node ids, node pairs, pairs+labels...)."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class ItemSet:
    """Tuple-of-arrays item source; ``names`` labels each field (reference
    names: 'seeds', 'labels', 'indexes', ...)."""

    def __init__(self, items, names=None):
        if not isinstance(items, tuple):
            items = (items,)
        self._items = tuple(np.asarray(a) for a in items)
        if names is None:
            names = ("seeds",) if len(items) == 1 else None
        if isinstance(names, str):
            names = (names,)
        self._names = tuple(names) if names else None
        n = len(self._items[0])
        for a in self._items:
            assert len(a) == n

    @property
    def names(self):
        return self._names

    def __len__(self):
        return len(self._items[0])

    def __getitem__(self, idx):
        got = tuple(a[idx] for a in self._items)
        return got[0] if len(got) == 1 else got


class ItemSetDict:
    """Per-type item sets (hetero seeds)."""

    def __init__(self, itemsets: Dict[str, ItemSet]):
        self._sets = dict(itemsets)

    @property
    def names(self):
        return next(iter(self._sets.values())).names

    def __len__(self):
        return sum(len(s) for s in self._sets.values())

    def keys(self):
        return self._sets.keys()

    def __getitem__(self, key):
        return self._sets[key]
