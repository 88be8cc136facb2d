"""Functional nn ops (reference ``python/dgl/nn/functional/__init__.py``
exports ``edge_softmax``)."""
from ..softmax import edge_softmax

__all__ = ["edge_softmax"]
