"""Pallas TPU SpMM kernels (placeholder until the BSR kernel lands)."""
from __future__ import annotations


def spmm_sum(unit, op, u_data, e_data):
    raise NotImplementedError
