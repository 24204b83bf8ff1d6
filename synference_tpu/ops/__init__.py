"""Pallas TPU kernels for the hot ops XLA doesn't schedule optimally."""

from .photometry_kernel import (
    build_den_table,
    build_shift_tables,
    pallas_photometry_num,
    shift_decompose,
)

__all__ = [
    "build_den_table",
    "build_shift_tables",
    "pallas_photometry_num",
    "shift_decompose",
]
