"""Pallas TPU kernels for the hot ops XLA doesn't schedule optimally."""

from .photometry_kernel import (
    build_den_table,
    build_subshift_table,
    build_subshift_table_device,
    pallas_photometry_num,
    pick_block_b,
    shift_decompose,
)

__all__ = [
    "build_den_table",
    "build_subshift_table",
    "build_subshift_table_device",
    "pallas_photometry_num",
    "pick_block_b",
    "shift_decompose",
]
