"""Pallas TPU tile kernels (Mosaic-compiled native tier)."""

from gaussian_process_tpu.ops.pallas.kernel_ops import gram, gram_matvec

__all__ = ["gram", "gram_matvec"]
