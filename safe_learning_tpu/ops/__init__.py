"""Pallas TPU kernels for the hot ops."""

from .gp_kernel import fused_gp_predict, pallas_supported

__all__ = ["fused_gp_predict", "pallas_supported"]
