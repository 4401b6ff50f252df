"""Fused Pallas TPU kernels for the hot spectral front-end."""
