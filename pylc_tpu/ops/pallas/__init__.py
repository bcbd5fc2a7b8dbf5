"""Pallas TPU kernels for the hot paths (benchmark-gated)."""
