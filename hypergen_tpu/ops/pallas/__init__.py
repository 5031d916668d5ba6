"""Pallas TPU kernels for the hot loops, with XLA fallbacks elsewhere."""
