"""Pallas TPU kernels — the performance path for intersection/traversal."""
