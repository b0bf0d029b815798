"""Compute ops: RNG, ray generation, intersection, BVH, BRDF, lighting,
path-trace integrator, and Pallas TPU kernels."""
