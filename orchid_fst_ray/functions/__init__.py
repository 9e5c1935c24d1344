"""Vectorized kernels used inside map_batches stages (no Ray dependency)."""
