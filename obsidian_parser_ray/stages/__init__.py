"""Batch transform stages (map_batches kernels + actor-pool classes)."""
