"""Pallas TPU kernels for codec hot ops."""
