"""Operators: RecDB recommendation kernels + large-scale pipeline ops."""
