"""Compute ops: top-k primitives, device-side augmentation, Pallas kernels."""
