"""Compute ops: top-k primitives, device-side augmentation, fused pairwise
scoring (Pallas)."""
from .augment import augment_batch  # noqa: F401
from .topk import init_topk, merge_topk, sharded_topk, topk_2d  # noqa: F401
