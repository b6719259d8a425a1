"""Data layer: offline preprocessing, splitting, tokenization, datasets,
and the device-resident feature store."""
from .loader import PrefetchLoader, prefetch_to_device  # noqa: F401
