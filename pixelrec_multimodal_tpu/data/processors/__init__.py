"""Data processors: image, text, numerical, filtering.

Parity target: /root/reference/src/data/processors/__init__.py:6-10 (the
reference's FeatureCacheProcessor is stale/broken — its *intent*, batch
feature precompute, lives in encoders/precompute.py and data/feature_store.py
here).
"""
from .data_filter import DataFilter  # noqa: F401
from .image_processor import (  # noqa: F401
    ImagePreprocessSpec,
    ImageProcessor,
    PREPROCESS_SPECS,
    normalize_chw,
    resize_and_center_crop,
)
from .numerical_processor import NumericalProcessor  # noqa: F401
from .text_processor import TextProcessor  # noqa: F401
