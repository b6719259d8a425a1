# pixelrec_multimodal_tpu/data/preprocessing.py
"""Standalone host-side preprocessing utilities.

Parity targets: /root/reference/src/data/preprocessing.py:20-198 (text
augmentation, numerical scaling, HTML stripping, unicode normalization, image
integrity/dimension checks). These run on the host as part of the offline
pipeline; the hot per-batch math happens on device elsewhere.
"""
from __future__ import annotations

import random
import re
import unicodedata
from typing import Any, Optional, Tuple

import numpy as np
from PIL import Image
from sklearn.preprocessing import MinMaxScaler, StandardScaler

_HTML_TAG_RE = re.compile(r'<.*?>')


def augment_text(text: str, augmentation_type: str = 'random_delete',
                 delete_prob: float = 0.1, swap_prob: float = 0.1,
                 rng: Optional[random.Random] = None) -> str:
    """Word-level text augmentation: random deletion or adjacent swaps.

    Mirrors reference preprocessing.py:20-57; adds an optional injectable
    ``rng`` so callers can make augmentation deterministic per sample.
    """
    words = text.split()
    if not words or augmentation_type == 'none':
        return text
    r = rng if rng is not None else random

    if augmentation_type == 'random_delete':
        kept = [w for w in words if r.random() > delete_prob]
        return " ".join(kept)
    if augmentation_type == 'random_swap':
        out = list(words)
        for i in range(len(out) - 1):
            if r.random() < swap_prob:
                out[i], out[i + 1] = out[i + 1], out[i]
        return " ".join(out)
    return text


def normalize_features(features: np.ndarray, method: str = 'standardization',
                       scaler: Optional[Any] = None
                       ) -> Tuple[np.ndarray, Optional[Any]]:
    """Scale a numerical feature array, fitting a scaler when none is given.

    Returns (normalized, scaler-or-None). Mirrors reference
    preprocessing.py:60-118: 'standardization' | 'min_max' | 'log1p' | 'none'.
    """
    if not isinstance(features, np.ndarray) or features.size == 0 or method == 'none':
        return features, None

    x = features.reshape(-1, 1) if features.ndim == 1 else features

    if method in ('standardization', 'min_max'):
        fitted = scaler
        if fitted is None:
            fitted = StandardScaler() if method == 'standardization' else MinMaxScaler()
            return fitted.fit_transform(x), fitted
        return fitted.transform(x), fitted

    if method == 'log1p':
        if np.any(x < 0):
            print("Warning: log1p transform applied to data with negative values. "
                  "Results might be NaN.")
        return np.log1p(x), None

    print(f"Warning: Unknown or 'none' normalization method '{method}'. "
          "Returning original features.")
    return features, None


def remove_html_tags(text: str) -> str:
    """Strip HTML tags (reference preprocessing.py:121-134)."""
    if not isinstance(text, str):
        return text
    return _HTML_TAG_RE.sub('', text)


def normalize_unicode_text(text: str) -> str:
    """NFKC-normalize a string (reference preprocessing.py:137-152)."""
    if not isinstance(text, str):
        return text
    return unicodedata.normalize('NFKC', text)


def is_image_corrupted(image_path: str) -> bool:
    """True if the file fails PIL verify+load (reference preprocessing.py:155-177)."""
    try:
        with Image.open(image_path) as img:
            img.verify()
        with Image.open(image_path) as img:
            img.load()
        return False
    except Exception:
        return True


def check_image_dimensions(image_path: str, min_width: int, min_height: int) -> bool:
    """True if the image is at least min_width x min_height
    (reference preprocessing.py:180-198)."""
    try:
        with Image.open(image_path) as img:
            w, h = img.size
        return w >= min_width and h >= min_height
    except Exception:
        return False
