# pixelrec_multimodal_tpu/data/processors/text_processor.py
"""Text processing: offline cleaning and online tokenization.

Parity target: /root/reference/src/data/processors/text_processor.py:21-167.
The online path tokenizes through the offline-capable front-end in
``data/tokenization.py`` and emits fixed-shape numpy int32 arrays (static
shapes for XLA) instead of per-sample torch tensors.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ...config import MODEL_CONFIGS, OfflineTextCleaningConfig, TextAugmentationConfig
from ..preprocessing import normalize_unicode_text, remove_html_tags
from ..tokenization import get_tokenizer

_WS_RE = re.compile(r'\s+')


class TextProcessor:
    """Dual-mode text processor (online tokenization / offline cleaning)."""

    def __init__(
        self,
        model_name: Optional[str] = None,
        augmentation_config: Optional[TextAugmentationConfig] = None,
        cleaning_config: Optional[OfflineTextCleaningConfig] = None,
        max_length: Optional[int] = None,
    ):
        self.cleaning_config = cleaning_config
        self.augmentation_config = augmentation_config
        self.model_name = model_name

        if model_name:
            if model_name not in MODEL_CONFIGS['language']:
                raise ValueError(
                    f"Configuration for language model '{model_name}' not found.")
            self.online_config = MODEL_CONFIGS['language'][model_name]
            self.tokenizer = get_tokenizer(model_name, max_length=max_length)
            self.max_length = self.tokenizer.model_max_length
        else:
            self.online_config = None
            self.tokenizer = None
            self.max_length = None

    # ------------------------------------------------------------ online mode
    def process_text(self, text: str) -> Dict[str, np.ndarray]:
        """Tokenize one string into padded ids + mask (reference :57-82)."""
        if not self.tokenizer:
            raise RuntimeError(
                "TextProcessor not initialized for online mode. Provide 'model_name'.")
        ids, mask = self.tokenizer.encode(text, self.max_length)
        return {'text_input_ids': ids, 'text_attention_mask': mask}

    def get_placeholder_tensors(self) -> Dict[str, np.ndarray]:
        if not self.max_length:
            raise RuntimeError(
                "TextProcessor not initialized for online mode. Provide 'model_name'.")
        return {
            'text_input_ids': np.zeros(self.max_length, dtype=np.int32),
            'text_attention_mask': np.zeros(self.max_length, dtype=np.int32),
        }

    # ----------------------------------------------------------- offline mode
    def clean_text_field(self, text: str) -> str:
        """Apply configured cleaning steps to one string (reference :101-129)."""
        if not self.cleaning_config:
            raise RuntimeError(
                "TextProcessor not initialized for offline mode. "
                "Provide 'cleaning_config'.")
        if not isinstance(text, str):
            text = str(text) if text is not None else ''
        if self.cleaning_config.remove_html:
            text = remove_html_tags(text)
        if self.cleaning_config.normalize_unicode:
            text = normalize_unicode_text(text)
        if self.cleaning_config.to_lowercase:
            text = text.lower()
        return _WS_RE.sub(' ', text).strip()

    def clean_dataframe_text_columns(self, df: pd.DataFrame,
                                     text_columns: List[str]) -> pd.DataFrame:
        """Clean the named text columns of a copy of ``df`` (reference :131-147)."""
        out = df.copy()
        for col in text_columns:
            if col in out.columns:
                out[col] = out[col].astype(str).fillna('').map(self.clean_text_field)
        return out

    def get_combined_text(self, row: pd.Series, text_columns: List[str],
                          separator: str = ' ') -> str:
        """Join non-empty text fields of a row (reference :149-167)."""
        parts = []
        for col in text_columns:
            if col in row.index and pd.notna(row[col]):
                t = str(row[col]).strip()
                if t:
                    parts.append(t)
        return separator.join(parts)
