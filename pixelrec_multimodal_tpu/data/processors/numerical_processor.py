# pixelrec_multimodal_tpu/data/processors/numerical_processor.py
"""Numerical feature processing: offline scaler fitting and online extraction.

Parity target: /root/reference/src/data/processors/numerical_processor.py:15-184.
Online outputs are numpy float32; the batched equivalent
(:meth:`transform_matrix`) produces the whole item table in one vectorized
pass for the device-resident feature store.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from sklearn.preprocessing import MinMaxScaler, StandardScaler


class NumericalProcessor:
    """Dual-mode numerical processor."""

    def __init__(self, numerical_cols: Optional[List[str]] = None,
                 normalization_method: str = 'none',
                 scaler: Optional[Any] = None):
        self.numerical_cols = numerical_cols or []
        self.normalization_method = normalization_method
        self.scaler = scaler
        self.fitted_columns = getattr(scaler, 'feature_names_in_', None)

    # ------------------------------------------------------------ online mode
    def get_scaler_info(self) -> Dict[str, Any]:
        if not self.scaler:
            return {'scaler_type': 'None', 'fitted_columns': []}
        cols = self.fitted_columns
        if cols is not None and not isinstance(cols, list):
            cols = list(cols)
        return {'scaler_type': type(self.scaler).__name__,
                'fitted_columns': cols or []}

    def get_features(self, item_info_row: pd.Series) -> np.ndarray:
        """One item row -> float32 feature vector with NaN->0 + scaling
        (reference :58-77)."""
        if not self.numerical_cols:
            return np.empty(0, dtype=np.float32)
        series = item_info_row.get(self.numerical_cols,
                                   pd.Series(0.0, index=self.numerical_cols))
        x = pd.to_numeric(series, errors='coerce').fillna(0).to_numpy(
            dtype=np.float32).reshape(1, -1)
        if self.scaler and self.normalization_method in ('standardization', 'min_max'):
            x = self.scaler.transform(x)
        elif self.normalization_method == 'log1p':
            x = np.log1p(x)
        return np.asarray(x, dtype=np.float32).reshape(-1)

    def get_placeholder_tensor(self) -> np.ndarray:
        return np.zeros(len(self.numerical_cols), dtype=np.float32)

    def transform_matrix(self, item_info_df: pd.DataFrame) -> np.ndarray:
        """Whole-table variant of :meth:`get_features`: [n_items, F] float32.

        Used to pack the device-resident numerical feature table in one pass
        instead of a per-item loop.
        """
        if not self.numerical_cols:
            return np.zeros((len(item_info_df), 0), dtype=np.float32)
        cols = pd.DataFrame(index=item_info_df.index)
        for c in self.numerical_cols:
            if c in item_info_df.columns:
                cols[c] = pd.to_numeric(item_info_df[c], errors='coerce')
            else:
                cols[c] = 0.0
        x = cols.fillna(0).to_numpy(dtype=np.float32)
        if self.scaler and self.normalization_method in ('standardization', 'min_max'):
            x = self.scaler.transform(x)
        elif self.normalization_method == 'log1p':
            x = np.log1p(x)
        return np.asarray(x, dtype=np.float32)

    # ----------------------------------------------------------- offline mode
    def fit_scaler(self, df: pd.DataFrame, numerical_columns: List[str],
                   method: str = 'standardization') -> Optional[Any]:
        """Fit a scaler on the given columns (reference :90-122)."""
        if not numerical_columns or method in ('none', 'log1p'):
            return None
        data = df[numerical_columns].fillna(0).values
        if method == 'standardization':
            self.scaler = StandardScaler()
        elif method == 'min_max':
            self.scaler = MinMaxScaler()
        else:
            return None
        self.scaler.fit(data)
        self.fitted_columns = list(numerical_columns)
        return self.scaler

    def transform_features(self, df: pd.DataFrame, numerical_columns: List[str],
                           method: str = 'standardization'
                           ) -> Tuple[pd.DataFrame, np.ndarray]:
        """Transform columns with the fitted scaler (reference :124-159)."""
        if not numerical_columns or method == 'none':
            return df, df[numerical_columns].fillna(0).values
        x = df[numerical_columns].fillna(0).values
        if method in ('standardization', 'min_max'):
            x = self.scaler.transform(x) if self.scaler else x
        elif method == 'log1p':
            x = np.log1p(x)
        return df, x

    def save_scaler(self, scaler_path: Path) -> bool:
        """Pickle {scaler, columns} (reference :161-169)."""
        if self.scaler is None:
            return False
        scaler_path = Path(scaler_path)
        scaler_path.parent.mkdir(parents=True, exist_ok=True)
        with open(scaler_path, 'wb') as f:
            pickle.dump({'scaler': self.scaler, 'columns': self.fitted_columns}, f)
        return True

    def load_scaler(self, scaler_path: Path) -> bool:
        """Load a pickled scaler, accepting both dict and bare-scaler formats
        (reference :171-184)."""
        scaler_path = Path(scaler_path)
        if not scaler_path.exists():
            return False
        with open(scaler_path, 'rb') as f:
            data = pickle.load(f)
        if isinstance(data, dict):
            self.scaler = data.get('scaler')
            self.fitted_columns = data.get('columns')
        else:
            self.scaler = data
            self.fitted_columns = None
        return True
