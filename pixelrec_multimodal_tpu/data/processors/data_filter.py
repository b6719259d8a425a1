# pixelrec_multimodal_tpu/data/processors/data_filter.py
"""Static interaction/item filtering utilities.

Parity target: /root/reference/src/data/processors/data_filter.py:12-138.
Note the reference's activity filter is a single pass (items first, then
users), not an iterative k-core; that behavior is preserved.
"""
from __future__ import annotations

from typing import Set

import pandas as pd


class DataFilter:
    """Stateless filtering operations over interaction and item tables."""

    @staticmethod
    def filter_interactions_by_valid_items(interactions_df: pd.DataFrame,
                                           valid_item_ids: Set[str]) -> pd.DataFrame:
        before = len(interactions_df)
        valid = {str(x) for x in valid_item_ids}
        out = interactions_df[
            interactions_df['item_id'].astype(str).isin(valid)].copy()
        print(f"Interaction filtering: {len(out)} interactions remaining "
              f"out of {before} after filtering by valid items")
        return out

    @staticmethod
    def filter_by_activity(interactions_df: pd.DataFrame,
                           min_user_interactions: int = 5,
                           min_item_interactions: int = 3) -> pd.DataFrame:
        out = interactions_df.copy()
        if min_item_interactions > 0:
            counts = out['item_id'].value_counts()
            out = out[out['item_id'].isin(
                counts[counts >= min_item_interactions].index)].copy()
            print(f"Filtered by item activity (min {min_item_interactions}): "
                  f"{len(out)} interactions, {out['item_id'].nunique()} items remain")
        if min_user_interactions > 0:
            counts = out['user_id'].value_counts()
            out = out[out['user_id'].isin(
                counts[counts >= min_user_interactions].index)].copy()
            print(f"Filtered by user activity (min {min_user_interactions}): "
                  f"{len(out)} interactions, {out['user_id'].nunique()} users remain")
        return out

    @staticmethod
    def align_item_info_with_interactions(item_info_df: pd.DataFrame,
                                          interactions_df: pd.DataFrame
                                          ) -> pd.DataFrame:
        before = len(item_info_df)
        keep = {str(x) for x in interactions_df['item_id'].unique()}
        out = item_info_df[item_info_df['item_id'].astype(str).isin(keep)].copy()
        print(f"Item info alignment: {len(out)} items remaining "
              f"out of {before} after filtering by interactions")
        return out

    @staticmethod
    def get_filtering_stats(original_interactions: pd.DataFrame,
                            filtered_interactions: pd.DataFrame,
                            original_items: pd.DataFrame,
                            filtered_items: pd.DataFrame) -> dict:
        return {
            'interactions': {
                'original': len(original_interactions),
                'filtered': len(filtered_interactions),
                'retention_rate': len(filtered_interactions) / len(original_interactions),
            },
            'users': {
                'original': original_interactions['user_id'].nunique(),
                'filtered': filtered_interactions['user_id'].nunique(),
                'retention_rate': (filtered_interactions['user_id'].nunique()
                                   / original_interactions['user_id'].nunique()),
            },
            'items': {
                'original': len(original_items),
                'filtered': len(filtered_items),
                'retention_rate': len(filtered_items) / len(original_items),
            },
        }
