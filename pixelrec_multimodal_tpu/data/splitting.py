# pixelrec_multimodal_tpu/data/splitting.py
"""Train/val/test splitting strategies for recommender datasets.

Behavioral parity with /root/reference/src/data/splitting.py:19-617 (8 named
strategies, the mixed cold-start split, overlap statistics, and the
``create_robust_splits`` factory). The implementations here are vectorized
pandas — notably leave-one-out and per-user stratified splits use grouped
ranking instead of per-user Python loops, which matters on PixelRec-scale
interaction tables.
"""
from __future__ import annotations

import random
from typing import Dict, Optional, Tuple, Union

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

_CORE_COLUMNS = ('user_id', 'item_id', 'timestamp')


def _core_cols(df: pd.DataFrame):
    return [c for c in _CORE_COLUMNS if c in df.columns]


class DataSplitter:
    """Reproducible splitting strategies, seeded once at construction."""

    def __init__(self, random_state: int = 42):
        self.random_state = random_state
        # Reference seeds the global streams at init (splitting.py:36-38);
        # kept for downstream code that relies on it.
        np.random.seed(random_state)
        random.seed(random_state)

    # ------------------------------------------------------------------ 3-way
    def column_stratified_split(
        self, interactions_df: pd.DataFrame,
        train_ratio: float = 0.7, val_ratio: float = 0.15, test_ratio: float = 0.15,
        stratify_by: str = None,
    ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Random 3-way split preserving class balance of ``stratify_by``.

        Note the reference's exact carve-out order (splitting.py:74-97): the
        first sklearn split takes the *train* set as its ``test_size``
        partition, the remainder is split into val/test.
        """
        if not stratify_by or stratify_by not in interactions_df.columns:
            raise ValueError(
                f"Stratification column '{stratify_by}' not found or not provided.")
        if not np.isclose(train_ratio + val_ratio + test_ratio, 1.0):
            raise ValueError(
                "The sum of train, validation, and test ratios must be 1.0.")

        temp_df, train_df = train_test_split(
            interactions_df, test_size=train_ratio,
            random_state=self.random_state,
            stratify=interactions_df[stratify_by])

        rel_test = test_ratio / (val_ratio + test_ratio)
        strat = temp_df[stratify_by]
        if strat.nunique() < 2:
            val_df, test_df = train_test_split(
                temp_df, test_size=rel_test, random_state=self.random_state)
        else:
            val_df, test_df = train_test_split(
                temp_df, test_size=rel_test, random_state=self.random_state,
                stratify=strat)

        cols = _core_cols(interactions_df)
        return train_df[cols], val_df[cols], test_df[cols]

    def stratified_temporal_split(
        self, interactions_df: pd.DataFrame,
        train_ratio: float = 0.7, val_ratio: float = 0.15, test_ratio: float = 0.15,
        timestamp_col: str = 'timestamp', stratify_by: Optional[str] = None,
    ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Chronological train prefix; stratified val/test over the future,
        restricted to users seen in train (splitting.py:103-160)."""
        if timestamp_col not in interactions_df.columns:
            raise ValueError(f"Timestamp column '{timestamp_col}' not found.")
        if stratify_by and stratify_by not in interactions_df.columns:
            raise ValueError(f"Stratification column '{stratify_by}' not found.")

        ordered = interactions_df.sort_values(timestamp_col).reset_index(drop=True)
        cut = int(len(ordered) * train_ratio)
        train_df = ordered.iloc[:cut]
        future = ordered.iloc[cut:]
        future = future[future['user_id'].isin(train_df['user_id'].unique())]
        if future.empty:
            raise ValueError(
                "No interactions left for validation/test after ensuring user overlap.")

        rel_test = test_ratio / (val_ratio + test_ratio)
        strat = future[stratify_by] if stratify_by else None
        try:
            val_df, test_df = train_test_split(
                future, test_size=rel_test, random_state=self.random_state,
                stratify=strat)
        except ValueError as e:
            print(f"Warning: Stratified split failed: {e}. Falling back to random split.")
            val_df, test_df = train_test_split(
                future, test_size=rel_test, random_state=self.random_state)

        cols = ['user_id', 'item_id', 'timestamp']
        return train_df[cols], val_df[cols], test_df[cols]

    # ----------------------------------------------------------- 2-way splits
    def user_based_split(
        self, interactions_df: pd.DataFrame,
        train_ratio: float = 0.8, min_interactions_per_user: int = 5,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Disjoint-user split (user cold-start; splitting.py:163-203)."""
        counts = interactions_df['user_id'].value_counts()
        valid = counts[counts >= min_interactions_per_user].index
        if len(valid) == 0:
            raise ValueError(
                f"No users have >= {min_interactions_per_user} interactions")
        df = interactions_df[interactions_df['user_id'].isin(valid)]
        train_users, val_users = train_test_split(
            np.asarray(df['user_id'].unique()), train_size=train_ratio,
            random_state=self.random_state)
        return (df[df['user_id'].isin(train_users)],
                df[df['user_id'].isin(val_users)])

    def item_based_split(
        self, interactions_df: pd.DataFrame,
        train_ratio: float = 0.8, min_interactions_per_item: int = 3,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Disjoint-item split (item cold-start; splitting.py:205-245)."""
        counts = interactions_df['item_id'].value_counts()
        valid = counts[counts >= min_interactions_per_item].index
        if len(valid) == 0:
            raise ValueError(
                f"No items have >= {min_interactions_per_item} interactions")
        df = interactions_df[interactions_df['item_id'].isin(valid)]
        train_items, val_items = train_test_split(
            np.asarray(df['item_id'].unique()), train_size=train_ratio,
            random_state=self.random_state)
        return (df[df['item_id'].isin(train_items)],
                df[df['item_id'].isin(val_items)])

    def temporal_split(
        self, interactions_df: pd.DataFrame,
        timestamp_col: str = 'timestamp', train_ratio: float = 0.8,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Older prefix for train, newer suffix for val (splitting.py:247-280)."""
        if timestamp_col not in interactions_df.columns:
            raise ValueError(f"Timestamp column '{timestamp_col}' not found")
        ordered = interactions_df.sort_values(timestamp_col)
        cut = int(len(ordered) * train_ratio)
        return ordered.iloc[:cut], ordered.iloc[cut:]

    def leave_one_out_split(
        self, interactions_df: pd.DataFrame,
    ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Last interaction per user → test, penultimate → val, rest → train.

        Users with <3 interactions go entirely to train (splitting.py:282-337).
        Vectorized: a grouped reverse-rank replaces the per-user loop.
        """
        if 'timestamp' not in interactions_df.columns:
            raise ValueError(
                "The 'latest' strategy for leave-one-out requires a 'timestamp' column.")

        ordered = interactions_df.sort_values(by=['user_id', 'timestamp'])
        grp = ordered.groupby('user_id')['user_id']
        size = grp.transform('size').to_numpy()
        # Position from the end within each user's history: 0 = most recent.
        rev_rank = (size - 1 - grp.cumcount()).to_numpy()

        eligible = size >= 3
        test_mask = eligible & (rev_rank == 0)
        val_mask = eligible & (rev_rank == 1)
        train_mask = ~(test_mask | val_mask)

        return (ordered[train_mask].reset_index(drop=True),
                ordered[val_mask].reset_index(drop=True),
                ordered[test_mask].reset_index(drop=True))

    def stratified_split(
        self, interactions_df: pd.DataFrame,
        train_ratio: float = 0.8, min_interactions_per_user: int = 3,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Per-user stratified split: each eligible user's history is divided
        train/val by ratio; ineligible users go entirely to train
        (splitting.py:339-411). Vectorized via a seeded within-user shuffle."""
        size = interactions_df.groupby('user_id')['user_id'].transform('size')
        eligible = size >= min_interactions_per_user
        n_eligible_users = interactions_df.loc[eligible, 'user_id'].nunique()
        print(f"Stratified split: Processing "
              f"{interactions_df['user_id'].nunique()} users...")
        print(f"Users with >= {min_interactions_per_user} interactions: "
              f"{n_eligible_users}")

        if n_eligible_users == 0:
            print(f"Warning: No users have >= {min_interactions_per_user} "
                  "interactions. Using simple random split instead.")
            return self.simple_random_split(interactions_df, train_ratio)

        df = interactions_df.copy()
        rng = np.random.default_rng(self.random_state)
        df['_shuffle_key'] = rng.random(len(df))
        order = df.sort_values(['user_id', '_shuffle_key'])
        grp = order.groupby('user_id')['user_id']
        rank = grp.cumcount().to_numpy()
        usize = grp.transform('size').to_numpy()
        # n_train per user: at least 1, at most size-1 (reference :382-383).
        n_train = np.clip((usize * train_ratio).astype(int), 1, usize - 1)
        is_train = rank < n_train
        elig = usize >= min_interactions_per_user

        train_df = order[(elig & is_train) | ~elig].drop(columns=['_shuffle_key'])
        val_df = order[elig & ~is_train].drop(columns=['_shuffle_key'])
        return (train_df.reset_index(drop=True), val_df.reset_index(drop=True))

    def simple_random_split(
        self, interactions_df: pd.DataFrame, train_ratio: float = 0.8,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Uniform random split with no disjointness guarantees
        (splitting.py:413-438)."""
        train_df = interactions_df.sample(frac=train_ratio,
                                          random_state=self.random_state)
        return train_df, interactions_df.drop(train_df.index)

    # ------------------------------------------------------------- cold-start
    def mixed_split(
        self, interactions_df: pd.DataFrame,
        cold_user_ratio: float = 0.1, cold_item_ratio: float = 0.1,
        train_ratio: float = 0.8,
    ) -> Dict[str, pd.DataFrame]:
        """Warm/cold × warm/cold validation sets keyed by activity quantiles
        (splitting.py:440-500)."""
        u_act = interactions_df.groupby('user_id').size()
        i_act = interactions_df.groupby('item_id').size()
        u_thresh = u_act.quantile(cold_user_ratio)
        i_thresh = i_act.quantile(cold_item_ratio)
        cold_u, warm_u = u_act[u_act <= u_thresh].index, u_act[u_act > u_thresh].index
        cold_i, warm_i = i_act[i_act <= i_thresh].index, i_act[i_act > i_thresh].index

        def subset(users, items):
            return interactions_df[
                interactions_df['user_id'].isin(users)
                & interactions_df['item_id'].isin(items)]

        warm_warm = subset(warm_u, warm_i)
        if len(warm_warm) > 0:
            train_df, val_warm = self.stratified_split(warm_warm, train_ratio)
        else:
            train_df, val_warm = self.simple_random_split(interactions_df, train_ratio)

        return {
            'train': train_df,
            'val_warm': val_warm,
            'val_cold_user': subset(cold_u, warm_i),
            'val_cold_item': subset(warm_u, cold_i),
            'val_cold_both': subset(cold_u, cold_i),
        }

    # -------------------------------------------------------------- reporting
    def get_split_statistics(
        self, train_df: pd.DataFrame, val_df: pd.DataFrame,
        test_df: Optional[pd.DataFrame] = None,
    ) -> Dict[str, object]:
        """Interaction/user/item counts and train↔val(/test) overlap ratios
        (splitting.py:502-551)."""
        tu, ti = set(train_df['user_id'].unique()), set(train_df['item_id'].unique())
        vu, vi = set(val_df['user_id'].unique()), set(val_df['item_id'].unique())
        stats = {
            'train_interactions': len(train_df),
            'val_interactions': len(val_df),
            'train_users': len(tu), 'train_items': len(ti),
            'val_users': len(vu), 'val_items': len(vi),
            'user_overlap_val': len(tu & vu),
            'item_overlap_val': len(ti & vi),
            'user_overlap_ratio_val': len(tu & vu) / len(vu) if vu else 0,
            'item_overlap_ratio_val': len(ti & vi) / len(vi) if vi else 0,
        }
        if test_df is not None:
            su, si = set(test_df['user_id'].unique()), set(test_df['item_id'].unique())
            stats.update({
                'test_interactions': len(test_df),
                'test_users': len(su), 'test_items': len(si),
                'user_overlap_test': len(tu & su),
                'item_overlap_test': len(ti & si),
                'user_overlap_ratio_test': len(tu & su) / len(su) if su else 0,
                'item_overlap_ratio_test': len(ti & si) / len(si) if si else 0,
            })
        return stats


# Strategy name -> (method name, accepted kwargs). Mirrors the factory's
# per-strategy kwarg whitelisting (reference splitting.py:554-617).
_STRATEGIES = {
    'stratified_by_column': ('column_stratified_split',
                             ('train_ratio', 'val_ratio', 'test_ratio', 'stratify_by')),
    'stratified_temporal': ('stratified_temporal_split',
                            ('train_ratio', 'val_ratio', 'test_ratio',
                             'timestamp_col', 'stratify_by')),
    'user': ('user_based_split', ('train_ratio', 'min_interactions_per_user')),
    'item': ('item_based_split', ('train_ratio', 'min_interactions_per_item')),
    'temporal': ('temporal_split', ('timestamp_col', 'train_ratio')),
    'stratified': ('stratified_split', ('train_ratio', 'min_interactions_per_user')),
    'leave_one_out': ('leave_one_out_split', ()),
    'simple_random': ('simple_random_split', ('train_ratio',)),
}


def create_robust_splits(
    interactions_df: pd.DataFrame, split_strategy: str = 'stratified', **kwargs,
) -> Union[Tuple[pd.DataFrame, pd.DataFrame],
           Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]]:
    """Factory dispatching to a named strategy with kwarg whitelisting."""
    if split_strategy not in _STRATEGIES:
        raise ValueError(
            f"Unknown split strategy: {split_strategy}. Available options: "
            "'user', 'item', 'temporal', 'stratified', 'leave_one_out', "
            "'simple_random', 'stratified_temporal'")
    splitter = DataSplitter(random_state=kwargs.get('random_state', 42))
    method_name, allowed = _STRATEGIES[split_strategy]
    call_kwargs = {k: v for k, v in kwargs.items() if k in allowed}
    return getattr(splitter, method_name)(interactions_df, **call_kwargs)
