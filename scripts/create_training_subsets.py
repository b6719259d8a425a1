#!/usr/bin/env python
"""Create nested stratified training subsets for progressive HPO.

Parity target: /root/reference/scripts/create_training_subsets.py:13-121 —
nested 50% -> 20% -> 5% subsets stratified on 10 timestamp-quantile bins,
with a monthly-distribution drift verification (< 0.1).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from sklearn.model_selection import train_test_split

from pixelrec_multimodal_tpu.config import Config


def create_subsets(config_path: str):
    print("--- Creating Stratified Training Subsets for Hyperparameter "
          "Optimization ---")
    cfg = Config.from_yaml(config_path)
    full_train_path = Path(cfg.data.train_data_path)
    if not full_train_path.exists():
        print(f"Error: Full training file not found at {full_train_path}")
        print("Please run scripts/create_splits.py first.")
        return

    print(f"Loading full training data from: {full_train_path}")
    df_full = pd.read_csv(full_train_path)

    print("Binning timestamps for stratification...")
    df_full['timestamp'] = pd.to_datetime(df_full['timestamp'])
    df_full['time_bin'] = pd.qcut(df_full['timestamp'], q=10, labels=False,
                                  duplicates='drop')
    seed = cfg.data.splitting.random_state

    def strat_split(df, test_size):
        """Stratified split with a random fallback when bins are too sparse
        (same graceful degradation as the splitter's stratified paths)."""
        try:
            return train_test_split(df, test_size=test_size,
                                    random_state=seed,
                                    stratify=df['time_bin'])
        except ValueError as e:
            print(f"Warning: stratified split failed ({e}); "
                  "falling back to random split.")
            return train_test_split(df, test_size=test_size,
                                    random_state=seed)

    # Nested subsets: each smaller subset is drawn FROM the previous one so
    # 5% ⊂ 20% ⊂ 50% (reference :38-68).
    print("Creating 50% subset...")
    _, df_50 = strat_split(df_full, 0.5)
    print("Creating 20% subset (from the 50% subset)...")
    _, df_20 = strat_split(df_50, 0.4)
    print("Creating 5% subset (from the 20% subset)...")
    _, df_05 = strat_split(df_20, 0.25)

    splits_dir = full_train_path.parent
    paths = {}
    for frac, df in (('50', df_50), ('20', df_20), ('05', df_05)):
        path = splits_dir / f"train_{frac}_percent.csv"
        df.drop(columns=['time_bin']).to_csv(path, index=False)
        paths[frac] = path

    print("\n--- Subsets Created Successfully ---")
    print(f"Full training set size: {len(df_full)}")
    print(f"50% subset saved to: {paths['50']} (size: {len(df_50)})")
    print(f"20% subset saved to: {paths['20']} (size: {len(df_20)})")
    print(f"5% subset saved to: {paths['05']} (size: {len(df_05)})")

    # Verify monthly timestamp distribution drift (reference :93-114).
    print("\n--- Verifying Timestamp Stratification ---")
    full_dist = df_full['timestamp'].dt.to_period('M') \
        .value_counts(normalize=True).sort_index()
    sub = pd.to_datetime(pd.read_csv(paths['05'])['timestamp'])
    sub_dist = sub.dt.to_period('M').value_counts(normalize=True).sort_index()
    months = full_dist.index.union(sub_dist.index)
    diff = (full_dist.reindex(months, fill_value=0)
            - sub_dist.reindex(months, fill_value=0)).abs().sum()
    print(f"Absolute sum of differences in monthly timestamp distribution: "
          f"{diff:.4f}")
    if diff < 0.1:
        print("Timestamp stratification appears to be working correctly "
              "(difference is small).")
    else:
        print("Warning: Large difference in timestamp distribution, "
              "stratification might not be effective.")


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description="Create training data subsets for HPO.")
    parser.add_argument('--config', type=str, required=True,
                        help='Path to the main configuration file.')
    args = parser.parse_args()
    create_subsets(args.config)
