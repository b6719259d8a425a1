#!/usr/bin/env python
"""Data splitting entry point.

Parity target: /root/reference/scripts/create_splits.py:19-115 — load
processed interactions, activity-filter, merge the stratification column from
item metadata when absent, dispatch ``create_robust_splits``, write
train/val[/test].csv into the split directory, print overlap statistics.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
import yaml

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.processors import DataFilter
from pixelrec_multimodal_tpu.data.splitting import (
    DataSplitter,
    create_robust_splits,
)


def main(config_path: str):
    cfg = Config.from_yaml(config_path)
    try:
        interactions_df = pd.read_csv(cfg.data.processed_interactions_path)
    except FileNotFoundError:
        print(f"Error: Processed interactions file not found at "
              f"{cfg.data.processed_interactions_path}")
        return

    min_user = cfg.data.splitting.min_interactions_per_user
    min_item = cfg.data.splitting.min_interactions_per_item
    print("Filtering data by minimum interactions...")
    filtered = DataFilter.filter_by_activity(
        interactions_df, min_user_interactions=min_user,
        min_item_interactions=min_item)
    if filtered.empty:
        print("No data left after filtering. Please check your interaction "
              "thresholds.")
        return

    # Merge the stratification column from item_info when missing
    # (reference create_splits.py:49-75).
    stratify_col = cfg.data.splitting.stratify_by
    if stratify_col and stratify_col not in filtered.columns:
        print(f"Stratification column '{stratify_col}' not in interactions, "
              "attempting to merge from item info.")
        try:
            item_info_path = Path(cfg.data.processed_item_info_path)
            if not item_info_path.exists():
                raise FileNotFoundError(
                    f"Processed item info file not found at {item_info_path}")
            item_info = pd.read_csv(item_info_path)
            if stratify_col in item_info.columns:
                filtered = pd.merge(
                    filtered, item_info[['item_id', stratify_col]],
                    on='item_id', how='left')
                print(f"Successfully merged '{stratify_col}' from item info "
                      "for stratification.")
                if filtered[stratify_col].isnull().any():
                    print(f"Warning: Null values are present in "
                          f"'{stratify_col}' after merge.")
            else:
                print(f"Warning: Stratification column '{stratify_col}' not "
                      f"in '{item_info_path}'. Proceeding without "
                      "stratification.")
                cfg.data.splitting.stratify_by = None
        except Exception as e:
            print(f"Warning: Could not merge stratification column "
                  f"'{stratify_col}' due to an error: {e}. Proceeding "
                  "without stratification.")
            cfg.data.splitting.stratify_by = None

    splits = create_robust_splits(
        filtered,
        split_strategy=cfg.data.splitting.strategy,
        random_state=cfg.data.splitting.random_state,
        train_ratio=cfg.data.splitting.train_final_ratio,
        val_ratio=cfg.data.splitting.val_final_ratio,
        test_ratio=cfg.data.splitting.test_final_ratio,
        stratify_by=cfg.data.splitting.stratify_by,
        min_interactions_per_user=min_user,
        min_interactions_per_item=min_item)

    output_dir = Path(cfg.data.split_data_path)
    output_dir.mkdir(parents=True, exist_ok=True)
    splitter = DataSplitter(random_state=cfg.data.splitting.random_state)

    if len(splits) == 3:
        train_df, val_df, test_df = splits
        test_df.to_csv(output_dir / 'test.csv', index=False)
        stats = splitter.get_split_statistics(train_df, val_df, test_df)
    else:
        train_df, val_df = splits
        stats = splitter.get_split_statistics(train_df, val_df)
    train_df.to_csv(output_dir / 'train.csv', index=False)
    val_df.to_csv(output_dir / 'val.csv', index=False)

    print("\nSplit Statistics:")
    print(yaml.dump(stats, sort_keys=False))


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description="Create data splits for the recommender system.")
    parser.add_argument('--config', type=str, required=True,
                        help='Path to the configuration file.')
    args = parser.parse_args()
    main(args.config)
