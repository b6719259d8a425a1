#!/usr/bin/env python
"""Offline preprocessing pipeline.

Parity target: /root/reference/scripts/preprocess_data.py:29-529 — the 11-step
pipeline: load + NaN-fill, text cleaning, image validation/compression,
valid-item filtering, activity filtering, item-info alignment, rare-tag
grouping, scaler fitting, CSV persistence, optional feature packing, summary.
The "feature caching" step packs the device-resident feature tables
(data/feature_store.py) instead of the reference's stale per-item processor.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.processors import (
    DataFilter,
    ImageProcessor,
    NumericalProcessor,
    TextProcessor,
)

TEXT_COLUMNS = ['title', 'tag', 'description']


class PreprocessingPipeline:
    """Orchestrates the offline preprocessing workflow."""

    def __init__(self, config: Config):
        self.config = config
        self.data_config = config.data
        self.image_processor = ImageProcessor(
            compression_config=config.data.image_compression_config,
            validation_config=config.data.image_validation_config)
        self.text_processor = TextProcessor(
            cleaning_config=config.data.text_cleaning_config)
        self.numerical_processor = NumericalProcessor()
        self.data_filter = DataFilter()
        self.text_columns = list(TEXT_COLUMNS)

    def run_full_pipeline(self):
        print("=" * 60)
        print("Starting Preprocessing Pipeline")
        print("=" * 60)

        print("\n1. Loading raw data...")
        item_info_df, interactions_df = self._load_raw_data()

        print("\n2. Cleaning text data...")
        item_info_df = self._clean_text_data(item_info_df)

        print("\n3. Processing and validating images...")
        valid_item_ids = self._process_images(item_info_df)
        if not valid_item_ids:
            print("ERROR: No valid items after image processing!")
            sys.exit(1)

        print("\n4. Filtering data by valid items...")
        item_info_df, interactions_df = self._filter_by_valid_items(
            item_info_df, interactions_df, valid_item_ids)

        print("\n5. Filtering by activity levels...")
        interactions_df = self.data_filter.filter_by_activity(
            interactions_df,
            min_user_interactions=self.data_config.splitting.min_interactions_per_user,
            min_item_interactions=self.data_config.splitting.min_interactions_per_item)
        if interactions_df.empty:
            print("ERROR: No interactions remaining after filtering!")
            sys.exit(1)

        print("\n6. Aligning item info with interactions...")
        item_info_df = self.data_filter.align_item_info_with_interactions(
            item_info_df, interactions_df)

        print("\n7. Grouping rare tags...")
        item_info_df = self._group_rare_tags(item_info_df)

        print("\n8. Processing numerical features...")
        self._process_numerical_features(item_info_df)

        print("\n9. Saving processed data...")
        self._save_processed_data(item_info_df, interactions_df)

        print("\n10. Packing feature tables...")
        self._pack_feature_tables_if_enabled(item_info_df)

        self._print_summary(item_info_df, interactions_df)
        print("\n" + "=" * 60)
        print("Preprocessing Pipeline Completed Successfully!")
        print("=" * 60)

    # ------------------------------------------------------------------ steps
    def _load_raw_data(self):
        item_info_df = pd.read_csv(self.data_config.item_info_path)
        item_info_df['item_id'] = item_info_df['item_id'].astype(str)
        interactions_df = pd.read_csv(self.data_config.interactions_path)
        interactions_df['item_id'] = interactions_df['item_id'].astype(str)
        interactions_df['user_id'] = interactions_df['user_id'].astype(str)

        print("\nChecking for NaN values in numerical columns...")
        for col in self.data_config.numerical_features_cols:
            if col in item_info_df.columns:
                nan_count = int(item_info_df[col].isna().sum())
                if nan_count > 0:
                    print(f"WARNING: {nan_count} NaN values found in "
                          f"column '{col}'")
                    item_info_df[col] = item_info_df[col].fillna(0)
                    print(f"Filled NaN values in '{col}' with 0")
        print(f"Loaded {len(item_info_df)} items and "
              f"{len(interactions_df)} interactions")
        return item_info_df, interactions_df

    def _clean_text_data(self, item_info_df: pd.DataFrame) -> pd.DataFrame:
        if 'tag' in item_info_df.columns:
            print("Cleaning 'tag' column: Filling NaN with 'unknown'.")
            item_info_df['tag'] = \
                item_info_df['tag'].fillna('unknown').astype(str)
        return self.text_processor.clean_dataframe_text_columns(
            item_info_df, self.text_columns)

    def _process_images(self, item_info_df: pd.DataFrame) -> set:
        return self.image_processor.process_items_images(
            item_info_df['item_id'].astype(str).tolist(),
            Path(self.data_config.image_folder),
            Path(self.data_config.processed_image_destination_folder))

    def _filter_by_valid_items(self, item_info_df, interactions_df,
                               valid_item_ids):
        before = len(item_info_df)
        item_info_df = item_info_df[
            item_info_df['item_id'].astype(str).isin(valid_item_ids)].copy()
        print(f"Item info filtering: {len(item_info_df)} items remaining "
              f"out of {before}")
        interactions_df = self.data_filter.filter_interactions_by_valid_items(
            interactions_df, valid_item_ids)
        return item_info_df, interactions_df

    def _group_rare_tags(self, item_info_df: pd.DataFrame) -> pd.DataFrame:
        """Tags below the configured threshold collapse into 'rare_tag'
        (reference preprocess_data.py:445-483)."""
        threshold = getattr(self.data_config.splitting,
                            'tag_grouping_threshold', None)
        if threshold is None:
            print("tag_grouping_threshold not set in config. "
                  "Skipping tag grouping.")
            return item_info_df
        threshold = int(threshold)
        print(f"Grouping tags that appear less than {threshold} times.")
        counts = item_info_df['tag'].value_counts()
        rare = counts[counts < threshold].index
        if len(rare) > 0:
            item_info_df.loc[item_info_df['tag'].isin(rare), 'tag'] = 'rare_tag'
            print(f"Grouped {len(rare)} rare tags into a single "
                  "'rare_tag' category.")
        else:
            print("No rare tags found below the threshold.")
        return item_info_df

    def _process_numerical_features(self, item_info_df: pd.DataFrame):
        cols = self.data_config.numerical_features_cols
        method = self.data_config.numerical_normalization_method
        scaler_path = Path(self.data_config.scaler_path)
        if not cols:
            print("No numerical columns specified. Skipping scaler processing.")
            return
        for col in cols:
            if col in item_info_df.columns:
                item_info_df[col] = item_info_df[col].fillna(0)
        if method != 'none':
            if scaler_path.exists():
                print(f"Loading existing scaler from {scaler_path}")
                self.numerical_processor.load_scaler(scaler_path)
            else:
                print(f"Fitting new scaler with method: {method}")
                present = [c for c in cols if c in item_info_df.columns]
                self.numerical_processor.fit_scaler(item_info_df, present,
                                                    method)
                self.numerical_processor.save_scaler(scaler_path)
        print(f"Scaler info: {self.numerical_processor.get_scaler_info()}")

    def _save_processed_data(self, item_info_df, interactions_df):
        item_path = Path(self.data_config.processed_item_info_path)
        inter_path = Path(self.data_config.processed_interactions_path)
        item_path.parent.mkdir(parents=True, exist_ok=True)
        inter_path.parent.mkdir(parents=True, exist_ok=True)
        print(f"Saving processed item info to: {item_path}")
        item_info_df.to_csv(item_path, index=False)
        print(f"Saving processed interactions to: {inter_path}")
        interactions_df.to_csv(inter_path, index=False)

    def _pack_feature_tables_if_enabled(self, item_info_df: pd.DataFrame):
        """Pack cheap-modal feature tables to the disk tier when enabled.

        Replaces the reference's broken FeatureCacheProcessor path
        (preprocess_data.py:364-415) with the intended batch precompute:
        catalog-aligned token/tag/numerical tables written as one .npz.
        """
        if not self.data_config.cache_config.enabled or \
                not self.data_config.cache_config.use_disk:
            print("Feature table packing not enabled "
                  "(cache_config.use_disk=False). Skipping.")
            return
        try:
            from sklearn.preprocessing import LabelEncoder
            from pixelrec_multimodal_tpu.data.feature_store import (
                ItemFeatureStore)
            item_encoder = LabelEncoder().fit(
                item_info_df['item_id'].astype(str).unique())
            tag_encoder = None
            if 'tag' in item_info_df.columns:
                tag_encoder = LabelEncoder().fit(
                    item_info_df['tag'].fillna('unknown').astype(str))
            store = ItemFeatureStore.build(
                item_info_df, item_encoder, tag_encoder=tag_encoder,
                vision_model=self.config.model.vision_model,
                language_model=self.config.model.language_model,
                image_folder=str(
                    self.data_config.processed_image_destination_folder),
                numerical_processor=self.numerical_processor)
            store.save(self.data_config.cache_config.cache_directory)
            print("Feature tables packed to "
                  f"{self.data_config.cache_config.cache_directory}")
        except Exception as e:
            print(f"Error during feature packing: {e}")
            print("Continuing without packed feature tables...")

    def _print_summary(self, item_info_df, interactions_df):
        scaler_type = (self.numerical_processor.get_scaler_info()['scaler_type']
                       if self.numerical_processor.scaler else 'None')
        print(f"""
            Preprocessing Summary:
            ---------------------
            Final item count: {len(item_info_df)}
            Final interaction count: {len(interactions_df)}
            Unique users: {interactions_df['user_id'].nunique()}
            Unique items in interactions: {interactions_df['item_id'].nunique()}
            Processed images directory: {self.data_config.processed_image_destination_folder}
            Numerical scaler: {scaler_type}
        """)


def main(cli_args: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(
        description="Modular data preprocessing pipeline")
    parser.add_argument('--config', type=str,
                        default='configs/simple_config.yaml',
                        help='Path to configuration file')
    parser.add_argument('--skip-caching', action='store_true',
                        help='Skip feature caching step')
    parser.add_argument('--force-reprocess', action='store_true',
                        help='Force reprocessing of all images and features')
    args = parser.parse_args(cli_args)

    config = Config.from_yaml(args.config)
    print(f"Loaded configuration from: {args.config}")
    if args.skip_caching:
        config.data.cache_config.use_disk = False
        print("Feature caching disabled by --skip-caching flag")
    PreprocessingPipeline(config).run_full_pipeline()


if __name__ == '__main__':
    main()
