#!/usr/bin/env python
"""Rebuild and pickle user/item(/tag) LabelEncoders without training.

Parity target: /root/reference/scripts/extract_encoders.py:24-102 — fits
encoders on the full processed data and writes them to the shared encoders
directory.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset


def main(cli_args=None):
    parser = argparse.ArgumentParser(
        description='Extract user/item encoders from processed data')
    parser.add_argument('--config', type=str, required=True,
                        help='Path to the configuration file.')
    args = parser.parse_args(cli_args)
    config = Config.from_yaml(args.config)

    print("Loading processed data...")
    interactions = pd.read_csv(config.data.processed_interactions_path)
    item_info = pd.read_csv(config.data.processed_item_info_path)

    print("Fitting encoders on the full dataset...")
    dataset = MultimodalDataset(
        interactions_df=interactions,
        item_info_df=item_info,
        image_folder=(config.data.processed_image_destination_folder
                      or config.data.image_folder),
        vision_model_name=None,
        language_model_name=None,
        create_negative_samples=False,
        numerical_feat_cols=[],
        categorical_feat_cols=config.data.categorical_features_cols,
        cache_features=False)

    encoders_dir = Path(config.shared_encoders_dir)
    encoders_dir.mkdir(parents=True, exist_ok=True)
    with open(encoders_dir / 'user_encoder.pkl', 'wb') as f:
        pickle.dump(dataset.user_encoder, f)
    with open(encoders_dir / 'item_encoder.pkl', 'wb') as f:
        pickle.dump(dataset.item_encoder, f)
    if getattr(dataset, 'tag_encoder', None) is not None:
        with open(encoders_dir / 'tag_encoder.pkl', 'wb') as f:
            pickle.dump(dataset.tag_encoder, f)

    print(f"Encoders saved to {encoders_dir}")
    print(f"  users: {dataset.n_users:,}  items: {dataset.n_items:,}  "
          f"tags: {dataset.n_tags:,}")


if __name__ == '__main__':
    main()
