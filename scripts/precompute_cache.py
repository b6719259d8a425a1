#!/usr/bin/env python
"""Feature/embedding precompute entry point.

Parity target: /root/reference/scripts/precompute_cache.py:28-154, upgraded
per BASELINE.json's north star: where the reference caches *preprocessed
inputs* (pixel tensors + token ids) one item at a time on the CPU, this
precompute packs those input tables in one vectorized pass AND — when encoder
weights are available — runs batched, mesh-sharded encoder forwards to
produce item *embedding* tables (vision_emb / language_emb / clip_text_emb),
which is what frozen-encoder training and full-catalog scoring consume.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
from pixelrec_multimodal_tpu.data.processors import NumericalProcessor


def precompute_features_cache(config: Config, force_recompute: bool = False,
                              max_items: int = None,
                              skip_encoders: bool = False,
                              mesh=None):
    """Pack feature tables (+ encoder embedding tables when possible)."""
    start = time.time()
    item_info = pd.read_csv(config.data.processed_item_info_path)
    if max_items:
        item_info = item_info.iloc[:max_items].copy()
        print(f"Limiting to first {max_items} items (--max_items)")

    # Dummy single interaction: the dataset only needs the catalog
    # (reference precompute_cache.py:92-110).
    dummy = pd.DataFrame({
        'user_id': ['precompute_user'],
        'item_id': [str(item_info.iloc[0]['item_id'])],
    })

    numerical_processor = NumericalProcessor()
    scaler = None
    feature_cols = [c for c in config.data.numerical_features_cols
                    if c in item_info.columns]
    if Path(config.data.scaler_path).exists():
        numerical_processor.load_scaler(Path(config.data.scaler_path))
        scaler = numerical_processor.scaler

    cache_dir = config.data.cache_config.cache_directory
    dataset = MultimodalDataset(
        interactions_df=dummy,
        item_info_df=item_info,
        image_folder=(config.data.processed_image_destination_folder
                      or config.data.image_folder),
        vision_model_name=config.model.vision_model,
        language_model_name=config.model.language_model,
        create_negative_samples=False,
        numerical_feat_cols=feature_cols,
        categorical_feat_cols=config.data.categorical_features_cols,
        numerical_scaler=scaler,
        numerical_normalization_method=config.data.numerical_normalization_method,
        cache_features=True,
        cache_dir=cache_dir,
        cache_to_disk=False)

    store = dataset.feature_store
    if not force_recompute and store.load_tables(cache_dir):
        print("Existing packed tables found and loaded "
              "(--force_recompute to rebuild).")
    n_tables = len(store.tables)
    print(f"Packed {n_tables} input tables for {store.n_items} items "
          f"in {time.time() - start:.1f}s: {sorted(store.tables)}")

    # --- encoder embedding tables (sharded batched forwards)
    if not skip_encoders and (config.model.vision_model
                              or config.model.language_model):
        try:
            from pixelrec_multimodal_tpu.encoders.precompute import (
                precompute_embedding_tables)
            t0 = time.time()
            added = precompute_embedding_tables(store, config, mesh=mesh)
            if added:
                print(f"Computed embedding tables {added} in "
                      f"{time.time() - t0:.1f}s")
        except ImportError:
            print("Encoder zoo not available; input tables only.")
        except Exception as e:
            print(f"Warning: encoder embedding precompute failed: {e}")
            print("Input tables are packed; embeddings can be recomputed "
                  "later.")

    store.save(cache_dir)
    rate = store.n_items / max(time.time() - start, 1e-9)
    print(f"Done: {store.n_items} items in {time.time() - start:.1f}s "
          f"({rate:,.0f} items/sec)")
    return store


def main(cli_args=None):
    parser = argparse.ArgumentParser(
        description='Precompute the item feature/embedding tables')
    parser.add_argument('--config', type=str, required=True,
                        help='Path to the configuration file.')
    parser.add_argument('--force_recompute', action='store_true',
                        help='Force recomputation of all items, overwriting '
                             'existing cache.')
    parser.add_argument('--max_items', type=int, default=None,
                        help='Limit the number of items to process '
                             '(for testing).')
    parser.add_argument('--skip_encoders', action='store_true',
                        help='Pack input tables only; skip encoder forwards.')
    parser.add_argument('--data_parallel', type=int, default=None,
                        help='Mesh data-axis size for the batched encoder '
                             'forwards (default: all devices)')
    parser.add_argument('--model_parallel', type=int, default=1,
                        help='Mesh model-axis size')
    parser.add_argument('--device', type=str, default=None,
                        help="JAX platform to use (e.g. 'cpu'); same flag "
                             'as train.py/evaluate.py')
    args = parser.parse_args(cli_args)
    if args.device and args.device not in ('tpu', 'auto', 'cuda'):
        import jax
        try:
            jax.config.update('jax_platforms', args.device)
        except Exception as e:
            print(f"Warning: could not select platform '{args.device}': {e}")
    config = Config.from_yaml(args.config)
    from pixelrec_multimodal_tpu.parallel import mesh_from_flags
    mesh = mesh_from_flags(args.data_parallel, args.model_parallel)
    if mesh is not None:
        print(f"Device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    precompute_features_cache(config, force_recompute=args.force_recompute,
                              max_items=args.max_items,
                              skip_encoders=args.skip_encoders,
                              mesh=mesh)


if __name__ == '__main__':
    main()
