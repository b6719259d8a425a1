#!/usr/bin/env python
"""Top-K recommendation generation entry point.

Parity target: /root/reference/scripts/generate_recommendations.py:28-310 —
load model + data + encoders, resolve target users (CLI list / file / random
sample / first-5 default), generate per-user top-K with filter-seen, write a
JSON report. The generation itself is one batched device pass over all
requested users. The ``--use_diversity`` branch is actually implemented here
(MMR reranking); the reference only advertises it and silently falls back
(:192-212).
"""
from __future__ import annotations

import argparse
import pickle
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
from pixelrec_multimodal_tpu.data.processors import NumericalProcessor
from pixelrec_multimodal_tpu.inference import Recommender
from pixelrec_multimodal_tpu.models import build_model
from pixelrec_multimodal_tpu.utils.checkpointing import load_checkpoint
from pixelrec_multimodal_tpu.utils.logging import dump_json

from evaluate import find_encoders, find_model_checkpoint  # noqa: E402


def cascade_arg(v: str):
    """--cascade accepts an explicit candidate count or 'auto'."""
    return 'auto' if v == 'auto' else int(v)


def load_model_and_data(config: Config, checkpoint_name: str = 'best_model',
                        mesh=None, precision: str = 'bf16',
                        cascade=None,
                        cascade_screen: str = 'additive',
                        cascade_recall: float = 1.0,
                        cascade_c1=None):
    """Rebuild the dataset + model from artifacts
    (reference generate_recommendations.py:76-158)."""
    item_info = pd.read_csv(config.data.processed_item_info_path)
    interactions = pd.read_csv(config.data.processed_interactions_path)

    numerical_processor = NumericalProcessor()
    scaler = None
    feature_cols = config.data.numerical_features_cols
    if Path(config.data.scaler_path).exists():
        numerical_processor.load_scaler(Path(config.data.scaler_path))
        scaler = numerical_processor.scaler
        if numerical_processor.fitted_columns is not None:
            feature_cols = list(numerical_processor.fitted_columns)
    feature_cols = [c for c in feature_cols if c in item_info.columns]

    encoders = find_encoders(config)
    dataset = MultimodalDataset(
        interactions_df=interactions,
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
        user_encoder=encoders.get('user_encoder') if encoders else None,
        item_encoder=encoders.get('item_encoder') if encoders else None,
        tag_encoder=encoders.get('tag_encoder') if encoders else None)

    model = build_model(config.model, dataset.n_users, dataset.n_items,
                        dataset.n_tags,
                        num_numerical_features=len(feature_cols))
    ckpt = find_model_checkpoint(config, checkpoint_name)
    if ckpt is None:
        raise FileNotFoundError(
            f"No model checkpoint found under {config.checkpoint_dir}")
    print(f"Loading checkpoint: {ckpt}")
    restored = load_checkpoint(ckpt.parent, ckpt.name)
    variables = {'params': restored['state']['params']}
    if 'batch_stats' in restored['state']:
        variables['batch_stats'] = restored['state']['batch_stats']
    return (Recommender(model, variables, dataset, mesh=mesh,
                        precision=precision,
                        cascade_candidates=cascade,
                        cascade_screen=cascade_screen,
                        cascade_recall=cascade_recall,
                        cascade_c1=cascade_c1), dataset)


def resolve_users(args, dataset) -> list:
    """CLI list > file > random sample > first 5 (reference :271-284)."""
    if args.users:
        return [str(u) for u in args.users]
    if args.user_file:
        with open(args.user_file) as f:
            return [line.strip() for line in f if line.strip()]
    all_users = [str(u) for u in dataset.user_encoder.classes_]
    if args.sample_users:
        rng = np.random.default_rng(42)
        n = min(args.sample_users, len(all_users))
        return list(rng.choice(all_users, size=n, replace=False))
    return all_users[:5]


def main(cli_args=None):
    parser = argparse.ArgumentParser(
        description='Generate top-K recommendations')
    parser.add_argument('--config', type=str,
                        default='configs/simple_config.yaml',
                        help='Path to configuration file.')
    parser.add_argument('--users', type=str, nargs='+',
                        help='A list of user IDs to generate recommendations '
                             'for.')
    parser.add_argument('--user_file', type=str,
                        help='Path to a file containing user IDs, one per '
                             'line.')
    parser.add_argument('--sample_users', type=int,
                        help='Number of random users to sample from the '
                             'dataset.')
    parser.add_argument('--use_diversity', action='store_true',
                        help='Use a diversity-aware recommendation algorithm.')
    parser.add_argument('--diversity_weight', type=float, default=0.3,
                        help='MMR trade-off: 0 = pure relevance, '
                             '1 = pure diversity (default 0.3).')
    parser.add_argument('--output', type=str, default='recommendations.json',
                        help='Name of the output JSON file.')
    parser.add_argument('--device', type=str, default=None,
                        help='JAX platform for inference.')
    parser.add_argument('--checkpoint_name', type=str, default='best_model',
                        help='Checkpoint to load.')
    parser.add_argument('--data_parallel', type=int, default=None,
                        help='Mesh data-axis size (default: all devices / '
                             'model_parallel)')
    parser.add_argument('--model_parallel', type=int, default=1,
                        help='Mesh catalog-axis size: shards the item '
                             'tables and full-catalog top-K over devices')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'int8', 'int8!'],
                        help='Scoring precision. int8 quantizes the fused '
                             'concat/gated head (calibrated); scores '
                             'are approximate — see BASELINE.md.')
    parser.add_argument('--cascade', type=cascade_arg, default=None,
                        metavar='C|auto',
                        help='Attention fusion only: two-stage cascaded '
                             'top-K — screen the catalog with a cheap '
                             'kernel, exact-rescore the top C candidates '
                             'per user. Returned scores are exact; top-K '
                             'equals the full scan whenever screen '
                             'recall@C covers it. "auto" calibrates C and '
                             'the screen tier on a user sample (measured '
                             'recall, falls back to the exact scan); an '
                             'explicit C must be calibrated against the '
                             'SELECTED --cascade_screen tier with '
                             'CatalogScorer.calibrate_cascade — a C '
                             'calibrated for token0 under-recalls on '
                             'additive.')
    parser.add_argument('--cascade_recall', type=float, default=1.0,
                        help='Recall target for --cascade auto: 1.0 '
                             '(default) = exact results only; < 1.0 '
                             'admits faster approximate screen tiers at '
                             'their measured recall envelope (e.g. the '
                             'additive tier measured 2.36x at 0.95).')
    parser.add_argument('--cascade_screen', type=str, default='additive',
                        choices=['additive', 'token0', 'funnel'],
                        help='Cascade screen tier for an explicit '
                             '--cascade C: additive (concat-kernel-rate '
                             'screen, weakest recall per C; operating '
                             'floor C>=max(16k,1024)), token0 (exact '
                             'user-token attention row, stronger recall '
                             'per C), or funnel (3-stage: additive to '
                             '--cascade_c1 survivors, token0 candidate '
                             'screen to C, exact rescore — additive scan '
                             'rate at near-token0 recall; calibrate with '
                             'CatalogScorer.calibrate_funnel). Ignored '
                             'by --cascade auto, which picks the tier '
                             'from measured recall.')
    parser.add_argument('--cascade_c1', type=int, default=None,
                        help='Stage-1 survivor count for '
                             '--cascade_screen funnel (default 8*C, '
                             'floor 4096). The funnel recall is bounded '
                             'by the additive tier recall at this C1.')
    args = parser.parse_args(cli_args)
    if not 0.0 <= args.diversity_weight <= 1.0:
        parser.error(f"--diversity_weight must be in [0, 1], "
                     f"got {args.diversity_weight}")

    if args.device:
        import jax
        try:
            jax.config.update('jax_platforms', args.device)
        except Exception as e:
            print(f"Warning: could not select platform '{args.device}': {e}")

    from pixelrec_multimodal_tpu.parallel import mesh_from_flags
    mesh = mesh_from_flags(args.data_parallel, args.model_parallel)
    if mesh is not None:
        print(f"Device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    config = Config.from_yaml(args.config)
    recommender, dataset = load_model_and_data(config, args.checkpoint_name,
                                               mesh=mesh,
                                               precision=args.precision,
                                               cascade=args.cascade,
                                               cascade_screen=args.cascade_screen,
                                               cascade_recall=args.cascade_recall,
                                               cascade_c1=args.cascade_c1)
    users = resolve_users(args, dataset)
    print(f"Generating recommendations for {len(users)} users "
          f"(top_k={config.recommendation.top_k}, "
          f"filter_seen={config.recommendation.filter_seen})")

    if args.use_diversity:
        # The reference advertises this flag but never implemented it
        # (reference generate_recommendations.py:192-212, silent fallback);
        # here it is real: MMR reranking over the scorer's item
        # representations (inference/recommender.py).
        print(f"Using diversity-aware MMR reranking "
              f"(diversity_weight={args.diversity_weight})")
        recs = recommender.get_diverse_recommendations_batch(
            users, top_k=config.recommendation.top_k,
            diversity_weight=args.diversity_weight,
            filter_seen=config.recommendation.filter_seen)
    else:
        recs = recommender.get_recommendations_batch(
            users, top_k=config.recommendation.top_k,
            filter_seen=config.recommendation.filter_seen)

    output = {
        'metadata': {
            'generated_at': datetime.now().isoformat(),
            'config': args.config,
            'num_users': len(users),
            'top_k': config.recommendation.top_k,
            'filter_seen': config.recommendation.filter_seen,
            'use_diversity': args.use_diversity,
            'vision_model': config.model.vision_model,
            'language_model': config.model.language_model,
        },
        'recommendations': {
            u: [{'item_id': i, 'score': s} for i, s in items]
            for u, items in recs.items()
        },
    }
    out_path = Path(config.results_dir) / args.output \
        if not Path(args.output).is_absolute() else Path(args.output)
    dump_json(output, out_path)
    print(f"Recommendations saved to {out_path}")
    return output


if __name__ == '__main__':
    main()
