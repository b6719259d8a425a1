#!/usr/bin/env python
"""Evaluation entry point.

Parity target: /root/reference/scripts/evaluate.py:54-452 — checkpoint
discovery with fallbacks, encoder discovery, a recommender factory covering
the learned model and the four baselines, evaluator dispatch
(retrieval/ranking), and results + predictions JSON artifacts with a
numpy-safe encoder. Same CLI flags. The learned model path rebuilds the Flax
scorer with dropout 0 semantics (eval mode is inherent: train=False) and
scores through the batched device evaluator.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
from pixelrec_multimodal_tpu.data.processors import NumericalProcessor
from pixelrec_multimodal_tpu.evaluation.tasks import (
    create_evaluator,
    get_task_from_string,
)
from pixelrec_multimodal_tpu.inference import Recommender
from pixelrec_multimodal_tpu.inference.baseline_recommenders import (
    ItemKNNRecommender,
    PopularityRecommender,
    RandomRecommender,
    UserKNNRecommender,
)
from pixelrec_multimodal_tpu.models import build_model
from pixelrec_multimodal_tpu.utils.checkpointing import (
    find_checkpoint,
    load_checkpoint,
    normalize_checkpoint_name,
)
from pixelrec_multimodal_tpu.utils.logging import dump_json


def find_model_checkpoint(config: Config,
                          checkpoint_name: str = 'best_model'
                          ) -> Optional[Path]:
    """Locate a checkpoint with prioritized fallbacks
    (reference evaluate.py:54-110)."""
    name = normalize_checkpoint_name(checkpoint_name)
    candidates = [
        Path(config.model_specific_checkpoint_dir) / name,
        Path(config.model_specific_checkpoint_dir) / 'best_model',
        Path(config.model_specific_checkpoint_dir) / 'last_model',
        Path(config.checkpoint_dir) / name,
    ]
    for c in candidates:
        if (c / 'state').exists():
            return c
    found = find_checkpoint(config.model_specific_checkpoint_dir)
    if found is None:
        found = find_checkpoint(config.checkpoint_dir)
    return found


def find_encoders(config: Config):
    """Load pickled user/item(/tag) encoders with directory fallbacks
    (reference evaluate.py:113-167)."""
    search_dirs = [Path(config.shared_encoders_dir),
                   Path(config.checkpoint_dir),
                   Path(config.model_specific_checkpoint_dir)]
    encoders = {}
    for name in ('user_encoder', 'item_encoder', 'tag_encoder'):
        for d in search_dirs:
            p = d / f'{name}.pkl'
            if p.exists():
                with open(p, 'rb') as f:
                    encoders[name] = pickle.load(f)
                break
    if 'user_encoder' not in encoders or 'item_encoder' not in encoders:
        return None
    return encoders


def cascade_arg(v: str):
    """--cascade accepts an explicit candidate count or 'auto'."""
    return 'auto' if v == 'auto' else int(v)


def create_recommender(recommender_type: str, config: Config,
                       dataset: MultimodalDataset,
                       train_data: Optional[pd.DataFrame],
                       checkpoint_name: str = 'best_model', mesh=None,
                       precision: str = 'bf16',
                       cascade=None,
                       cascade_screen: str = 'additive',
                       cascade_recall: float = 1.0,
                       cascade_c1=None):
    """Factory for the 5 recommender types (reference evaluate.py:170-224)."""
    if recommender_type == 'multimodal':
        model = build_model(
            config.model, dataset.n_users, dataset.n_items, dataset.n_tags,
            num_numerical_features=len(dataset.numerical_feat_cols))
        ckpt = find_model_checkpoint(config, checkpoint_name)
        if ckpt is None:
            raise FileNotFoundError(
                f"No model checkpoint found under {config.checkpoint_dir}")
        print(f"Loading checkpoint: {ckpt}")
        restored = load_checkpoint(ckpt.parent, ckpt.name)
        state = restored['state']
        variables = {'params': state['params']}
        if 'batch_stats' in state:
            variables['batch_stats'] = state['batch_stats']
        return Recommender(model, variables, dataset, mesh=mesh,
                           precision=precision,
                           cascade_candidates=cascade,
                           cascade_screen=cascade_screen,
                           cascade_recall=cascade_recall,
                           cascade_c1=cascade_c1)

    history = train_data if train_data is not None else dataset.interactions
    if recommender_type == 'random':
        return RandomRecommender(dataset, history_interactions_df=history)
    if recommender_type == 'popularity':
        return PopularityRecommender(dataset, history_interactions_df=history)
    if recommender_type == 'item_knn':
        return ItemKNNRecommender(dataset, history_interactions_df=history)
    if recommender_type == 'user_knn':
        return UserKNNRecommender(dataset, history_interactions_df=history)
    raise ValueError(f"Unknown recommender type: {recommender_type}")


def main(cli_args=None):
    parser = argparse.ArgumentParser(description='Evaluate a recommender')
    parser.add_argument('--config', type=str,
                        default='configs/simple_config.yaml',
                        help='Path to configuration file')
    parser.add_argument('--test_data', type=str, required=True,
                        help='Path to test data CSV file')
    parser.add_argument('--train_data', type=str,
                        help='Path to training data CSV file for user history')
    parser.add_argument('--output', type=str,
                        default='evaluation_results.json',
                        help='Path to save evaluation results')
    parser.add_argument('--device', type=str, default=None,
                        help='JAX platform for evaluation')
    parser.add_argument('--recommender_type', type=str, default='multimodal',
                        choices=['multimodal', 'random', 'popularity',
                                 'item_knn', 'user_knn'],
                        help='Recommender to evaluate')
    parser.add_argument('--eval_task', type=str, default='retrieval',
                        choices=['retrieval', 'ranking'],
                        help='Evaluation task')
    parser.add_argument('--save_predictions', type=str, default=None,
                        help='Path to save user-level predictions')
    parser.add_argument('--warmup_recommender_cache', action='store_true',
                        help="Warm-up the Recommender's feature cache")
    parser.add_argument('--num_workers', type=int, default=1,
                        help='Number of parallel workers for evaluation')
    parser.add_argument('--use_sampling', action='store_true', default=True,
                        help='Use negative sampling for faster evaluation')
    parser.add_argument('--no_sampling', dest='use_sampling',
                        action='store_false',
                        help='Disable negative sampling (reference-parity '
                             'positives-only candidates; see '
                             'docs/evaluation.md)')
    parser.add_argument('--full_catalog', action='store_true',
                        help='Retrieval task: rank each user\'s top-K over '
                             'the ENTIRE catalog (blocked fused-scorer '
                             'top-K) instead of a sampled candidate set')
    parser.add_argument('--cascade', type=cascade_arg, default=None,
                        metavar='C|auto',
                        help='Attention fusion only: route full-catalog '
                             'top-K through the two-stage cascade (screen '
                             'top-C + exact rescore). "auto" calibrates C '
                             'and the tier on a user sample (measured '
                             'recall, exact-scan fallback); an explicit C '
                             'must be calibrated against the SELECTED '
                             '--cascade_screen tier with '
                             'CatalogScorer.calibrate_cascade.')
    parser.add_argument('--cascade_screen', type=str, default='additive',
                        choices=['additive', 'token0', 'funnel'],
                        help='Cascade screen tier for an explicit C '
                             '(ignored by auto; see '
                             'generate_recommendations.py --cascade_screen)')
    parser.add_argument('--cascade_c1', type=int, default=None,
                        help='Stage-1 survivor count for --cascade_screen '
                             'funnel (default 8*C, floor 4096)')
    parser.add_argument('--cascade_recall', type=float, default=1.0,
                        help='Recall target for --cascade auto: 1.0 '
                             '(default) = exact results only; < 1.0 '
                             'admits faster approximate screen tiers at '
                             'their measured recall envelope.')
    parser.add_argument('--num_negatives', type=int, default=20,
                        help='Number of negative samples per positive item')
    parser.add_argument('--sampling_strategy', type=str, default='random',
                        choices=['random', 'popularity', 'popularity_inverse'],
                        help='Negative sampling strategy')
    parser.add_argument('--checkpoint_name', type=str,
                        default='best_model.pth',
                        help='Name of checkpoint file to load')
    parser.add_argument('--data_parallel', type=int, default=None,
                        help='Mesh data-axis size (default: all devices / '
                             'model_parallel)')
    parser.add_argument('--model_parallel', type=int, default=1,
                        help='Mesh catalog-axis size: shards the item '
                             'tables and full-catalog top-K over devices')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'int8', 'int8!'],
                        help='Scoring precision for the multimodal '
                             'recommender. int8 quantizes the fused '
                             'concat/gated head (approximate scores; '
                             'see BASELINE.md).')
    args = parser.parse_args(cli_args)

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

    print(f"Loading test data from: {args.test_data}")
    test_data = pd.read_csv(args.test_data)
    train_data = None
    if args.train_data:
        print(f"Loading training data from: {args.train_data}")
        train_data = pd.read_csv(args.train_data)

    item_info = pd.read_csv(config.data.processed_item_info_path)
    all_interactions = pd.read_csv(config.data.processed_interactions_path)

    # Scaler-driven feature-column resolution (reference evaluate.py:273-286).
    numerical_processor = NumericalProcessor()
    feature_cols = config.data.numerical_features_cols
    scaler = None
    if Path(config.data.scaler_path).exists():
        numerical_processor.load_scaler(Path(config.data.scaler_path))
        scaler = numerical_processor.scaler
        if numerical_processor.fitted_columns is not None:
            feature_cols = list(numerical_processor.fitted_columns)
            print(f"Using scaler-fitted feature columns: {feature_cols}")
    feature_cols = [c for c in feature_cols if c in item_info.columns]

    encoders = find_encoders(config)
    dataset = MultimodalDataset(
        interactions_df=all_interactions,
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
        tag_encoder=encoders.get('tag_encoder') if encoders else None,
    )

    recommender = create_recommender(
        args.recommender_type, config, dataset, train_data,
        checkpoint_name=args.checkpoint_name, mesh=mesh,
        precision=args.precision, cascade=args.cascade,
        cascade_screen=args.cascade_screen,
        cascade_recall=args.cascade_recall,
        cascade_c1=args.cascade_c1)

    task = get_task_from_string(args.eval_task)
    evaluator = create_evaluator(
        task, recommender, test_data, config,
        use_sampling=args.use_sampling,
        num_negatives=args.num_negatives,
        sampling_strategy=args.sampling_strategy,
        full_catalog=args.full_catalog,
        num_workers=args.num_workers)

    results = evaluator.evaluate()
    evaluator.print_summary(results)

    predictions = results.pop('predictions', None)
    if args.save_predictions and predictions is not None:
        dump_json(predictions, args.save_predictions)
        print(f"Predictions saved to {args.save_predictions}")

    output_path = Path(args.output)
    if not output_path.is_absolute() and not output_path.parent.name:
        output_path = Path(config.results_dir) / output_path
    results['evaluation_metadata'] = {
        'recommender_type': args.recommender_type,
        'eval_task': args.eval_task,
        'use_sampling': args.use_sampling,
        'full_catalog': args.full_catalog,
        'num_negatives': args.num_negatives,
        'sampling_strategy': args.sampling_strategy,
        'test_data': args.test_data,
        'config': args.config,
    }
    dump_json(results, output_path)
    print(f"Results saved to {output_path}")
    return results


if __name__ == '__main__':
    main()
