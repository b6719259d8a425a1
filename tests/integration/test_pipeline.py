"""End-to-end script pipeline integration test.

Mirrors the reference's integration strategy (tests/integration/scripts/*):
drives each script's main() with fake argv inside a self-built temp workspace
(synthetic CSVs, generated JPEGs, inline YAML config) and asserts on produced
artifacts — checkpoints exist, metadata fields present, recommendations JSON
schema, evaluation results JSON.

Runs the ID-only configuration (vision/language None) so no pretrained
encoder weights are needed (BASELINE.json config #1).
"""
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml
from PIL import Image

SCRIPTS = Path(__file__).resolve().parents[2] / 'scripts'
sys.path.insert(0, str(SCRIPTS))


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    """Synthetic raw dataset + config YAML in a temp workspace."""
    root = tmp_path_factory.mktemp('ws')
    rng = np.random.default_rng(7)
    n_users, n_items = 15, 40

    raw = root / 'data' / 'raw'
    (raw / 'images').mkdir(parents=True)
    items = pd.DataFrame({
        'item_id': [f'i{j}' for j in range(n_items)],
        'title': [f'<b>Title {j}</b>' for j in range(n_items)],
        'tag': [f'tag{j % 4}' if j % 7 else None for j in range(n_items)],
        'description': [f'Item {j} description text' for j in range(n_items)],
        'view_number': rng.integers(0, 5000, n_items).astype(float),
        'comment_number': rng.integers(0, 100, n_items).astype(float),
    })
    items.loc[3, 'view_number'] = np.nan  # exercise NaN filling
    items.to_csv(raw / 'item_info.csv', index=False)

    rows = []
    t = 0
    for u in range(n_users):
        for it in rng.choice(n_items, size=8, replace=False):
            rows.append((f'u{u}', f'i{it}', t))
            t += 1
    inter = pd.DataFrame(rows, columns=['user_id', 'item_id', 'timestamp'])
    inter['timestamp'] = rng.permutation(len(inter))
    inter.to_csv(raw / 'interactions.csv', index=False)

    for j in range(n_items):
        color = (int(rng.integers(0, 255)), int(rng.integers(0, 255)), 100)
        Image.new('RGB', (100, 100), color).save(
            raw / 'images' / f'i{j}.jpg')

    cfg = {
        'model': {
            'vision_model': None,
            'language_model': None,
            'embedding_dim': 16,
            'fusion_hidden_dims': [32, 16],
            'fusion_type': 'concatenate',
            'use_contrastive': False,
            'use_batch_norm': True,
        },
        'training': {
            'batch_size': 32, 'epochs': 2, 'learning_rate': 0.01,
            'patience': 5, 'num_workers': 0,
        },
        'data': {
            'item_info_path': str(raw / 'item_info.csv'),
            'interactions_path': str(raw / 'interactions.csv'),
            'image_folder': str(raw / 'images'),
            'processed_item_info_path': str(root / 'data/processed/item_info.csv'),
            'processed_interactions_path': str(root / 'data/processed/interactions.csv'),
            'processed_image_destination_folder': str(root / 'data/processed/images'),
            'scaler_path': str(root / 'data/processed/numerical_scaler.pkl'),
            'split_data_path': str(root / 'data/splits/split_1'),
            'train_data_path': str(root / 'data/splits/split_1/train.csv'),
            'val_data_path': str(root / 'data/splits/split_1/val.csv'),
            'test_data_path': str(root / 'data/splits/split_1/test.csv'),
            'numerical_features_cols': ['view_number', 'comment_number'],
            'categorical_features_cols': ['tag'],
            'cache_config': {'enabled': True, 'use_disk': False,
                             'cache_directory': str(root / 'data/cache/features')},
            'splitting': {
                'strategy': 'leave_one_out',
                'min_interactions_per_user': 3,
                'min_interactions_per_item': 1,
                'random_state': 42,
            },
        },
        'recommendation': {'top_k': 5, 'filter_seen': True},
        'checkpoint_dir': str(root / 'models/checkpoints'),
        'results_dir': str(root / 'results'),
    }
    cfg_path = root / 'config.yaml'
    cfg_path.write_text(yaml.dump(cfg))
    return root, str(cfg_path)


def test_preprocess(workspace):
    root, cfg = workspace
    import preprocess_data
    preprocess_data.main(['--config', cfg])
    assert (root / 'data/processed/item_info.csv').exists()
    assert (root / 'data/processed/interactions.csv').exists()
    assert (root / 'data/processed/numerical_scaler.pkl').exists()
    processed = pd.read_csv(root / 'data/processed/item_info.csv')
    # Text cleaned: HTML stripped, lowercased.
    assert processed['title'].str.contains('<b>').sum() == 0
    assert (root / 'data/processed/images').exists()


def test_create_splits(workspace):
    root, cfg = workspace
    import create_splits
    create_splits.main(cfg)
    for name in ('train.csv', 'val.csv', 'test.csv'):
        assert (root / 'data/splits/split_1' / name).exists()
    train = pd.read_csv(root / 'data/splits/split_1/train.csv')
    test = pd.read_csv(root / 'data/splits/split_1/test.csv')
    assert len(train) > len(test)


def test_precompute_cache(workspace):
    root, cfg = workspace
    import precompute_cache
    from pixelrec_multimodal_tpu.config import Config
    config = Config.from_yaml(cfg)
    store = precompute_cache.precompute_features_cache(
        config, skip_encoders=True)
    assert 'tag_idx' in store.tables
    assert 'numerical' in store.tables
    combo_dir = (root / 'data/cache/features'
                 / 'vision_none_lang_none' / 'feature_tables.npz')
    assert combo_dir.exists()


def test_train(workspace):
    root, cfg = workspace
    import train
    results = train.main(['--config', cfg])
    assert results['epochs_completed'] == 2
    assert np.isfinite(results['final_train_loss'])
    ckpt_root = root / 'models/checkpoints/None_None'
    assert (ckpt_root / 'last_model' / 'state').exists()
    assert (ckpt_root / 'best_model' / 'state').exists()
    assert (root / 'models/checkpoints/encoders/user_encoder.pkl').exists()
    assert (root / 'models/checkpoints/encoders/item_encoder.pkl').exists()
    meta = json.loads((root / 'results/training_metadata.json').read_text())
    assert meta['training_completed'] is True
    assert meta['data_stats']['total_items'] > 0
    assert (root / 'results/training_run_config.yaml').exists()


def test_evaluate_multimodal(workspace):
    root, cfg = workspace
    import evaluate
    out = root / 'results/eval_results.json'
    results = evaluate.main([
        '--config', cfg,
        '--test_data', str(root / 'data/splits/split_1/test.csv'),
        '--train_data', str(root / 'data/splits/split_1/train.csv'),
        '--output', str(out),
        '--num_negatives', '10',
    ])
    assert out.exists()
    saved = json.loads(out.read_text())
    for key in ('avg_precision_at_k', 'avg_recall_at_k', 'avg_ndcg_at_k',
                'avg_hit_rate_at_k', 'avg_mrr', 'avg_personalization'):
        assert key in saved
    assert saved['num_users_evaluated'] > 0


def test_evaluate_full_catalog(workspace):
    """--full_catalog ranks every user's top-K over the whole catalog
    through the batched scorer (the reference's candidates=None hot mode,
    recommender.py:96-106, done meaningfully)."""
    root, cfg = workspace
    import evaluate
    out = root / 'results/eval_full_catalog.json'
    preds = root / 'results/preds_full_catalog.json'
    evaluate.main([
        '--config', cfg,
        '--test_data', str(root / 'data/splits/split_1/test.csv'),
        '--output', str(out),
        '--full_catalog',
        '--save_predictions', str(preds),
    ])
    saved = json.loads(out.read_text())
    assert saved['evaluation_method'] == 'full_catalog'
    assert saved['evaluation_metadata']['full_catalog'] is True
    assert saved['num_users_evaluated'] > 0
    assert np.isfinite(saved['avg_ndcg_at_k'])
    p = json.loads(preds.read_text())
    # every evaluated user got a full top-k list over the catalog
    assert all(len(v) == 5 for v in p.values() if v)


def test_evaluate_baselines(workspace):
    root, cfg = workspace
    import evaluate
    for rec_type in ('popularity', 'random'):
        out = root / f'results/eval_{rec_type}.json'
        evaluate.main([
            '--config', cfg,
            '--test_data', str(root / 'data/splits/split_1/test.csv'),
            '--output', str(out),
            '--recommender_type', rec_type,
            '--num_negatives', '5',
        ])
        assert out.exists()


def test_evaluate_ranking(workspace):
    root, cfg = workspace
    import evaluate
    out = root / 'results/eval_ranking.json'
    results = evaluate.main([
        '--config', cfg,
        '--test_data', str(root / 'data/splits/split_1/test.csv'),
        '--output', str(out),
        '--eval_task', 'ranking',
    ])
    saved = json.loads(out.read_text())
    assert 'avg_avg_rank' in saved
    assert 'avg_ndcg_at_k' in saved


def test_generate_recommendations(workspace):
    root, cfg = workspace
    import generate_recommendations
    out = root / 'results/recommendations.json'
    generate_recommendations.main([
        '--config', cfg,
        '--sample_users', '3',
        '--output', str(out),
    ])
    saved = json.loads(out.read_text())
    assert saved['metadata']['num_users'] == 3
    recs = saved['recommendations']
    assert len(recs) == 3
    for user, items in recs.items():
        assert len(items) <= 5
        for entry in items:
            assert {'item_id', 'score'} <= set(entry)


def test_generate_cascade_requires_attention(workspace):
    """--cascade plumbs through to the Recommender and is rejected for
    non-attention fusion with the clear error (the cascade's screen stage
    only exists for the attention head; see ops/attention_cascade.py)."""
    root, cfg = workspace
    import generate_recommendations
    with pytest.raises(ValueError, match='attention'):
        generate_recommendations.main([
            '--config', cfg,
            '--sample_users', '2',
            '--cascade', '64',
            '--output', str(root / 'results/recs_cascade.json'),
        ])


def test_extract_encoders(workspace):
    root, cfg = workspace
    import extract_encoders
    extract_encoders.main(['--config', cfg])
    assert (root / 'models/checkpoints/encoders/user_encoder.pkl').exists()
