"""Multimodal scripts pipeline: precompute (encoder forwards) -> train with
embedding tables -> evaluate -> generate, with vision+language enabled.

Uses tiny encoder variants (correct pooled dims, 1-block depth) monkeypatched
into the precompute module so the full wiring runs in seconds on CPU; the
full-size architectures are covered by tests/unit/test_encoders.py.
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
def mm_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp('mm_ws')
    rng = np.random.default_rng(11)
    n_users, n_items = 10, 20

    processed = root / 'data/processed'
    (processed / 'images').mkdir(parents=True)
    items = pd.DataFrame({
        'item_id': [f'i{j}' for j in range(n_items)],
        'tag': [f't{j % 3}' for j in range(n_items)],
        'description': [f'unique item text number {j} with words' for j in
                        range(n_items)],
        'view_number': rng.random(n_items) * 100,
    })
    items.to_csv(processed / 'item_info.csv', index=False)
    for j in range(n_items):
        Image.new('RGB', (64, 64),
                  tuple(int(v) for v in rng.integers(0, 255, 3))).save(
            processed / 'images' / f'i{j}.jpg')

    rows = []
    for u in range(n_users):
        for it in rng.choice(n_items, 6, replace=False):
            rows.append((f'u{u}', f'i{it}'))
    inter = pd.DataFrame(rows, columns=['user_id', 'item_id'])
    inter['timestamp'] = rng.permutation(len(inter))
    inter.to_csv(processed / 'interactions.csv', index=False)

    splits = root / 'data/splits/split_1'
    splits.mkdir(parents=True)
    perm = rng.permutation(len(inter))
    inter.iloc[perm[:40]].to_csv(splits / 'train.csv', index=False)
    inter.iloc[perm[40:50]].to_csv(splits / 'val.csv', index=False)
    inter.iloc[perm[50:]].to_csv(splits / 'test.csv', index=False)

    cfg = {
        'model': {
            'vision_model': 'resnet', 'language_model': 'sentence-bert',
            'embedding_dim': 8, 'fusion_hidden_dims': [16],
            'fusion_type': 'concatenate', 'use_contrastive': False,
            'use_batch_norm': True, 'dropout_rate': 0.1,
        },
        'training': {'batch_size': 32, 'epochs': 1, 'learning_rate': 0.01,
                     'patience': 3},
        'data': {
            'processed_item_info_path': str(processed / 'item_info.csv'),
            'processed_interactions_path': str(processed / 'interactions.csv'),
            'image_folder': str(processed / 'images'),
            'processed_image_destination_folder': str(processed / 'images'),
            'scaler_path': str(processed / 'numerical_scaler.pkl'),
            'split_data_path': str(splits),
            'train_data_path': str(splits / 'train.csv'),
            'val_data_path': str(splits / 'val.csv'),
            'test_data_path': str(splits / 'test.csv'),
            'numerical_features_cols': ['view_number'],
            'categorical_features_cols': ['tag'],
            'cache_config': {'enabled': True, 'use_disk': True,
                             'cache_directory': str(root / 'cache'),
                             'max_memory_items': 100},
            'splitting': {'random_state': 42},
            'max_text_length': 16,
        },
        'recommendation': {'top_k': 5, 'filter_seen': True},
        'checkpoint_dir': str(root / 'models/checkpoints'),
        'results_dir': str(root / 'results'),
    }
    cfg_path = root / 'config.yaml'
    cfg_path.write_text(yaml.dump(cfg))
    return root, str(cfg_path)


@pytest.fixture(scope='module')
def tiny_encoders(request):
    """Patch tiny (correct-output-dim) encoders into the precompute module."""
    import jax.numpy as jnp
    from pixelrec_multimodal_tpu.encoders import precompute as pc
    from pixelrec_multimodal_tpu.encoders.resnet import (
        ResNetConfig, ResNetTower)
    from pixelrec_multimodal_tpu.encoders.text_models import (
        TextEncoderConfig, TextTransformer)

    orig_v, orig_l = pc.build_vision_encoder, pc.build_language_encoder

    def tiny_vision(key, dtype=jnp.float32):
        assert key == 'resnet'
        return ResNetTower(ResNetConfig(embedding_size=8,
                                        hidden_sizes=(16, 32, 64, 2048),
                                        depths=(1, 1, 1, 1)), dtype=dtype)

    def tiny_language(key, dtype=jnp.float32):
        assert key == 'sentence-bert'
        return TextTransformer(TextEncoderConfig(
            vocab_size=30522, hidden_size=384, num_layers=1, num_heads=4,
            intermediate_size=64), dtype=dtype)

    pc.build_vision_encoder = tiny_vision
    pc.build_language_encoder = tiny_language

    def restore():
        pc.build_vision_encoder = orig_v
        pc.build_language_encoder = orig_l

    request.addfinalizer(restore)


def test_precompute_with_encoders(mm_workspace, tiny_encoders):
    root, cfg = mm_workspace
    import precompute_cache
    from pixelrec_multimodal_tpu.config import Config
    config = Config.from_yaml(cfg)
    store = precompute_cache.precompute_features_cache(config, batch_size=8) \
        if 'batch_size' in precompute_cache.precompute_features_cache.__code__.co_varnames \
        else precompute_cache.precompute_features_cache(config)
    assert 'vision_emb' in store.tables
    assert 'language_emb' in store.tables
    assert store.tables['vision_emb'].shape == (20, 2048)
    assert store.tables['language_emb'].shape == (20, 384)
    assert np.isfinite(store.tables['vision_emb']).all()
    # Persisted to the disk tier under the model-combo dir.
    npz = (root / 'cache' / 'vision_resnet_lang_sentence-bert'
           / 'feature_tables.npz')
    assert npz.exists()
    with np.load(npz) as z:
        assert 'vision_emb' in z.files


def test_train_with_embedding_tables(mm_workspace, tiny_encoders):
    root, cfg = mm_workspace
    import train
    results = train.main(['--config', cfg])
    assert np.isfinite(results['final_train_loss'])
    ckpt = root / 'models/checkpoints/resnet_sentence-bert'
    assert (ckpt / 'best_model' / 'state').exists()
    meta = json.loads((root / 'results/training_metadata.json').read_text())
    assert meta['model_config']['vision_model'] == 'resnet'


def test_evaluate_multimodal_model(mm_workspace, tiny_encoders):
    root, cfg = mm_workspace
    import evaluate
    out = root / 'results/eval_mm.json'
    results = evaluate.main([
        '--config', cfg,
        '--test_data', str(root / 'data/splits/split_1/test.csv'),
        '--output', str(out),
        '--num_negatives', '8',
    ])
    saved = json.loads(out.read_text())
    assert saved['num_users_evaluated'] > 0
    assert 0 <= saved['avg_ndcg_at_k'] <= 1
    # Intra-list similarity should be computable: embeddings exist.
    assert 'avg_intra_list_similarity' in saved


def test_generate_with_tables(mm_workspace, tiny_encoders):
    root, cfg = mm_workspace
    import generate_recommendations
    out = root / 'results/recs_mm.json'
    generate_recommendations.main([
        '--config', cfg, '--sample_users', '2', '--output', str(out)])
    saved = json.loads(out.read_text())
    assert len(saved['recommendations']) == 2
