"""Tests for encoder precompute: feature store -> embedding tables."""
import numpy as np
import pandas as pd
import pytest
from PIL import Image
from sklearn.preprocessing import LabelEncoder

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
from pixelrec_multimodal_tpu.encoders.precompute import (
    precompute_embedding_tables,
)


@pytest.fixture(scope='module')
def store_with_images(tmp_path_factory):
    root = tmp_path_factory.mktemp('imgs')
    n_items = 5
    rng = np.random.default_rng(0)
    for j in range(n_items):
        Image.new('RGB', (64, 64),
                  tuple(int(v) for v in rng.integers(0, 255, 3))).save(
            root / f'i{j}.jpg')
    items = pd.DataFrame({
        'item_id': [f'i{j}' for j in range(n_items)],
        'tag': ['a', 'b', 'a', 'b', 'a'],
        'description': [f'desc {j}' for j in range(n_items)],
    })
    enc = LabelEncoder().fit(items['item_id'])
    tag_enc = LabelEncoder().fit(items['tag'])
    store = ItemFeatureStore.build(
        items, enc, tag_encoder=tag_enc,
        vision_model='resnet', language_model='sentence-bert',
        image_folder=str(root), max_text_length=16)
    return store


def test_language_embedding_table(store_with_images):
    """Random-init (no local HF weights) language encoder fills the table."""
    cfg = Config()
    cfg.model.vision_model = None
    cfg.model.language_model = 'sentence-bert'
    added = precompute_embedding_tables(store_with_images, cfg, batch_size=4)
    assert 'language_emb' in added
    table = store_with_images.tables['language_emb']
    assert table.shape == (5, 384)
    assert np.isfinite(table).all()
    # Different descriptions -> different embeddings.
    assert not np.allclose(table[0], table[1])


@pytest.mark.slow
def test_vision_embedding_table(store_with_images):
    """ResNet tower over decoded images (device-side normalization)."""
    cfg = Config()
    cfg.model.vision_model = 'resnet'
    cfg.model.language_model = None
    added = precompute_embedding_tables(store_with_images, cfg, batch_size=4)
    assert 'vision_emb' in added
    table = store_with_images.tables['vision_emb']
    assert table.shape == (5, 2048)
    assert np.isfinite(table).all()
    assert not np.allclose(table[0], table[1])


def test_precompute_is_deterministic(store_with_images):
    """Same store + config + batch size -> bit-identical tables (seeded
    random init, fixed traversal); a different batch size is numerically
    equivalent only to float tolerance (XLA fuses per-shape)."""
    cfg = Config()
    cfg.model.vision_model = None
    cfg.model.language_model = 'sentence-bert'
    precompute_embedding_tables(store_with_images, cfg, batch_size=4)
    first = np.array(store_with_images.tables['language_emb'])
    precompute_embedding_tables(store_with_images, cfg, batch_size=4)
    np.testing.assert_array_equal(
        first, np.array(store_with_images.tables['language_emb']))
    precompute_embedding_tables(store_with_images, cfg, batch_size=2)
    np.testing.assert_allclose(
        first, np.array(store_with_images.tables['language_emb']),
        rtol=1e-4, atol=1e-5)


def test_precompute_without_text_tables_adds_nothing(tmp_path):
    """A store with no tokenized text degrades gracefully (no language_emb,
    no crash) — reference placeholder semantics."""
    items = pd.DataFrame({'item_id': ['x0', 'x1'], 'tag': ['a', 'b']})
    enc = LabelEncoder().fit(items['item_id'])
    tag_enc = LabelEncoder().fit(items['tag'])
    store = ItemFeatureStore.build(items, enc, tag_encoder=tag_enc,
                                   vision_model=None, language_model=None)
    cfg = Config()
    cfg.model.vision_model = None
    cfg.model.language_model = 'sentence-bert'
    added = precompute_embedding_tables(store, cfg)
    assert added == []
    assert 'language_emb' not in store.tables
