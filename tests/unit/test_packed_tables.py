"""Packed feature-table gathers (one wide row gather instead of one per
table; training/steps.py gather_feature_kwargs + feature_store.device_tables
pack=True). TPU gathers are per-row-cost-bound, so packing is the frozen
train path's main gather lever (scripts/profile_frozen_roofline.py) — these
tests pin that the packed path is value-identical to the per-table path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
from pixelrec_multimodal_tpu.training.optimizers import build_optimizer
from pixelrec_multimodal_tpu.training.steps import (
    gather_feature_kwargs,
    init_train_state,
    make_step_fns,
)

N_USERS, N_ITEMS, N_TAGS = 10, 24, 4
VDIM, LDIM, NUMF, CDIM = 12, 8, 3, 16


def make_tables(seed=0):
    rng = np.random.default_rng(seed)
    return {
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, N_ITEMS), jnp.int32),
        'vision_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, VDIM)).astype(np.float32)),
        'language_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, LDIM)).astype(np.float32)),
        'numerical': jnp.asarray(
            rng.standard_normal((N_ITEMS, NUMF)).astype(np.float32)),
        'clip_text_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, CDIM)).astype(np.float32)),
    }


def pack(tables, names):
    key = 'packed::' + '+'.join(
        f'{n}={tables[n].shape[1]}' for n in names)
    packed = jnp.concatenate([tables[n] for n in names], axis=1)
    out = {k: v for k, v in tables.items() if k not in names}
    out[key] = packed
    return out


def make_model(contrastive=False):
    return MultimodalRecommender(
        n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUMF, embedding_dim=8,
        vision_feature_dim=VDIM, language_feature_dim=LDIM,
        clip_text_feature_dim=CDIM, use_contrastive=contrastive,
        fusion_hidden_dims=(16,), fusion_type='concatenate',
        use_batch_norm=True, dropout_rate=0.1)


def make_batch(size=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        'user_idx': jnp.asarray(rng.integers(0, N_USERS, size), jnp.int32),
        'item_idx': jnp.asarray(rng.integers(0, N_ITEMS, size), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, size), jnp.int32),
        'label': jnp.asarray(rng.integers(0, 2, size), jnp.float32),
        'weight': jnp.ones(size, jnp.float32),
    }


class TestPackedGather:
    def test_packed_matches_separate(self):
        model = make_model(contrastive=True)
        tables = make_tables()
        batch = make_batch()
        sep = gather_feature_kwargs(model, tables, batch)
        pk = gather_feature_kwargs(
            model, pack(tables, ['vision_emb', 'language_emb', 'numerical',
                                 'clip_text_emb']), batch)
        assert set(sep) == set(pk)
        for k in sep:
            np.testing.assert_array_equal(np.asarray(sep[k]),
                                          np.asarray(pk[k]))

    def test_unwanted_modality_keeps_offsets_aligned(self):
        """A packed table may carry clip_text for a non-contrastive model;
        later slices must not drift."""
        model = make_model(contrastive=False)
        tables = make_tables()
        batch = make_batch()
        pk = gather_feature_kwargs(
            model, pack(tables, ['vision_emb', 'clip_text_emb',
                                 'language_emb', 'numerical']), batch)
        sep = gather_feature_kwargs(model, tables, batch)
        assert 'clip_text_features' not in pk
        for k in sep:
            np.testing.assert_array_equal(np.asarray(sep[k]),
                                          np.asarray(pk[k]))

    def test_partial_pack_falls_back_per_table(self):
        """Tables not in the packed key still gather individually."""
        model = make_model(contrastive=True)
        tables = make_tables()
        batch = make_batch()
        pk = gather_feature_kwargs(
            model, pack(tables, ['vision_emb', 'language_emb']), batch)
        sep = gather_feature_kwargs(model, tables, batch)
        for k in sep:
            np.testing.assert_array_equal(np.asarray(sep[k]),
                                          np.asarray(pk[k]))

    def test_train_step_loss_identical(self):
        model = make_model()
        tx = build_optimizer('adamw', 1e-2)
        tables = make_tables()
        packed = pack(tables, ['vision_emb', 'language_emb', 'numerical'])
        losses = []
        for tabs in (tables, packed):
            state = init_train_state(model, tx, jax.random.PRNGKey(0))
            train_step, _ = make_step_fns(model, tabs)
            _, metrics = train_step(state, make_batch(), jax.random.PRNGKey(1))
            losses.append(float(metrics['total_loss']))
        assert losses[0] == losses[1]


class TestDeviceTablesPack:
    def _store(self):
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        rng = np.random.default_rng(1)
        store.tables = {
            'tag_idx': rng.integers(0, N_TAGS, N_ITEMS).astype(np.int32),
            'vision_emb': rng.standard_normal(
                (N_ITEMS, VDIM)).astype(np.float32),
            'language_emb': rng.standard_normal(
                (N_ITEMS, LDIM)).astype(np.float32),
            'numerical': rng.standard_normal(
                (N_ITEMS, NUMF)).astype(np.float32),
        }
        return store

    def test_pack_roundtrip(self):
        store = self._store()
        tabs = store.device_tables(pack=True)
        packed_keys = [k for k in tabs if k.startswith('packed::')]
        assert packed_keys == [
            f'packed::vision_emb={VDIM}+language_emb={LDIM}'
            f'+numerical={NUMF}']
        assert 'vision_emb' not in tabs and 'tag_idx' in tabs
        assert tabs[packed_keys[0]].shape == (N_ITEMS, VDIM + LDIM + NUMF)
        model = make_model()
        batch = make_batch()
        sep = gather_feature_kwargs(model, store.device_tables(), batch)
        pk = gather_feature_kwargs(model, tabs, batch)
        for k in sep:
            np.testing.assert_array_equal(np.asarray(sep[k]),
                                          np.asarray(pk[k]))

    def test_single_float_table_not_packed(self):
        store = self._store()
        del store.tables['language_emb'], store.tables['numerical']
        tabs = store.device_tables(pack=True)
        assert 'vision_emb' in tabs
        assert not any(k.startswith('packed::') for k in tabs)

    def test_dtype_casts_float_tables_only(self):
        store = self._store()
        tabs = store.device_tables(pack=True, dtype=jnp.bfloat16)
        pk = next(k for k in tabs if k.startswith('packed::'))
        assert tabs[pk].dtype == jnp.bfloat16
        assert tabs['tag_idx'].dtype == jnp.int32
